"""2-process multi-host job (jax.distributed, CPU simulation) vs the reference.

Spawns two coordinated worker processes, each with 4 virtual CPU
devices, forming one 8-device global mesh; sharded counting and dp
correction span both processes and rank 0 writes the output.  The
contract is the usual one: byte-identical to `bfc -t1`."""

import pytest

from bfc_tpu.parallel import multihost

from . import datagen, oracle


@pytest.mark.slow
def test_multihost_matches_reference(tmp_path):
    fq = datagen.standard_dataset(
        str(tmp_path), genome_len=6000, n_reads=1600, name="mh.fq"
    )
    ref_out, _ = oracle.run_bfc(["-k17", "-b22", "-t1", fq])
    out_path = tmp_path / "mh_out.fq"
    with open(out_path, "wb") as fo:
        rc = multihost.launch(
            2, ["--cpu", "--batch", "512", "-k17", "-b22", fq],
            devices_per_host=4, stdout=fo,
        )
    assert rc == 0
    assert out_path.read_bytes() == ref_out


@pytest.mark.slow
def test_multihost_sharded_table(tmp_path):
    """Same job with the spectrum sharded (not replicated) across the
    two processes' devices: correction lookups route over the mesh."""
    import os

    fq = datagen.standard_dataset(
        str(tmp_path), genome_len=6000, n_reads=1600, name="mhs.fq"
    )
    ref_out, _ = oracle.run_bfc(["-k17", "-b22", "-t1", fq])
    out_path = tmp_path / "mhs_out.fq"
    os.environ["BFC_TPU_SHARD_TABLE"] = "1"
    try:
        with open(out_path, "wb") as fo:
            rc = multihost.launch(
                2, ["--cpu", "--batch", "512", "-k17", "-b22", fq],
                devices_per_host=4, stdout=fo,
            )
    finally:
        del os.environ["BFC_TPU_SHARD_TABLE"]
    assert rc == 0
    assert out_path.read_bytes() == ref_out
