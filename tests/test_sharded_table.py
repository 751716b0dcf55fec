"""Sharded-table correction: lookups routed over the mesh, byte parity.

The human-scale layout (htab.c:28-33): the finalized cuckoo spectrum is
slot-range-sharded across 8 CPU devices and every correction lookup
routes requests with a paired all_to_all (spectrum.sharded_cuckoo_lookup).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from bfc_tpu.ops import spectrum as spec

from . import datagen, oracle


def test_sharded_lookup_matches_local():
    """sharded_cuckoo_lookup == cuckoo_lookup on random keys + queries."""
    from bfc_tpu.parallel import mesh as pmesh
    from bfc_tpu.ops import spectrum_host as sph

    rng = np.random.default_rng(42)
    n = 5000
    c_bits, l_pre, kb_bits = 14, 8, 20
    shard = rng.integers(0, 1 << l_pre, n).astype(np.uint32)
    keybody = rng.integers(0, 1 << kb_bits, n).astype(np.uint64)
    uniq = np.unique((shard.astype(np.uint64) << np.uint64(kb_bits)) | keybody)
    shard = (uniq >> np.uint64(kb_bits)).astype(np.uint32)
    keybody = uniq & np.uint64((1 << kb_bits) - 1)
    n = len(shard)
    payload = rng.integers(1, 1 << 14, n).astype(np.uint32)
    entries, ok = sph.build_cuckoo_table_host(
        shard, keybody, payload, c_bits, l_pre, kb_bits
    )
    assert ok
    table = spec.CuckooTable(entries=jnp.asarray(entries))
    # queries: hits + misses
    m = 4096
    qs = rng.integers(0, 1 << l_pre, m).astype(np.uint32)
    qk = rng.integers(0, 1 << kb_bits, m).astype(np.uint64)
    sel = rng.integers(0, n, m // 2)
    qs[: m // 2] = shard[sel]
    qk[: m // 2] = keybody[sel]
    want = np.asarray(
        spec.cuckoo_lookup(table, jnp.asarray(qs), jnp.asarray(qk),
                           c_bits, l_pre, kb_bits)
    )

    mesh = pmesh.make_mesh(8)
    ent_sh = jax.device_put(table.entries, NamedSharding(mesh, P("d")))

    def step(entries_local, s, k):
        occ, ovf = spec.sharded_cuckoo_lookup(
            spec.ShardedCuckoo(entries=entries_local), s, k,
            c_bits, l_pre, kb_bits, "d", 8,
        )
        return occ, ovf[None]

    got, ovf = jax.jit(shard_map(
        step, mesh=mesh, in_specs=(P("d"), P("d"), P("d")),
        out_specs=(P("d"), P("d")),
    ))(ent_sh, jnp.asarray(qs), jnp.asarray(qk))
    assert not bool(jnp.any(ovf))
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.slow
def test_sharded_pipeline_matches_reference(tmp_path):
    """Full pipeline with the table SHARDED (not replicated): byte parity."""
    from bfc_tpu.models import device_pipeline as DP
    from bfc_tpu.opts import Opts

    assert len(jax.devices()) >= 8
    fq = datagen.standard_dataset(
        str(tmp_path), genome_len=8000, n_reads=2400, name="s.fq"
    )
    ref_out, _ = oracle.run_bfc(["-k17", "-b22", "-t1", fq])
    opt = Opts()
    opt.k = 17
    opt.bf_shift = 22
    mine = DP.run_device(opt, fq, mesh_devices=8, batch_reads=1024,
                         shard_table=True)
    assert mine.encode() == ref_out
