"""Driver entry points: single-chip compile check + multi-chip dry run."""

import jax
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as G

    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    final_b, ec_code, n_ec = out
    assert final_b.shape[0] == args[-4].shape[0]
    assert int((ec_code == 0).sum()) > 0


@pytest.mark.slow
def test_dryrun_multichip():
    """Run in a clean subprocess, as the driver does: in-process after a
    long suite, XLA-CPU state from earlier compiled collectives can
    segfault the shard_map program (observed after ~44 tests)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "import __graft_entry__ as G; G.dryrun_multichip(8); print('DRYRUN_OK')"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "DRYRUN_OK" in r.stdout
