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
    import __graft_entry__ as G

    assert len(jax.devices()) >= 8
    G.dryrun_multichip(8)
