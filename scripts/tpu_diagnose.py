"""Diagnose the correction-bench slowdown: device vs host attribution.

Runs (one TPU claim):
  1. probe4's section F equivalent: ec1dir_batch alone, s/iteration
  2. correct_core alone on one batch (full device pipeline step)
  3. the official bench at 8192 with BFC_TPU_TIMING per-phase logs
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ["BFC_TPU_TIMING"] = "1"
os.environ["BFC_TPU_SEARCH_STATS"] = "1"

import numpy as np
import jax
import jax.numpy as jnp


def main() -> int:
    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts
    from bfc_tpu.ops import annotate as ann
    from bfc_tpu.ops import search as srch

    glen, cov, rlen, k = 250_000, 60, 100, 25
    rng = np.random.default_rng(1234)
    n_reads = glen * cov // rlen
    g = rng.integers(0, 4, glen).astype(np.uint8)
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = g[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4,
                   mat).astype(np.uint8)
    qmat = np.where(err, 33 + 2 + rng.integers(0, 13, mat.shape),
                    33 + 30 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    reads = [(bc[mat[i]].tobytes().decode(), qmat[i].tobytes().decode())
             for i in range(n_reads)]
    opt = Opts()
    opt.k = k
    opt.bf_shift = max(20, glen.bit_length() + 7)
    t0 = time.time()
    ds = C.count_stream(iter(reads[:8192]), opt, batch_reads=8192)
    C.await_merge_ladder()
    print(f"[diag] warmup counting {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ds = C.count_stream(iter(reads), opt, batch_reads=8192)
    print(f"[diag] counting {time.time()-t0:.1f}s", flush=True)

    corr = DC.Corrector(opt, ds)
    cfg = corr.cfg

    # ---- 1. search alone
    B = 8192
    bases = jnp.asarray(mat[:B])
    qv = qmat[:B].astype(np.int32) - 33
    qflag = jnp.asarray(qv >= opt.q)
    lens = jnp.full((B,), rlen, jnp.int32)
    solid_end, high_end, lcov, hcov, occv, kovf = ann.kcov_batch(
        ds.table, bases, lens, k, cfg.l_pre, cfg.s_bits, cfg.kb_bits,
        cfg.min_cov, cfg.axis_name, cfg.n_dev,
    )
    isl_start, isl_end, isl_found = ann.best_island_batch(solid_end, lens, k)
    w_cnthi = (occv & 0xFF) >= cfg.min_cov + 1
    w_abs = (occv < 0) | ((occv & 0xFF) < cfg.min_cov)
    w_absh = (occv < 0) | (((occv >> 8) & 0xFF) < cfg.min_cov)
    win_f = (w_cnthi, w_abs, w_absh, jnp.ones((B, rlen), bool))

    def run_dir():
        return srch.ec1dir_batch(
            ds.table, cfg, bases, qflag, qflag, lcov, hcov, lens,
            isl_start, isl_found, win_bits=win_f, debug=True,
        )

    r = run_dir()
    jax.block_until_ready(r[0])
    iters = int(r[-1].it)
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(run_dir()[0])
    t = (time.time() - t0) / 3
    print(f"[diag] search-only B={B}: {t*1e3:.1f}ms, {iters} iters = "
          f"{t/max(iters,1)*1e6:.0f} us/iter", flush=True)

    # ---- 2. correct_core alone (one full device step)
    mode = jnp.int32(ds.mode)
    out = DC.correct_core(ds.table, cfg, bases, qflag, lens, mode)
    jax.block_until_ready(out["final_b"])
    t0 = time.time()
    for _ in range(3):
        out = DC.correct_core(ds.table, cfg, bases, qflag, lens, mode)
        jax.block_until_ready(out["final_b"])
    print(f"[diag] correct_core B={B} full-cap: {(time.time()-t0)/3*1e3:.0f}ms",
          flush=True)
    sc = jnp.int32(64)
    out = DC.correct_core(ds.table, corr.cfg_main, bases, qflag, lens, mode,
                          soft_cap=sc)
    jax.block_until_ready(out["final_b"])
    t0 = time.time()
    for _ in range(3):
        out = DC.correct_core(ds.table, corr.cfg_main, bases, qflag, lens,
                              mode, soft_cap=sc)
        jax.block_until_ready(out["final_b"])
    print(f"[diag] correct_core B={B} soft(64): {(time.time()-t0)/3*1e3:.0f}ms",
          flush=True)

    # ---- 3. bench with per-phase logs
    os.environ["BENCH_BATCH"] = "8192"
    import bench

    bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
