"""TPU probe 4: search-iteration cost attribution, then the bench.

Questions this session answers (one process, one claim):
  A. XLA serialized-gather cost model: fixed vs per-element (Q sweep)
  B. do two independent gathers overlap?  is one fused 2Q gather
     cheaper than two Q gathers?
  C. does XLA overlap a gather with an independent dense-pass chain?
  D. Pallas per-element DMA gather from HBM (pipelined): ns/elem
  E. real dense-pass cost (no modulo artifacts) at search shapes
  F. the REAL search: s/iteration of ec1dir_batch at B=2048/8192
Then runs the official bench (honest end-to-end with the warmed ladder).

    python scripts/tpu_probe4.py [--skip-bench] [--skip-probe]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

SMOKE = "--smoke" in sys.argv  # CPU syntax/shape check: tiny sizes

import jax

if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def section(name):
    def deco(fn):
        print(f"\n=== {name} ===", flush=True)
        t0 = time.time()
        try:
            fn()
        except Exception:
            traceback.print_exc(limit=4)
        print(f"[section {time.time()-t0:.1f}s]", flush=True)
        return fn
    return deco


def loop_time(body, init, K=16, n=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, body, x)
    jax.block_until_ready(run(init))
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(run(init))
    return (time.time() - t0) / n / K


N = 1 << 20
rng = np.random.default_rng(0)
TAB = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
TAB64 = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.uint64))


def run_probe():
    @section("A. gather cost model: Q sweep (i32 and u64)")
    def sA():
        for Q in (4096, 8192, 16384, 32768, 65536, 131072):
            idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

            def body(i, ix):
                v = TAB[ix]
                return (ix + v) & (N - 1)

            t = loop_time(body, idx)
            print(f"A i32 Q={Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem",
                  flush=True)
        for Q in (8192, 32768):
            idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

            def body64(i, ix):
                v = TAB64[ix]
                return (ix + v.astype(jnp.int32)) & (N - 1)

            t = loop_time(body64, idx)
            print(f"A u64 Q={Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem",
                  flush=True)

    @section("B. two independent gathers vs one fused double gather")
    def sB():
        Q = 32768
        idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

        def two(i, ix):
            v1 = TAB64[ix]
            v2 = TAB64[(ix * jnp.int32(-1640531527)) & (N - 1)]
            return (ix + v1.astype(jnp.int32) + v2.astype(jnp.int32)) & (N - 1)

        t = loop_time(two, idx)
        print(f"B two u64 gathers Q={Q}: {t*1e6:.0f}us", flush=True)

        def fused(i, ix):
            both = jnp.concatenate(
                [ix, (ix * jnp.int32(-1640531527)) & (N - 1)]
            )
            v = TAB64[both]
            return (ix + v[:Q].astype(jnp.int32) + v[Q:].astype(jnp.int32)) & (N - 1)

        t = loop_time(fused, idx)
        print(f"B fused 2Q u64 gather Q={Q}: {t*1e6:.0f}us", flush=True)

    @section("C. gather || dense-chain overlap")
    def sC():
        Q = 32768
        B, S = 8192, 128
        idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))
        x0 = jnp.zeros((B, S), jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

        def dense_chain(x, n=30):
            for i in range(n):
                oh = cols == (x[:, :1] & 127)
                v = jnp.sum(jnp.where(oh, x, 0), axis=1, dtype=jnp.int32)
                x = jnp.where(oh, v[:, None] + 1, x + 1)
            return x

        def g_only(i, c):
            ix, x = c
            v = TAB[ix]
            return ((ix + v) & (N - 1), x)

        def d_only(i, c):
            ix, x = c
            return (ix, dense_chain(x))

        def both(i, c):
            ix, x = c
            v = TAB[ix]
            return ((ix + v) & (N - 1), dense_chain(x))

        tg = loop_time(g_only, (idx, x0))
        td = loop_time(d_only, (idx, x0))
        tb = loop_time(both, (idx, x0))
        print(f"C gather={tg*1e6:.0f}us dense={td*1e6:.0f}us "
              f"both={tb*1e6:.0f}us overlap={(tg+td-tb)/min(tg,td)*100:.0f}%",
              flush=True)

    @section("D. Pallas DMA-pipelined per-element gather")
    def sD():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if SMOKE:
            print("D skipped in smoke mode (Mosaic only)", flush=True)
            return
        Q = 8192
        NSLOT = 16
        idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

        def kern(i_ref, t_hbm, o_ref):
            def run(scratch, sems):
                def dma(slot, qi):
                    return pltpu.make_async_copy(
                        t_hbm.at[pl.ds(i_ref[qi], 1)],
                        scratch.at[pl.ds(slot, 1)],
                        sems.at[slot],
                    )
                for s in range(NSLOT):
                    dma(s, s).start()

                def body(q, _):
                    slot = jax.lax.rem(q, NSLOT)
                    dma(slot, q).wait()
                    o_ref[q] = scratch[slot]

                    @pl.when(q + NSLOT < Q)
                    def _():
                        dma(slot, q + NSLOT).start()
                    return 0
                jax.lax.fori_loop(0, Q, body, 0)

            pl.run_scoped(
                run,
                scratch=pltpu.VMEM((NSLOT,), jnp.int32),
                sems=pltpu.SemaphoreType.DMA((NSLOT,)),
            )

        f = jax.jit(lambda i, t: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(i, t))
        r = f(idx, TAB).block_until_ready()
        ok = np.array_equal(np.asarray(r), np.asarray(TAB)[np.asarray(idx)])
        t0 = time.time()
        for _ in range(5):
            f(idx, TAB).block_until_ready()
        t = (time.time() - t0) / 5
        print(f"D DMA gather Q={Q} (ok={ok}): {t*1e6:.0f}us = "
              f"{t/Q*1e9:.1f} ns/elem [incl ~30ms dispatch]", flush=True)

        def body(i, ix):
            v = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(ix, TAB)
            return (ix + v) & (N - 1)

        t = loop_time(body, idx, K=8)
        print(f"D DMA gather in-loop: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem",
              flush=True)

    @section("E. real dense-pass costs (no modulo)")
    def sE():
        for (B, S) in ((2048, 128), (8192, 128), (8192, 1024)):
            x0 = jnp.zeros((B, S), jnp.int32)
            pos0 = jnp.arange(B, dtype=jnp.int32) % S
            cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

            def body(i, c):
                x, pos = c
                oh = cols == pos[:, None]
                v = jnp.sum(jnp.where(oh, x, 0), axis=1, dtype=jnp.int32)
                x = jnp.where(oh, v[:, None] + 1, x)
                return (x, (pos + 1) & (S - 1))

            t = loop_time(body, (x0, pos0), K=64)
            print(f"E one-hot extract+set [{B},{S}]: {t*1e6:.1f}us/pass",
                  flush=True)

    @section("F. real search: s/iteration of ec1dir_batch")
    def sF():
        import os

        from bfc_tpu.models import corrector as DC
        from bfc_tpu.models import counter as C
        from bfc_tpu.opts import Opts
        from bfc_tpu.ops import search as srch

        glen, cov, rlen, k = 250_000, 60, 100, 25
        if SMOKE:
            glen, cov = 20_000, 20
        rngl = np.random.default_rng(1234)
        n_reads = glen * cov // rlen
        gcodes = rngl.integers(0, 4, glen).astype(np.uint8)
        starts = rngl.integers(0, glen - rlen, n_reads)
        mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
        rc = rngl.random(n_reads) < 0.5
        mat[rc] = 3 - mat[rc, ::-1]
        err = rngl.random((n_reads, rlen)) < 0.01
        mat = np.where(err, (mat + rngl.integers(1, 4, mat.shape)) % 4,
                       mat).astype(np.uint8)
        qmat = np.where(err, 33 + 2 + rngl.integers(0, 13, mat.shape),
                        33 + 30 + rngl.integers(0, 10, mat.shape)).astype(np.uint8)
        basechars = np.frombuffer(b"ACGT", np.uint8)
        reads = [(basechars[mat[i]].tobytes().decode(),
                  qmat[i].tobytes().decode()) for i in range(n_reads)]
        opt = Opts()
        opt.k = k
        opt.bf_shift = max(20, glen.bit_length() + 7)
        ds = C.count_stream(iter(reads), opt, batch_reads=8192)
        corr = DC.Corrector(opt, ds)
        cfg = corr.cfg

        from bfc_tpu.ops import annotate as ann

        for B in ((256,) if SMOKE else (2048, 8192)):
            bases = jnp.asarray(mat[:B])
            qv = qmat[:B].astype(np.int32) - 33
            qflag = jnp.asarray(qv >= opt.q)
            lens = jnp.full((B,), rlen, jnp.int32)
            solid_end, high_end, lcov, hcov, occv, kovf = ann.kcov_batch(
                ds.table, bases, lens, k, cfg.l_pre, cfg.s_bits, cfg.kb_bits,
                cfg.min_cov, cfg.axis_name, cfg.n_dev,
            )
            isl_start, isl_end, isl_found = ann.best_island_batch(
                solid_end, lens, k
            )
            # production-style fast-forward window bits (correct_core)
            idxL = jnp.arange(rlen, dtype=jnp.int32)
            w_cnthi = (occv & 0xFF) >= cfg.min_cov + 1
            w_abs = (occv < 0) | ((occv & 0xFF) < cfg.min_cov)
            w_absh = (occv < 0) | (((occv >> 8) & 0xFF) < cfg.min_cov)
            ff_ok = jnp.ones((B, rlen), bool)
            win_f = (w_cnthi, w_abs, w_absh, ff_ok)
            start = isl_start
            active = isl_found

            def run_dir():
                return srch.ec1dir_batch(
                    ds.table, cfg, bases, qflag, qflag, lcov, hcov, lens,
                    start, active, win_bits=win_f, debug=True,
                )

            r = run_dir()
            jax.block_until_ready(r[0])
            st = r[-1]
            iters = int(st.it)
            t0 = time.time()
            for _ in range(3):
                jax.block_until_ready(run_dir()[0])
            t = (time.time() - t0) / 3
            print(f"F B={B}: {t*1e3:.1f}ms total, {iters} iterations = "
                  f"{t/max(iters,1)*1e6:.0f} us/iter", flush=True)


def main():
    if "--skip-probe" not in sys.argv:
        run_probe()
    if "--skip-bench" not in sys.argv:
        print("\n==== official bench ====", flush=True)
        import bench

        bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
