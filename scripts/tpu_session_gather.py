"""One TPU session: gather microbenchmarks first, then the official bench.

Batched into a single process per the axon claim rules (CLAUDE.md).
The microbenchmarks derisk the Pallas search-kernel design.  Known
Mosaic constraints on this backend (from the earlier probe session):
no 64-bit types, no unsigned reductions, dynamic 1-D scalar VMEM loads
fail to verify ("multiple of 1024"), pallas_call inside an XLA
fori_loop body can hit a recursion bug -> every Pallas timing loop
here runs INSIDE the kernel.  The axon tunnel adds ~30ms per dispatch,
so XLA ops are timed as K dependent fori_loop iterations in one jit.

    python scripts/tpu_session_gather.py [--skip-bench] [--interpret]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

INTERPRET = "--interpret" in sys.argv

import jax

if INTERPRET:
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


def loop_time(body, init, K=32, n=3):
    """Time K dependent iterations of body inside one jit; s/iter."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, body, x)
    jax.block_until_ready(run(init))
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(run(init))
    return (time.time() - t0) / n / K


def pallas_loop_time(call, init, K=32, n=3):
    """Time a pallas_call whose kernel runs K iterations internally."""
    jax.block_until_ready(call(init))
    t0 = time.time()
    for _ in range(n):
        jax.block_until_ready(call(init))
    return (time.time() - t0) / n / K


N = 1 << 20           # table entries (4MB i32)
R = N // 128          # table rows
Q = 1 << 15           # queries per search iteration (B=8192 x 4)
K_IT = 16             # in-kernel iterations per timing call

rng = np.random.default_rng(0)
TAB = rng.integers(0, 1 << 30, N).astype(np.int32)
IDX = rng.integers(0, N, Q).astype(np.int32)


@section("A. XLA in-loop flat gather baseline")
def sA():
    tab = jnp.asarray(TAB)
    for q in (Q, 2 * Q):
        idx = jnp.asarray(rng.integers(0, N, q).astype(np.int32))

        def body(i, ix):
            v = tab[ix]
            return (ix + v) & (N - 1)

        t = loop_time(body, idx, K=K_IT)
        print(f"A flat i32 gather Q={q}: {t*1e6:.0f}us = {t/q*1e9:.1f} ns/elem",
              flush=True)


@section("B. XLA in-loop take_along_axis (lane + sublane)")
def sB():
    tab2 = jnp.asarray(TAB.reshape(R, 128))
    # lane gather: out[r,l] = t[r, i[r,l]]  (within-row)
    lidx = jnp.asarray(rng.integers(0, 128, (R // 4, 128)).astype(np.int32))
    trows = tab2[: R // 4]

    def body_lane(i, ix):
        v = jnp.take_along_axis(trows, ix, axis=1)
        return (ix + v) & 127

    t = loop_time(body_lane, lidx, K=K_IT)
    print(f"B lane TAA [{R//4},128]: {t*1e6:.0f}us = "
          f"{t/(R//4*128)*1e9:.2f} ns/elem", flush=True)

    # sublane gather: out[q,l] = t[i[q,l], l]
    sidx = jnp.asarray(rng.integers(0, R, (2048, 128)).astype(np.int32))

    def body_sub(i, ix):
        v = jnp.take_along_axis(tab2, ix, axis=0)
        return (ix + v) & (R - 1)

    t = loop_time(body_sub, sidx, K=K_IT)
    print(f"B sublane TAA [2048,128]: {t*1e6:.0f}us = "
          f"{t/(2048*128)*1e9:.2f} ns/elem", flush=True)


def _pallas(kern, out_sd, n_in, scratch=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        kern,
        out_shape=out_sd,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
        interpret=INTERPRET,
    )


@section("C. Pallas in-kernel lane gather (take_along_axis axis=1)")
def sC():
    rows = TAB.reshape(R, 128)[:2048]
    lidx = rng.integers(0, 128, (2048, 128)).astype(np.int32)

    def kern(t_ref, i_ref, o_ref):
        def body(s, ix):
            v = jnp.take_along_axis(t_ref[:], ix, axis=1)
            return (ix + v) & 127
        o_ref[:] = jax.lax.fori_loop(0, K_IT, body, i_ref[:])

    call = jax.jit(
        lambda ix: _pallas(kern, jax.ShapeDtypeStruct((2048, 128), jnp.int32), 2)(
            jnp.asarray(rows), ix
        )
    )
    t = pallas_loop_time(call, jnp.asarray(lidx), K=K_IT)
    # correctness (1 iteration semantics checked on host)
    one = np.take_along_axis(rows, lidx, axis=1)
    print(f"C pallas lane gather [2048,128]: {t*1e6:.0f}us = "
          f"{t/(2048*128)*1e9:.2f} ns/elem "
          f"(ref first-iter sample {one[0,0]})", flush=True)


@section("D. Pallas in-kernel sublane gather (take_along_axis axis=0)")
def sD():
    tab2 = TAB.reshape(R, 128)
    sidx = rng.integers(0, R, (2048, 128)).astype(np.int32)

    def kern(t_ref, i_ref, o_ref):
        def body(s, ix):
            v = jnp.take_along_axis(t_ref[:], ix, axis=0)
            return (ix + v) & (R - 1)
        o_ref[:] = jax.lax.fori_loop(0, K_IT, body, i_ref[:])

    call = jax.jit(
        lambda ix: _pallas(kern, jax.ShapeDtypeStruct((2048, 128), jnp.int32), 2)(
            jnp.asarray(tab2), ix
        )
    )
    t = pallas_loop_time(call, jnp.asarray(sidx), K=K_IT)
    print(f"D pallas sublane gather [2048,128] from [{R},128]: "
          f"{t*1e6:.0f}us = {t/(2048*128)*1e9:.2f} ns/elem", flush=True)


@section("E. Pallas full flat-table lookup (row bcast + lane gather)")
def sE():
    # lookup val[j] = tab[idx[j]] for Q flat indices, via per-query row
    # broadcast fetch + lane extract, chunked to bound VMEM
    tab2 = TAB.reshape(R, 128)
    CH = 512           # queries per chunk ([CH,128] working set = 256KB)
    qidx = IDX.reshape(Q // 128, 128)

    def kern(t_ref, i_ref, o_ref):
        def one_round(ix):
            # ix [Qr,128] flat indices; returns same-shape gathered vals
            out = jnp.zeros_like(ix)
            for c in range(Q // 128 // (CH // 128)):
                blk = ix[c * (CH // 128):(c + 1) * (CH // 128)]  # [CH/128,128]
                flat_row = (blk >> 7).reshape(CH, 1)             # [CH,1]
                rows = jnp.take_along_axis(
                    t_ref[:], jnp.broadcast_to(flat_row, (CH, 128)), axis=0
                )                                                 # [CH,128]
                lane = (blk & 127).reshape(CH, 1)
                v = jnp.take_along_axis(rows, lane, axis=1)       # [CH,1]
                out = out.at[c * (CH // 128):(c + 1) * (CH // 128)].set(
                    v.reshape(CH // 128, 128)
                )
            return out

        def body(s, ix):
            v = one_round(ix)
            return (ix + v) & (N - 1)

        o_ref[:] = jax.lax.fori_loop(0, 4, body, i_ref[:])

    call = jax.jit(
        lambda ix: _pallas(
            kern, jax.ShapeDtypeStruct((Q // 128, 128), jnp.int32), 2
        )(jnp.asarray(tab2), ix)
    )
    t = pallas_loop_time(call, jnp.asarray(qidx), K=4)
    print(f"E pallas flat lookup Q={Q}: {t*1e6:.0f}us = "
          f"{t/Q*1e9:.1f} ns/elem", flush=True)


@section("F. Pallas in-kernel dense one-hot passes vs XLA in-loop")
def sF():
    B, S = 2048, 128

    def passes(x, pos, n=30):
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        for i in range(n):
            oh = cols == (pos[:, None] + i) % S
            v = jnp.sum(jnp.where(oh, x, 0), axis=1, dtype=jnp.int32)
            x = jnp.where(oh, v[:, None] + 1, x)
        return x

    x0 = jnp.zeros((B, S), jnp.int32)
    pos = jnp.arange(B, dtype=jnp.int32) % S

    def kern(p_ref, x_ref, o_ref):
        def body(s, x):
            return passes(x, p_ref[:, 0])
        o_ref[:] = jax.lax.fori_loop(0, K_IT, body, x_ref[:])

    call = jax.jit(
        lambda x: _pallas(kern, jax.ShapeDtypeStruct((B, S), jnp.int32), 2)(
            jnp.broadcast_to(pos[:, None], (B, 1)), x
        )
    )
    t = pallas_loop_time(call, x0, K=K_IT)
    print(f"F pallas 30 one-hot passes: {t*1e6:.0f}us/iter "
          f"({t/30*1e6:.1f} us/pass)", flush=True)

    def bodyx(i, x):
        return passes(x, pos)
    t = loop_time(bodyx, x0, K=K_IT)
    print(f"F XLA    30 one-hot passes: {t*1e6:.0f}us/iter "
          f"({t/30*1e6:.1f} us/pass)", flush=True)


@section("G. Pallas cuckoo-style 2-plane lookup (lo/hi i32, 2 probes)")
def sG():
    # the real occ lookup: entry u64 split into lo/hi i32 planes, two
    # probe slots per query, compare + select -- all in one kernel
    lo = TAB.reshape(R, 128)
    hi = rng.integers(0, 1 << 30, (R, 128)).astype(np.int32)
    qidx = IDX.reshape(Q // 128, 128)
    CH = 512

    def fetch(t_ref, blk):
        flat_row = (blk >> 7).reshape(CH, 1)
        rows = jnp.take_along_axis(
            t_ref[:], jnp.broadcast_to(flat_row, (CH, 128)), axis=0
        )
        lane = (blk & 127).reshape(CH, 1)
        return jnp.take_along_axis(rows, lane, axis=1).reshape(CH // 128, 128)

    def kern(lo_ref, hi_ref, i_ref, o_ref):
        def one(ix):
            out = jnp.zeros_like(ix)
            nch = Q // CH
            for c in range(nch):
                blk = ix[c * (CH // 128):(c + 1) * (CH // 128)]
                s2 = (blk * jnp.int32(-1640531527)) & (N - 1)
                l1 = fetch(lo_ref, blk)
                h1 = fetch(hi_ref, blk)
                l2 = fetch(lo_ref, s2)
                h2 = fetch(hi_ref, s2)
                m1 = (h1 ^ blk) < (1 << 16)
                v = jnp.where(m1, l1, jnp.where((h2 ^ blk) < (1 << 16), l2, -1))
                out = out.at[c * (CH // 128):(c + 1) * (CH // 128)].set(v)
            return out

        def body(s, ix):
            v = one(ix)
            return (ix + v) & (N - 1)

        o_ref[:] = jax.lax.fori_loop(0, 4, body, i_ref[:])

    call = jax.jit(
        lambda ix: _pallas(
            kern, jax.ShapeDtypeStruct((Q // 128, 128), jnp.int32), 3
        )(jnp.asarray(lo), jnp.asarray(hi), ix)
    )
    t = pallas_loop_time(call, jnp.asarray(qidx), K=4)
    print(f"G pallas 2-probe 2-plane lookup Q={Q}: {t*1e6:.0f}us "
          f"(vs XLA 2x u64 gather ~2x section A)", flush=True)


def main():
    for s in ():
        pass
    if "--skip-bench" not in sys.argv:
        print("\n==== official bench ====", flush=True)
        import bench

        bench.main()
    return 0


if __name__ == "__main__":
    main()
