"""TPU probe v2: in-jit loop timing (the axon tunnel adds ~30ms per
dispatch, so every op is timed as K dependent iterations inside ONE jit
and divided by K)."""
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)


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


def loop_time(make_body, init, K=64, n=3):
    """Time K dependent iterations of body inside one jit; return s/iter."""
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, K, make_body, x)
    r = jax.block_until_ready(run(init))  # compile + warm
    t0 = time.time()
    for _ in range(n):
        r = jax.block_until_ready(run(init))
    return (time.time() - t0) / n / K


@section("A. XLA gathers, in-loop")
def sA():
    rng = np.random.default_rng(2)
    N = 1 << 20
    tab32 = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.int32))
    tab64 = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.uint64))
    tab2d = jnp.asarray(rng.integers(0, 1 << 31, (N // 128, 128)).astype(np.int32))

    for Q in [2048, 8192, 32768]:
        idx0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

        def body32(i, idx):
            v = tab32[idx]
            return (idx + v) & (N - 1)
        t = loop_time(body32, idx0, K=32)
        print(f"flat u32 gather Q={Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem", flush=True)

    Q = 8192
    idx0 = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

    def body64(i, idx):
        v = tab64[idx]
        return (idx + v.astype(jnp.int32)) & (N - 1)
    t = loop_time(body64, idx0, K=32)
    print(f"flat u64 gather Q={Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem", flush=True)

    R = N // 128
    idxr0 = jnp.asarray(rng.integers(0, R, Q).astype(np.int32))

    def bodyrow(i, idx):
        rows = tab2d[idx]                       # [Q,128] row gather
        v = rows[:, 0]
        return (idx + v) & (R - 1)
    t = loop_time(bodyrow, idxr0, K=8)
    print(f"2D row gather Q={Q}x128: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/row", flush=True)


@section("B. device sort / aggregate ops, in-loop")
def sB():
    from bfc_tpu.ops import spectrum as spec

    rng = np.random.default_rng(3)
    M = 1 << 20
    ka = jnp.asarray(rng.integers(0, 1 << 32, M, dtype=np.uint64).astype(np.uint32))

    def body_sort(i, x):
        o = spec.stable_order(x)
        return x ^ o.astype(jnp.uint32)[::-1]
    t = loop_time(body_sort, ka, K=4, n=2)
    print(f"stable_order u32 {M}: {t*1e3:.1f}ms", flush=True)

    # merge_aggregates at bench-ish scale
    def mk_agg(n, cap):
        sh = np.sort(rng.integers(0, 1 << 20, n)).astype(np.uint32)
        a = spec.Aggregate(
            shard=jnp.asarray(np.pad(sh, (0, cap - n), constant_values=0xFFFFFFFF)),
            keybody=jnp.asarray(np.pad(
                rng.integers(0, 1 << 30, n, dtype=np.uint64), (0, cap - n),
                constant_values=(1 << 64) - 1)),
            ret=jnp.asarray(np.pad(
                rng.integers(0, 1 << 46, n, dtype=np.uint64), (0, cap - n))),
            n=jnp.asarray(np.pad(
                rng.integers(1, 5, n).astype(np.uint32), (0, cap - n))),
            n_high=jnp.asarray(np.zeros(cap, np.uint32)),
            first_arr=jnp.asarray(np.pad(
                rng.permutation(n).astype(np.uint64), (0, cap - n),
                constant_values=(1 << 64) - 1)),
            first_high=jnp.asarray(np.zeros(cap, np.uint32)),
        )
        return a

    for (na, nb, cap) in [(350_000, 350_000, 1 << 20),
                          (2_600_000, 350_000, 1 << 22)]:
        a = mk_agg(na, cap)
        b = mk_agg(nb, cap)
        f = jax.jit(lambda a, b: spec.merge_aggregates(a, b, cap)[0])
        r = jax.block_until_ready(f(a, b))
        t0 = time.time()
        for _ in range(3):
            r = jax.block_until_ready(f(a, b))
        print(f"merge_aggregates {na}+{nb} cap={cap}: {(time.time()-t0)/3*1e3:.0f}ms",
              flush=True)


@section("C. chunk_aggregate + finalize device timings")
def sC():
    from bfc_tpu.opts import Opts
    from bfc_tpu.ops import spectrum as spec

    opt = Opts()
    opt.k = 25
    opt.bf_shift = 25
    l_pre = opt.effective_l_pre()
    B, L = 8192, 128
    rng = np.random.default_rng(1)
    glen = 250_000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    starts = rng.integers(0, glen - 101, B)
    bases = np.full((B, L), 4, np.uint8)
    for i, st in enumerate(starts):
        bases[i, :101] = genome[st:st + 101]
    jb = jnp.asarray(bases)
    jq = jnp.asarray(np.ones((B, L), bool))
    jl = jnp.asarray(np.full((B,), 101, np.int32))

    f = jax.jit(lambda b, q, l: spec.chunk_aggregate(
        b, q, l, jnp.uint64(0), opt.k, l_pre, B * L))
    t0 = time.time()
    chunk, g = f(jb, jq, jl)
    jax.block_until_ready(chunk)
    print(f"chunk_aggregate compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        chunk, g = f(jb, jq, jl)
        jax.block_until_ready(chunk)
    print(f"chunk_aggregate steady: {(time.time()-t0)/5*1e3:.0f}ms", flush=True)
    t0 = time.time()
    gi = int(g)
    print(f"int(g) sync: {(time.time()-t0)*1e3:.0f}ms  gi={gi}", flush=True)

    # device finalize
    t0 = time.time()
    out = spec.finalize_counts(chunk, opt.bf_shift, opt.n_hashes)
    jax.block_until_ready(out[:4])
    print(f"finalize_counts compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = spec.finalize_counts(chunk, opt.bf_shift, opt.n_hashes)
    jax.block_until_ready(out[:4])
    print(f"finalize_counts steady: {(time.time()-t0)*1e3:.0f}ms", flush=True)

    # pull cost of the full padded aggregate vs compact slices
    t0 = time.time()
    host = [np.asarray(c) for c in chunk]
    print(f"pull full padded chunk ({sum(h.nbytes for h in host)/1e6:.0f}MB): "
          f"{time.time()-t0:.2f}s", flush=True)


@section("D. Pallas row gather (2D) variants")
def sD():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    N = 1 << 20
    R = N // 128
    Q = 8192
    tab = jnp.asarray(rng.integers(0, 1 << 31, (R, 128)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, R, Q).astype(np.int32))

    # D1: vectorized row gather inside kernel
    def kern1(i_ref, t_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    try:
        f1 = jax.jit(lambda i, t: pl.pallas_call(
            kern1,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, t))
        r = f1(idx, tab).block_until_ready()
        ok = np.array_equal(np.asarray(r), np.asarray(tab)[np.asarray(idx)])
        t0 = time.time()
        for _ in range(5):
            f1(idx, tab).block_until_ready()
        t = (time.time() - t0) / 5
        print(f"D1 pallas row take Q={Q} (ok={ok}): {t*1e6:.0f}us = "
              f"{t/Q*1e9:.1f} ns/row  [includes ~30ms dispatch]", flush=True)
        # in-loop version to subtract dispatch
        def body(i, ix):
            rows = pl.pallas_call(
                kern1,
                out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ix, tab)
            return (ix + rows[:, 0]) & (R - 1)
        t = loop_time(body, idx, K=16)
        print(f"D1 in-loop: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/row", flush=True)
    except Exception:
        traceback.print_exc(limit=2)

    # D2: take_along_axis per-lane gather: out[q,l] = t[idx2[q,l], l]
    try:
        idx2 = jnp.asarray(rng.integers(0, R, (Q, 128)).astype(np.int32))

        def kern2(i_ref, t_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        f2 = jax.jit(lambda i, t: pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, t))
        r = f2(idx2, tab).block_until_ready()
        ok = np.array_equal(
            np.asarray(r),
            np.take_along_axis(np.asarray(tab), np.asarray(idx2), axis=0))
        def body2(i, ix):
            rows = pl.pallas_call(
                kern2,
                out_shape=jax.ShapeDtypeStruct((Q, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ix, tab)
            return (ix + rows) & (R - 1)
        t = loop_time(body2, idx2, K=16)
        print(f"D2 take_along_axis [Q,128] (ok={ok}): {t*1e6:.0f}us = "
              f"{t/(Q*128)*1e9:.2f} ns/elem", flush=True)
    except Exception:
        traceback.print_exc(limit=2)

    # D3: XLA-level row gather for comparison, plus lane extract
    def xla_lookup(ix):
        rows = tab[ix]                          # [Q,128]
        lane = ix & 127
        oh = jax.lax.broadcasted_iota(jnp.int32, (Q, 128), 1) == lane[:, None]
        return jnp.sum(jnp.where(oh, rows, 0), axis=1)

    def body3(i, ix):
        v = xla_lookup(ix)
        return (ix + v) & (R - 1)
    t = loop_time(body3, idx, K=8)
    print(f"D3 XLA row gather+extract: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/row",
          flush=True)


@section("E. Pallas dense passes, in-loop")
def sE():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = 2048, 128

    def passes(x, pos):
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        for i in range(30):
            oh = cols == (pos[:, None] + i) % S
            v = jnp.sum(jnp.where(oh, x, 0), axis=1, dtype=jnp.int32)
            x = jnp.where(oh, v[:, None] + 1, x)
        return x

    def kern(x_ref, p_ref, o_ref):
        o_ref[:] = passes(x_ref[:], p_ref[:])

    x0 = jnp.zeros((B, S), jnp.int32)
    pos = jnp.arange(B, dtype=jnp.int32) % S

    def bodyp(i, x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, S), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, pos)
    t = loop_time(bodyp, x0, K=32)
    print(f"pallas 30 one-hot passes: {t*1e6:.0f}us/iter", flush=True)

    def bodyx(i, x):
        return passes(x, pos)
    t = loop_time(bodyx, x0, K=32)
    print(f"XLA    30 one-hot passes: {t*1e6:.0f}us/iter", flush=True)


print("\nDONE", flush=True)
