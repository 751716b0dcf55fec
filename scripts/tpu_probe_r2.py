"""One-process TPU measurement session (round 2).

Measures, in one TPU claim:
  1. axon tunnel D2H/H2D bandwidth + latency, async-copy overlap
  2. counting phase breakdown (device chunk_aggregate vs pull vs merge)
  3. XLA serialized-gather baselines (u32 vs u64, masked)
  4. Pallas variants: fused dense passes, scalar-loop VMEM gather,
     vectorized take, HBM per-element DMA gather

Every section is independently guarded so one failure doesn't lose the
rest of the session.
"""
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)


def timeit(f, n=5, warm=2):
    for _ in range(warm):
        f()
    t0 = time.time()
    for _ in range(n):
        f()
    return (time.time() - t0) / n


def section(name):
    def deco(fn):
        print(f"\n=== {name} ===", flush=True)
        try:
            fn()
        except Exception:
            traceback.print_exc()
        return fn
    return deco


@section("1. tunnel transfer")
def s1():
    for mb in [0.001, 1, 4, 16, 32]:
        nbytes = int(mb * 1e6)
        x = jnp.zeros((max(nbytes // 4, 1),), jnp.uint32)
        x.block_until_ready()
        t = timeit(lambda: np.asarray(x), n=3)
        print(f"D2H {mb}MB: {t*1e3:.2f}ms = {nbytes/t/1e6:.0f} MB/s")
        y = np.zeros((max(nbytes // 4, 1),), np.uint32)
        t = timeit(lambda: jax.device_put(y).block_until_ready(), n=3)
        print(f"H2D {mb}MB: {t*1e3:.2f}ms = {nbytes/t/1e6:.0f} MB/s")
    # async overlap
    xs = [jnp.arange(1 << 20, dtype=jnp.uint32) + i for i in range(6)]
    jax.block_until_ready(xs)
    t0 = time.time()
    _ = [np.asarray(x) for x in xs]
    t_serial = time.time() - t0
    t0 = time.time()
    for x in xs:
        x.copy_to_host_async()
    _ = [np.asarray(x) for x in xs]
    t_async = time.time() - t0
    print(f"pull 6x4MB serial: {t_serial:.3f}s, async-first: {t_async:.3f}s")


@section("2. counting phase breakdown")
def s2():
    from bfc_tpu.opts import Opts
    from bfc_tpu.ops import spectrum as spec
    from bfc_tpu.ops import spectrum_host as sph

    opt = Opts()
    opt.k = 25
    l_pre = opt.effective_l_pre()
    B, L = 8192, 128
    rng = np.random.default_rng(1)
    # bench-like data: reads drawn from a 250kb genome so the distinct
    # count (~350k/chunk) matches the real bench
    glen = 250_000
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    starts = rng.integers(0, glen - 101, B)
    bases = np.full((B, L), 4, np.uint8)
    for i, st in enumerate(starts):
        bases[i, :101] = genome[st:st+101]
    qok = np.ones((B, L), bool)
    lens = np.full((B,), 101, np.int32)

    def run(ab):
        return spec.chunk_aggregate(
            jnp.asarray(bases), jnp.asarray(qok), jnp.asarray(lens),
            jnp.uint64(ab), opt.k, l_pre, B * L)

    t0 = time.time()
    chunk, g = run(0)
    jax.block_until_ready(chunk)
    print(f"first call (compile+run): {time.time()-t0:.1f}s")
    t = timeit(lambda: jax.block_until_ready(run(0)[0]), n=3)
    print(f"chunk_aggregate device: {t*1e3:.0f}ms")
    gi = int(g)
    gpad = 1 << max(10, (gi - 1).bit_length())
    t0 = time.time()
    ha = sph.HostAgg(*[np.asarray(c[:gpad])[:gi] for c in chunk])
    print(f"pull gi={gi} gpad={gpad} ({gpad*52/1e6:.0f}MB): {time.time()-t0:.3f}s")
    # pull with async prefetch
    chunk2, _ = run(0)
    sl = [c[:gpad] for c in chunk2]
    jax.block_until_ready(sl)
    t0 = time.time()
    for c in sl:
        c.copy_to_host_async()
    ha2 = sph.HostAgg(*[np.asarray(c)[:gi] for c in sl])
    print(f"pull async-first: {time.time()-t0:.3f}s")
    t = timeit(lambda: sph.merge_host_aggs(ha, ha), n=3)
    print(f"host merge {gi}+{gi}: {t*1e3:.0f}ms")
    # dispatch + g sync latency
    t0 = time.time()
    c3, g3 = run(B * L)
    gi3 = int(g3)
    print(f"dispatch + int(g) sync: {time.time()-t0:.3f}s")


@section("3. XLA gather baselines")
def s3():
    rng = np.random.default_rng(2)
    N = 1 << 20
    Q = 8192
    tab32 = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    tab64 = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.uint64))
    idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

    g32 = jax.jit(lambda t, i: t[i])
    g64 = jax.jit(lambda t, i: t[i])
    t = timeit(lambda: g32(tab32, idx).block_until_ready())
    print(f"u32 gather {Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")
    t = timeit(lambda: g64(tab64, idx).block_until_ready())
    print(f"u64 gather {Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")
    for q in [2048, 4096, 16384, 32768]:
        idq = jnp.asarray(rng.integers(0, N, q).astype(np.int32))
        t = timeit(lambda: g32(tab32, idq).block_until_ready())
        print(f"u32 gather {q}: {t*1e6:.0f}us = {t/q*1e9:.1f} ns/elem")
    # 2-level: u8 presence filter then u64
    tab8 = jnp.asarray(rng.integers(0, 256, N).astype(np.uint8))
    g8 = jax.jit(lambda t, i: t[i])
    t = timeit(lambda: g8(tab8, idx).block_until_ready())
    print(f"u8 gather {Q}: {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")


@section("4a. Pallas fused dense passes")
def s4a():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = 2048, 128

    def mk_passes(x, pos):
        # 30 dependent one-hot select+reduce passes (heap/stack style)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
        for i in range(30):
            oh = cols == (pos[:, None] + i) % S
            v = jnp.sum(jnp.where(oh, x, 0), axis=1, dtype=jnp.int32)
            x = jnp.where(oh, v[:, None] + 1, x)
        return x

    def kern(x_ref, p_ref, o_ref):
        o_ref[:] = mk_passes(x_ref[:], p_ref[:])

    x = jnp.zeros((B, S), jnp.int32)
    pos = jnp.arange(B, dtype=jnp.int32) % S
    fp = jax.jit(lambda x, p: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, S), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, p))
    t = timeit(lambda: fp(x, pos).block_until_ready())
    print(f"pallas 30 one-hot passes [2048,128]: {t*1e6:.0f}us")
    fx = jax.jit(mk_passes)
    t = timeit(lambda: fx(x, pos).block_until_ready())
    print(f"XLA    30 one-hot passes [2048,128]: {t*1e6:.0f}us")


@section("4b. Pallas scalar-loop VMEM gather")
def s4b():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 20
    Q = 8192
    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

    def kern(i_ref, t_ref, o_ref):
        def body(i, _):
            j = i_ref[i]
            o_ref[i] = t_ref[j]
            return 0
        jax.lax.fori_loop(0, Q, body, 0)

    f = jax.jit(lambda i, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Q,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(i, t))
    r = f(idx, tab).block_until_ready()
    ok = np.array_equal(np.asarray(r), np.asarray(tab)[np.asarray(idx)])
    t = timeit(lambda: f(idx, tab).block_until_ready())
    print(f"pallas scalar gather {Q} (ok={ok}): {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")


@section("4c. Pallas vectorized take in kernel")
def s4c():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 20
    Q = 8192
    rng = np.random.default_rng(4)
    tab = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

    def kern(i_ref, t_ref, o_ref):
        o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

    f = jax.jit(lambda i, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Q,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t))
    r = f(idx, tab).block_until_ready()
    ok = np.array_equal(np.asarray(r), np.asarray(tab)[np.asarray(idx)])
    t = timeit(lambda: f(idx, tab).block_until_ready())
    print(f"pallas vect take {Q} (ok={ok}): {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")


@section("4d. Pallas 2D dynamic_gather-ish (table rows)")
def s4d():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # table as (N/128, 128); query gathers whole rows by sublane index,
    # then selects the lane via one-hot (dense)
    N = 1 << 20
    R = N // 128
    Q = 8192
    rng = np.random.default_rng(5)
    tab = jnp.asarray(
        rng.integers(0, 1 << 32, (R, 128), dtype=np.uint64).astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, N, Q).astype(np.int32))

    def kern(i_ref, t_ref, o_ref):
        def body(i, _):
            j = i_ref[i]
            row = t_ref[j >> 7]          # dynamic sublane row read
            lane = j & 127
            oh = jax.lax.broadcasted_iota(jnp.int32, (128,), 0) == lane
            o_ref[i] = jnp.sum(jnp.where(oh, row, 0)).astype(jnp.uint32)
            return 0
        jax.lax.fori_loop(0, Q, body, 0)

    f = jax.jit(lambda i, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Q,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(i, t))
    r = f(idx, tab).block_until_ready()
    ok = np.array_equal(
        np.asarray(r), np.asarray(tab).reshape(-1)[np.asarray(idx)])
    t = timeit(lambda: f(idx, tab).block_until_ready())
    print(f"pallas row gather {Q} (ok={ok}): {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")


@section("4e. Pallas HBM per-element DMA gather (pipelined)")
def s4e():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 22  # 16MB u32: bigger than VMEM, must stay in HBM
    Q = 8192
    NSLOT = 8
    rng = np.random.default_rng(6)
    tab = jnp.asarray(rng.integers(0, 1 << 32, N, dtype=np.uint64).astype(np.uint32))
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
            scratch=pltpu.VMEM((NSLOT,), jnp.uint32),
            sems=pltpu.SemaphoreType.DMA((NSLOT,)),
        )

    f = jax.jit(lambda i, t: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Q,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(i, t))
    r = f(idx, tab).block_until_ready()
    ok = np.array_equal(np.asarray(r), np.asarray(tab)[np.asarray(idx)])
    t = timeit(lambda: f(idx, tab).block_until_ready())
    print(f"pallas DMA gather {Q} (ok={ok}): {t*1e6:.0f}us = {t/Q*1e9:.1f} ns/elem")


print("\nDONE", flush=True)
