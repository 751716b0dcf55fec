"""One TPU session: official bench + gather microbenchmarks.

Batched into a single process per the axon claim rules (CLAUDE.md).
The microbenchmarks derisk the Pallas search-kernel design: what does a
table probe cost as (a) an XLA gather, (b) a Pallas scalar-indexed VMEM
load loop, (c) a Pallas dynamic-sublane row load + lane-select?  Run:

    python scripts/tpu_session_gather.py [--skip-bench]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


INTERPRET = False


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return best


def microbench():
    import numpy as np

    global jax
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 1 << 20          # table entries
    Q = 1 << 15          # queries per search iteration (B=8192 x 4)
    rng = np.random.default_rng(0)
    tab32 = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
    tab64 = jnp.asarray(rng.integers(0, 1 << 62, N, dtype=np.uint64))
    idx = jnp.asarray(rng.integers(0, N, Q, dtype=np.int32))

    # ---- (a) XLA gathers
    g32 = jax.jit(lambda t, i: t[i])
    t = timeit(g32, tab32, idx)
    print(f"xla gather i32   [{Q}] from [{N}]: {t*1e6:8.1f} us  "
          f"({t/Q*1e9:.1f} ns/elem)")
    g64 = jax.jit(lambda t, i: t[i])
    t = timeit(g64, tab64, idx)
    print(f"xla gather u64   [{Q}] from [{N}]: {t*1e6:8.1f} us  "
          f"({t/Q*1e9:.1f} ns/elem)")
    # two-probe (the cuckoo pattern): 2 gathers + compare/select
    def two_probe(t, i):
        e1 = t[i]
        e2 = t[(i * 2654435761) % N]
        return jnp.where(e1 > e2, e1, e2)
    t = timeit(jax.jit(two_probe), tab32, idx)
    print(f"xla 2-probe i32  [{Q}] from [{N}]: {t*1e6:8.1f} us")

    # ---- (b) Pallas: scalar fori_loop, dynamic scalar VMEM read
    R = N // 128
    tab2d = tab32.reshape(R, 128)

    def k_scalar(idx_ref, tab_ref, out_ref):
        def body(q, _):
            s = idx_ref[q]
            out_ref[q] = tab_ref[s]
            return 0
        jax.lax.fori_loop(0, Q, body, 0)

    try:
        f = pl.pallas_call(
            k_scalar,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda i, t: f(i, t))
        tm = timeit(jf, idx, tab32)
        ok = np.array_equal(np.asarray(jf(idx, tab32)), np.asarray(g32(tab32, idx)))
        print(f"pallas scalar-idx VMEM loop:       {tm*1e6:8.1f} us  "
              f"({tm/Q*1e9:.1f} ns/elem) ok={ok}")
    except Exception as e:
        print(f"pallas scalar-idx VMEM loop: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ---- (b2) Pallas: accumulate-only dynamic loads (no scalar stores)
    def k_acc(idx_ref, tab_ref, out_ref):
        def body(q, acc):
            return acc + tab_ref[idx_ref[q]]
        out_ref[0] = jax.lax.fori_loop(0, Q, body, jnp.int32(0))

    try:
        f = pl.pallas_call(
            k_acc,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        jf = jax.jit(lambda i, t: f(i, t))
        tm = timeit(jf, idx, tab32)
        print(f"pallas scalar-load accumulate:     {tm*1e6:8.1f} us  "
              f"({tm/Q*1e9:.1f} ns/elem)")
    except Exception as e:
        print(f"pallas scalar-load acc: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ---- (c) Pallas: dynamic-sublane row loads, 8 queries/iter, lane select
    def k_rows(idx_ref, tab_ref, out_ref, scratch):
        lanes8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        def body(q8, _):
            for j in range(8):
                s = idx_ref[q8 * 8 + j]
                scratch[j, :] = tab_ref[s >> 7, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) * 0
            # gather lanes: per-row one-hot select
            sl = jnp.stack([idx_ref[q8 * 8 + j] & 127 for j in range(8)])
            vals = jnp.sum(
                jnp.where(lanes8 == sl[:, None], scratch[:, :], 0), axis=1
            )
            out_ref[pl.ds(q8 * 8, 8)] = vals
            return 0
        jax.lax.fori_loop(0, Q // 8, body, 0)

    try:
        f = pl.pallas_call(
            k_rows,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
        )
        jf = jax.jit(lambda i, t: f(i, t))
        tm = timeit(jf, idx, tab2d)
        ok = np.array_equal(np.asarray(jf(idx, tab2d)), np.asarray(g32(tab32, idx)))
        print(f"pallas row-load + lane-select:     {tm*1e6:8.1f} us  "
              f"({tm/Q*1e9:.1f} ns/elem) ok={ok}")
    except Exception as e:
        print(f"pallas row-load: FAIL {type(e).__name__}: {str(e)[:200]}")

    # ---- (d) Pallas: whole-vector gather syntax (probably unsupported)
    def k_vec(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:][idx_ref[:]]

    try:
        f = pl.pallas_call(
            k_vec,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda i, t: f(i, t))
        tm = timeit(jf, idx, tab32)
        ok = np.array_equal(np.asarray(jf(idx, tab32)), np.asarray(g32(tab32, idx)))
        print(f"pallas vector-gather syntax:       {tm*1e6:8.1f} us  "
              f"({tm/Q*1e9:.1f} ns/elem) ok={ok}")
    except Exception as e:
        print(f"pallas vector-gather: FAIL {type(e).__name__}: {str(e)[:160]}")

    # ---- (e) jnp.take inside pallas
    def k_take(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try:
        f = pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((Q,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda i, t: f(i, t))
        tm = timeit(jf, idx, tab32)
        ok = np.array_equal(np.asarray(jf(idx, tab32)), np.asarray(g32(tab32, idx)))
        print(f"pallas jnp.take:                   {tm*1e6:8.1f} us  "
              f"({tm/Q*1e9:.1f} ns/elem) ok={ok}")
    except Exception as e:
        print(f"pallas jnp.take: FAIL {type(e).__name__}: {str(e)[:160]}")

    # ---- (f) context: one dense [8192,1000] i32 select pass (XLA)
    big = jnp.zeros((8192, 1000), jnp.int32)
    m = jnp.ones((8192, 1), jnp.int32)
    t = timeit(jax.jit(lambda a, b: jnp.where(a > b, a, b)), big, m)
    print(f"xla dense [8192,1000] where pass:  {t*1e6:8.1f} us")

    # ---- (g) a small in-kernel compute loop: how fast does a fori_loop
    # of pure vector ops run (per-iteration kernel overhead floor)?
    def k_loop(x_ref, out_ref):
        def body(i, acc):
            return acc + x_ref[:] * (i & 1)
        out_ref[:] = jax.lax.fori_loop(0, 256, body, jnp.zeros_like(x_ref))

    try:
        f = pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        x = jnp.ones((8, 128), jnp.int32)
        jf = jax.jit(lambda v: f(v))
        tm = timeit(jf, x)
        print(f"pallas 256-iter vec loop:          {tm*1e6:8.1f} us  "
              f"({tm/256*1e9:.1f} ns/iter)")
    except Exception as e:
        print(f"pallas vec loop: FAIL {type(e).__name__}: {str(e)[:160]}")


def main():
    if "--skip-bench" not in sys.argv:
        import bench

        bench.main()
    print("==== gather microbench ====")
    microbench()
    return 0


if __name__ == "__main__":
    sys.exit(main())
