"""Round-4 TPU session 3: find the fast-gather trigger.

r4a (x64 OFF, unsigned u32 indices): 65536-elem gathers at ~1-2 us —
near memory-bound parallel random access (65536 x 32B HBM transactions
~= 2.5 us at 819 GB/s).  r4b (x64 ON, signed i32/i64 indices): the same
gathers at 955 us (~14.6 ns/index serialized).  One of {index
signedness, the x64 flag, JAX's out-of-bounds index handling} switches
XLA between a serialized loop and the parallel gather engine.  This
session isolates the trigger, then re-times the REAL cuckoo probe in
the fast form.

Phase A runs with x64 OFF; phase B flips jax_enable_x64 ON mid-process
(fresh jits re-trace under the new flag) and repeats, then times the
full cuckoo_lookup clone with the winning form at 2^21 and 2^26.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r4c @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


NQ = 65536
ITER = 32
PRIME = 2654435761


def timeit(fn, *args, reps=8):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t) / reps


def grid(tag, lg_sizes=(21, 26)):
    """Gather forms x index dtypes at the current x64 setting."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(7)

    def mk(form, S):
        @jax.jit
        def f(tab, idx):
            def body(i, acc):
                ixu = (idx + i.astype(jnp.uint32) * jnp.uint32(PRIME)) \
                    & jnp.uint32(S - 1)
                if form == "u32":
                    v = tab[ixu]
                elif form == "i32":
                    v = tab[ixu.astype(jnp.int32)]
                elif form == "i32_pib":
                    v = tab.at[ixu.astype(jnp.int32)].get(
                        mode="promise_in_bounds")
                elif form == "u32_pib":
                    v = tab.at[ixu].get(mode="promise_in_bounds")
                else:
                    raise ValueError(form)
                return acc + v.astype(jnp.uint32).sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, ITER, body, jnp.uint32(0))

        return f

    for lg in lg_sizes:
        S = 1 << lg
        tab = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
        out = {}
        for form in ("u32", "i32", "i32_pib", "u32_pib"):
            dt = timeit(mk(form, S), tab, idx) / ITER
            out[form] = round(dt * 1e6, 2)
            log(f"[{tag}] S=2^{lg} {form:8s}: {dt*1e6:9.2f} us "
                f"({dt/NQ*1e9:7.3f} ns/idx)")
        RESULTS[f"{tag}_2p{lg}_us"] = out
        del tab

    # window-gather cost in the fast form: is extra width ~free?
    S = 1 << 24

    def mkw(W):
        rows = S // W

        @jax.jit
        def f(tab2d, idx):
            def body(i, acc):
                ixu = (idx + i.astype(jnp.uint32) * jnp.uint32(PRIME)) \
                    & jnp.uint32(rows - 1)
                v = tab2d[ixu]  # [NQ, W]
                return acc + v.astype(jnp.uint32).sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, ITER, body, jnp.uint32(0))

        return f

    import numpy as np
    flat = rng.integers(0, 2**31, S, dtype=np.uint32)
    wout = {}
    for W in (1, 2, 4, 8):
        tab2d = jnp.asarray(flat.reshape(S // W, W))
        dt = timeit(mkw(W), tab2d, idx) / ITER
        wout[W] = round(dt * 1e6, 2)
        log(f"[{tag}] window W={W} (u32 idx, [2^24/{W},{W}]): "
            f"{dt*1e6:9.2f} us")
        del tab2d
    RESULTS[f"{tag}_window_us"] = wout


def cuckoo_probe(tag):
    """Full cuckoo_lookup clone with u32 slots + promise_in_bounds."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    U64 = jnp.uint64
    GOLD = U64(0x9E3779B97F4A7C15)
    rng = np.random.default_rng(11)

    def run(c_bits, form):
        S = 1 << c_bits

        @jax.jit
        def f(tab, pk0, qlow0):
            def body(i, acc):
                pk = pk0 ^ (i.astype(U64) * GOLD)
                qlow = qlow0 ^ i.astype(U64)
                s1 = pk >> U64(64 - c_bits)
                alt = (qlow * GOLD) >> U64(64 - c_bits)
                s2 = s1 ^ alt
                if form == "i64":
                    e1 = tab[s1.astype(jnp.int64)]
                    e2 = tab[s2.astype(jnp.int64)]
                elif form == "u32_pib":
                    e1 = tab.at[s1.astype(jnp.uint32)].get(
                        mode="promise_in_bounds")
                    e2 = tab.at[s2.astype(jnp.uint32)].get(
                        mode="promise_in_bounds")
                else:
                    raise ValueError(form)

                def match(e, nest):
                    return (((e & U64(0x3FFF)) != 0)
                            & (((e >> U64(14)) & U64(1)) == U64(nest))
                            & ((e >> U64(15)) == qlow))

                v1 = (e1 & U64(0x3FFF)).astype(jnp.int32)
                v2 = (e2 & U64(0x3FFF)).astype(jnp.int32)
                occ = jnp.where(match(e1, 0), v1,
                                jnp.where(match(e2, 1), v2, -1))
                return acc + occ.sum(dtype=jnp.int32)

            return jax.lax.fori_loop(0, ITER, body, jnp.int32(0))

        tab = jnp.asarray(rng.integers(0, 2**63, S, dtype=np.uint64))
        pk0 = jnp.asarray(rng.integers(0, 2**63, NQ, dtype=np.uint64))
        ql0 = jnp.asarray(rng.integers(0, 2**29, NQ, dtype=np.uint64))
        dt = timeit(f, tab, pk0, ql0) / ITER
        del tab
        return dt

    for c_bits in (21, 26, 28):
        for form in ("i64", "u32_pib"):
            dt = run(c_bits, form)
            name = f"{tag}_cuckoo_2p{c_bits}_{form}_us"
            RESULTS[name] = round(dt * 1e6, 1)
            log(f"[{tag}] cuckoo c_bits={c_bits} {form}: {dt*1e6:9.1f} us/trip")


def main() -> int:
    import jax

    log("=== phase A: x64 OFF ===")
    grid("x64off")

    log("=== phase B: x64 ON (mid-process flip; fresh jits) ===")
    jax.config.update("jax_enable_x64", True)
    grid("x64on")
    cuckoo_probe("x64on")

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4c_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
