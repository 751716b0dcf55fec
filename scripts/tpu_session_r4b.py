"""Round-4 TPU session 2: the 64-bit gather question.

Session r4a (x64 OFF by accident) measured element gathers at
~0.02 ns/elem — 1000x faster than the ~14 ns/elem the round-3 profiler
measured inside the real search program (x64 ON, u64 tables, i64
slots).  Hypothesis: 64-bit values and/or 64-bit indices force XLA's
serialized gather path; all-32-bit gathers vectorize.

This session (x64 ON, like the product):
  1. correctness check of the timing harness vs numpy
  2. dtype grid: value {u32,u64} x index {i32,i64} at S=2^21 and 2^26
  3. the REAL spectrum.cuckoo_lookup timed as-is vs an i32-slot,
     u32-two-plane variant
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401  (enables x64 + mallopt like the product)

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r4b @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    NQ = 65536
    ITER = 32
    PRIME = 2654435761

    def timeit(fn, *args, reps=8):
        r = fn(*args)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t) / reps

    rng = np.random.default_rng(7)

    # ---- 1. harness correctness: one fori_loop sum vs numpy
    S = 1 << 20
    tab_np = rng.integers(0, 2**31, S, dtype=np.uint32)
    idx_np = rng.integers(0, S, NQ, dtype=np.uint32)

    @jax.jit
    def g_check(tab, idx):
        def body(i, acc):
            ix = ((idx.astype(jnp.uint32)
                   + jnp.uint32(i) * jnp.uint32(PRIME))
                  & jnp.uint32(S - 1)).astype(jnp.int32)
            return acc + tab[ix].astype(jnp.uint64).sum()

        return jax.lax.fori_loop(0, ITER, body, jnp.uint64(0))

    got = int(g_check(jnp.asarray(tab_np), jnp.asarray(idx_np)))
    want = 0
    for i in range(ITER):
        ix = (idx_np + np.uint32(i) * np.uint32(PRIME)) & np.uint32(S - 1)
        want += int(tab_np[ix].astype(np.uint64).sum())
    RESULTS["harness_ok"] = got == want
    log(f"harness correctness: got={got} want={want} ok={got == want}")
    assert got == want, "timing harness computes garbage"

    # ---- 2. dtype grid
    def mk_bench(vdt, idt, S):
        @jax.jit
        def f(tab, idx):
            def body(i, acc):
                ix = ((idx + i.astype(jnp.uint32) * jnp.uint32(PRIME))
                      & jnp.uint32(S - 1)).astype(idt)
                # x64 mode promotes sum() to 64-bit: pin the carry dtype
                return acc + tab[ix].astype(jnp.uint32).sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, ITER, body, jnp.uint32(0))

        return f

    for lg in (21, 26):
        S = 1 << lg
        t32 = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
        t64 = jnp.asarray(rng.integers(0, 2**63, S, dtype=np.uint64))
        idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
        grid = {}
        for vname, tab in (("u32", t32), ("u64", t64)):
            for iname, idt in (("i32", jnp.int32), ("i64", jnp.int64)):
                dt = timeit(mk_bench(tab.dtype, idt, S), tab, idx) / ITER
                grid[f"{vname}_{iname}"] = round(dt * 1e6, 1)
                log(f"S=2^{lg} val={vname} idx={iname}: {dt*1e6:8.1f} us "
                    f"({dt/NQ*1e9:6.2f} ns/elem)")
        RESULTS[f"grid_2p{lg}_us"] = grid
        del t32, t64

    # ---- 3. the real cuckoo_lookup vs an i32/u32-plane variant
    from bfc_tpu.ops import spectrum as spec

    k = 25
    l_pre = 4  # matches counter defaults at bench scale? value is free here
    kb_bits = 2 * k - l_pre
    c_bits = 21

    def real_variant(entries64, qs, qk, cast_i32, planes):
        """cuckoo_lookup clone with switchable slot dtype and storage."""
        U64 = jnp.uint64

        @jax.jit
        def f(elo, ehi, e64, qs, qk):
            def body(i, acc):
                qk2 = qk ^ (i.astype(U64) * U64(0x9E3779B97F4A7C15))
                pk = spec.posk64(qs, qk2, l_pre, kb_bits)
                s1 = pk >> U64(64 - c_bits)
                qlow = spec._id_low(qs, qk2, l_pre, kb_bits, c_bits)
                alt = (qlow * spec._CUCKOO_GOLD) >> U64(64 - c_bits)
                s2 = s1 ^ alt
                if cast_i32:
                    s1c = s1.astype(jnp.int32)
                    s2c = s2.astype(jnp.int32)
                else:
                    s1c = s1.astype(jnp.int64)
                    s2c = s2.astype(jnp.int64)
                if planes:
                    e1 = elo[s1c].astype(U64) | (ehi[s1c].astype(U64) << U64(32))
                    e2 = elo[s2c].astype(U64) | (ehi[s2c].astype(U64) << U64(32))
                else:
                    e1 = e64[s1c]
                    e2 = e64[s2c]

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

        elo = (entries64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        ehi = (entries64 >> jnp.uint64(32)).astype(jnp.uint32)
        return timeit(f, elo, ehi, entries64, qs, qk) / ITER

    Sc = 1 << c_bits
    entries64 = jnp.asarray(rng.integers(0, 2**63, Sc, dtype=np.uint64))
    qs = jnp.asarray(rng.integers(0, 1 << l_pre, NQ, dtype=np.uint64))
    qk = jnp.asarray(rng.integers(0, 2**62, NQ, dtype=np.uint64))
    for cast_i32 in (False, True):
        for planes in (False, True):
            dt = real_variant(entries64, qs, qk, cast_i32, planes)
            name = f"cuckoo_i32={int(cast_i32)}_planes={int(planes)}"
            RESULTS[name + "_us"] = round(dt * 1e6, 1)
            log(f"{name}: {dt*1e6:8.1f} us/trip-equiv")

    # same at a big table (2^26: the human-scale regime)
    c_big = 26
    Sb = 1 << c_big
    entries_b = jnp.asarray(rng.integers(0, 2**63, Sb, dtype=np.uint64))

    def big_variant(cast_i32, planes):
        nonlocal c_bits, Sc, entries64
        c_save, S_save, e_save = c_bits, Sc, entries64
        c_bits, Sc, entries64 = c_big, Sb, entries_b
        try:
            return real_variant(entries_b, qs, qk, cast_i32, planes)
        finally:
            c_bits, Sc, entries64 = c_save, S_save, e_save

    for cast_i32 in (False, True):
        for planes in (False, True):
            dt = big_variant(cast_i32, planes)
            name = f"cuckoo_big_i32={int(cast_i32)}_planes={int(planes)}"
            RESULTS[name + "_us"] = round(dt * 1e6, 1)
            log(f"{name}: {dt*1e6:8.1f} us/trip-equiv")

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4b_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
