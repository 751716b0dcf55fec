"""Round-4 TPU session 5: minimal-product-change validation.

r4d proved the pure u32-pair cuckoo probe runs ~1-2 us/trip (vs ~2-4 ms
for the u64-table form).  Before rewriting the engine, check which
cheaper forms also hit the fast path:

  1. u32-plane tables + slot indices computed with ordinary u64
     arithmetic, cast to u32 just before the gather (minimal change:
     keep all key math in u64, only split the table and cast indices).
  2. Same but cast to i32 (is signedness the poison under x64?).
  3. Flat 1-D scatter (.at[u32 idx].set / .add / .max on u32 operand):
     does the fast path exist for scatters (pool/stack design lever)?
  4. Gather from a BOOL/u8 plane with u32 indices (win_bits etc.).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r4e @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


NQ = 65536
ITER = 32


def timeit(fn, *args, reps=8):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t) / reps


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    U32 = jnp.uint32
    U64 = jnp.uint64
    I32 = jnp.int32
    GOLD = U64(0x9E3779B97F4A7C15)
    rng = np.random.default_rng(7)

    def probe_u64math(c_bits, idx_dtype):
        Sc = 1 << c_bits
        elo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
        ehi = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
        pk0 = jnp.asarray(rng.integers(0, 2**63, NQ, dtype=np.uint64))
        ql0 = jnp.asarray(rng.integers(0, 2**48, NQ, dtype=np.uint64))

        @jax.jit
        def f(elo, ehi, pk0, ql0):
            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, acc = c
                pk = pk0 ^ (i.astype(U64) * GOLD)
                qlow = ql0 ^ i.astype(U64)
                s1 = (pk >> U64(64 - c_bits)).astype(idx_dtype)
                alt = ((qlow * GOLD) >> U64(64 - c_bits)).astype(idx_dtype)
                s2 = s1 ^ alt
                e1l = elo[s1]
                e1h = ehi[s1]
                e2l = elo[s2]
                e2h = ehi[s2]
                e1 = e1l.astype(U64) | (e1h.astype(U64) << U64(32))
                e2 = e2l.astype(U64) | (e2h.astype(U64) << U64(32))

                def match(e, nest):
                    return (((e & U64(0x3FFF)) != 0)
                            & (((e >> U64(14)) & U64(1)) == U64(nest))
                            & ((e >> U64(15)) == qlow))

                v1 = (e1 & U64(0x3FFF)).astype(I32)
                v2 = (e2 & U64(0x3FFF)).astype(I32)
                occ = jnp.where(match(e1, 0), v1,
                                jnp.where(match(e2, 1), v2, -1))
                return i + I32(1), acc + occ.sum(dtype=I32)

            return jax.lax.while_loop(cond, body, (I32(0), I32(0)))[1]

        dt = timeit(f, elo, ehi, pk0, ql0) / ITER
        del elo, ehi
        return dt

    for cb in (21, 26):
        for name, dt_ in (("u32", jnp.uint32), ("i32", jnp.int32)):
            dt = probe_u64math(cb, dt_)
            RESULTS[f"u64math_{name}_2p{cb}_us"] = round(dt * 1e6, 2)
            log(f"u64math idx={name} c_bits={cb}: {dt*1e6:9.2f} us/trip")

    # scatters: flat u32 target, u32 indices
    S = 1 << 21
    tgt = jnp.zeros((S,), U32)
    idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
    val = jnp.asarray(rng.integers(0, 2**31, NQ, dtype=np.uint32))
    PRIME = 2654435761

    def mk_scatter(kind):
        @jax.jit
        def f(tgt, idx, val):
            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, t = c
                ix = (idx + i.astype(U32) * U32(PRIME)) & U32(S - 1)
                if kind == "set":
                    t = t.at[ix].set(val, mode="drop")
                elif kind == "max":
                    t = t.at[ix].max(val, mode="drop")
                elif kind == "add":
                    t = t.at[ix].add(val, mode="drop")
                return i + I32(1), t

            return jax.lax.while_loop(cond, body, (I32(0), tgt))[1]

        return f

    for kind in ("set", "max", "add"):
        dt = timeit(mk_scatter(kind), tgt, idx, val) / ITER
        RESULTS[f"scatter_{kind}_us"] = round(dt * 1e6, 2)
        log(f"scatter {kind} (u32/u32): {dt*1e6:9.2f} us/iter")

    # gather from u8 plane (bool-ish) with u32 idx
    tab8 = jnp.asarray(rng.integers(0, 255, S, dtype=np.uint8))

    @jax.jit
    def g8(tab8, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME)) & U32(S - 1)
            return i + I32(1), acc + tab8[ix].astype(U32).sum(dtype=U32)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    dt = timeit(g8, tab8, idx) / ITER
    RESULTS["gather_u8_us"] = round(dt * 1e6, 2)
    log(f"gather u8 plane (u32 idx): {dt*1e6:9.2f} us/iter")

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4e_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
