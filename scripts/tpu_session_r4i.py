"""Round-4 TPU session 9 (r4i): WHAT makes a u32 gather serialize?

r4g's trace settled that the product's probe gathers run serialized
(~13 ns/elem) even though the whole index chain is u32 and r4d's
probes hit the parallel path (~1 us / 65536).  Local HLO lowering
shows BOTH forms convert indices u32->i32 (jnp does this always), so
dtype at the gather op is NOT the discriminator.  Hypothesis: the
discriminator is FUSION STRUCTURE - a gather whose consumer is a big
elementwise chain gets fused into a serial loop-fusion, while a
gather feeding a reduce (r4d's .sum()) stays a standalone fast op.

Matrix (all in-loop inside one jit, 64 iters, fresh salt per case so
no executable-cache blur):

  a. gather -> sum                       (r4d form: expected fast)
  b. gather -> match-like chain -> sum   (product form: expected slow)
  c. b + optimization_barrier after the gather (candidate fix)
  d. the REAL probe: 4 gathers (2 planes x 2 slots) -> match -> sum
  e. d + barriers
  f. jit(cuckoo_lookup32) in-loop at c_bits 21/24/26/28 (VERDICT #2,
     properly jitted this time)
  g. f with barrier (if c wins)

Ends with a compiled.as_text() attempt (optimized-HLO retrieval
through the axon PJRT - unknown support; try/except).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401  (x64 on at init - the product env)

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4i_results.json"


def log(msg):
    sys.stderr.write(f"[r4i @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


NQ = 65536
ITER = 64


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    U32 = jnp.uint32
    I32 = jnp.int32
    rng = np.random.default_rng(11)
    S = 1 << 21
    tlo = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    thi = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
    ql = jnp.asarray(rng.integers(0, 2**31, NQ, dtype=np.uint32))
    PRIME = 2654435761

    def timeit(fn, *args, reps=6):
        r = fn(*args)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t) / reps / ITER

    def loop(body_of):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            return i + I32(1), acc + body_of(i)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    def case(name, f, *args):
        dt = timeit(jax.jit(f), *args)
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        log(f"{name:28s}: {dt*1e6:9.2f} us/iter")
        save()

    # a. gather -> sum (r4d form)
    def a_(tlo, idx):
        def b(i):
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xA1)) & U32(S - 1)
            return tlo[ix].sum(dtype=U32)

        return loop(b)

    case("a_gather_sum", a_, tlo, idx)

    # b. gather -> match chain -> sum (product form)
    def b_(tlo, idx, ql):
        def b(i):
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xB2)) & U32(S - 1)
            e = tlo[ix]
            ok = ((e & U32(0x3FFF)) != 0) & (((e >> U32(14)) & U32(1)) == U32(0)) \
                & ((e >> U32(15)) == (ql >> U32(15)))
            v = jnp.where(ok, (e & U32(0x3FFF)), U32(0))
            return v.sum(dtype=U32)

        return loop(b)

    case("b_gather_match", b_, tlo, idx, ql)

    # c. b + optimization_barrier after the gather
    def c_(tlo, idx, ql):
        def b(i):
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xC3)) & U32(S - 1)
            e = tlo[ix]
            e = jax.lax.optimization_barrier(e)
            ok = ((e & U32(0x3FFF)) != 0) & (((e >> U32(14)) & U32(1)) == U32(0)) \
                & ((e >> U32(15)) == (ql >> U32(15)))
            v = jnp.where(ok, (e & U32(0x3FFF)), U32(0))
            return v.sum(dtype=U32)

        return loop(b)

    case("c_barrier_match", c_, tlo, idx, ql)

    # c2. barrier on the INDICES too (isolate both sides)
    def c2_(tlo, idx, ql):
        def b(i):
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xC4)) & U32(S - 1)
            ix = jax.lax.optimization_barrier(ix)
            e = tlo[ix]
            e = jax.lax.optimization_barrier(e)
            ok = ((e & U32(0x3FFF)) != 0) & ((e >> U32(15)) == (ql >> U32(15)))
            v = jnp.where(ok, (e & U32(0x3FFF)), U32(0))
            return v.sum(dtype=U32)

        return loop(b)

    case("c2_barrier_both", c2_, tlo, idx, ql)

    # d. the real probe shape: 4 gathers (2 planes x 2 slots) -> match
    def mk_d(salt, barrier):
        def d_(tlo, thi, idx, ql):
            def b(i):
                s1 = (idx + i.astype(U32) * U32(PRIME) + U32(salt)) & U32(S - 1)
                alt = (ql * U32(0x9E3779B9)) >> U32(32 - 21)
                s2 = s1 ^ (alt & U32(S - 1))
                e1l, e1h, e2l, e2h = tlo[s1], thi[s1], tlo[s2], thi[s2]
                if barrier:
                    e1l, e1h, e2l, e2h = jax.lax.optimization_barrier(
                        (e1l, e1h, e2l, e2h))

                def match(el, eh, nest):
                    q_lo32 = (el >> U32(15)) | (eh << U32(17))
                    return ((el & U32(0x3FFF)) != 0) \
                        & (((el >> U32(14)) & U32(1)) == U32(nest)) \
                        & (q_lo32 == ql)

                v1 = e1l & U32(0x3FFF)
                v2 = e2l & U32(0x3FFF)
                occ = jnp.where(match(e1l, e1h, 0), v1,
                                jnp.where(match(e2l, e2h, 1), v2, U32(0)))
                return occ.sum(dtype=U32)

            return loop(b)

        return d_

    case("d_4gather_match", mk_d(0xD5, False), tlo, thi, idx, ql)
    case("e_4gather_barrier", mk_d(0xE6, True), tlo, thi, idx, ql)

    # f/g. the REAL cuckoo_lookup32, jitted, in-loop, vs c_bits
    from bfc_tpu.ops import spectrum as spec

    k = 25
    h0 = jnp.asarray(rng.integers(0, 1 << k, NQ).astype(np.uint32))
    h1 = jnp.asarray(rng.integers(0, 1 << k, NQ).astype(np.uint32))

    def mk_f(c_bits, salt):
        Sc = 1 << c_bits
        lo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
        hi = jnp.asarray(rng.integers(0, 1 << 17, Sc, dtype=np.uint32))

        def f_(lo, hi, h0, h1):
            tab = spec.CuckooTable(lo=lo, hi=hi)

            def b(i):
                hh0 = h0 ^ (i.astype(U32) * U32(PRIME) + U32(salt)) & U32((1 << k) - 1)
                occ = spec.cuckoo_lookup32(tab, hh0, h1, k, c_bits)
                return occ.sum(dtype=jnp.int32).astype(U32)

            return loop(b)

        return f_, lo, hi

    for cb in (21, 24, 26, 28):
        f_, lo, hi = mk_f(cb, 0xF0 + cb)
        case(f"f_lookup32_cb{cb}", f_, lo, hi, h0, h1)
        del lo, hi

    # h. optimized-HLO retrieval attempt (for future sessions)
    try:
        comp = jax.jit(mk_d(0xAA, False)).lower(tlo, thi, idx, ql).compile()
        txt = comp.as_text()
        RESULTS["hlo_retrieval"] = "ok"
        RESULTS["hlo_len"] = len(txt)
        with open("/root/repo/scripts/r4i_d_hlo.txt", "w") as f:
            f.write(txt)
        gl = [l for l in txt.splitlines() if "gather" in l][:8]
        for l in gl:
            log("HLO: " + l.strip()[:140])
    except Exception as e:  # pragma: no cover
        RESULTS["hlo_retrieval"] = f"failed: {e!r}"[:200]
        log(f"compiled.as_text() failed: {e!r}")

    save()
    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
