"""Round-4 TPU session 11 (r4k): fine bisection fast->slow probe forms.

Known: r4i-f (lookup32 on 1-D pre-hashed queries, xor-salt only) is
FAST even at c_bits=28 (so a true HBM parallel-gather path exists);
r4j's w_flat_hash (1-D + canonical_hash32 + concat) and w_2d_* are
all SLOW (~2-3 ms/iter), and the 1-D "fixflat" HLO has gather fusions
IDENTICAL to the fast case - the difference is scheduling (the slow
while regions are wide.wide double-sunk).  Bisect one feature at a
time from the fast form:

  s1  r4i-f exact (reconfirm fast in this process)
  s2  + one wang_hash round on h0
  s3  + full canonical_hash32 (1-D, no concat, 16384 queries)
  s4  s3 on 65536 queries via jnp.concatenate
  s5  s3 on 65536 queries via 4 SEPARATE lookups (no concat)
  s6  s1 + optimization_barrier on (h0,h1) right before the lookup
  s7  s3 + optimization_barrier on (h0,h1) (candidate de-scheduling fix)
  s8  s3 with the hash chain WHILE-CARRIED (hash outside the gather
      dependence: carry h from the previous iteration)

Each case: fresh salt, jit, compile-time + per-iter time.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4k_results.json"


def log(msg):
    sys.stderr.write(f"[r4k @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


NQ = 65536
B = 16384
ITER = 64
K = 25
CB = 21


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bfc_tpu.ops import kmer as kops
    from bfc_tpu.ops import spectrum as spec

    U32 = jnp.uint32
    I32 = jnp.int32
    rng = np.random.default_rng(17)
    Sc = 1 << CB
    lo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 17, Sc, dtype=np.uint32))
    hq0 = jnp.asarray(rng.integers(0, 1 << K, NQ).astype(np.uint32))
    hq1 = jnp.asarray(rng.integers(0, 1 << K, NQ).astype(np.uint32))
    xb0 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    xb1 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    xb2 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    xb3 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    PRIME = 2654435761
    kmask = U32((1 << K) - 1)

    def timeit(fn, *args, reps=6):
        r = fn(*args)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t) / reps / ITER

    def lookup(h0, h1):
        return spec.cuckoo_lookup32(spec.CuckooTable(lo=lo, hi=hi),
                                    h0, h1, K, CB)

    def counted(body_of, n_carry_dummy=0):
        def f(*args):
            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, acc = c
                return i + I32(1), acc + body_of(i, *args)

            return jax.lax.while_loop(cond, body, (I32(0), I32(0)))[1]

        return f

    def case(name, body_of, *args):
        f = counted(body_of)
        t = time.time()
        jf = jax.jit(f)
        r = jf(*args)
        jax.block_until_ready(r)
        cs = round(time.time() - t, 1)
        dt = timeit(jf, *args)
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        RESULTS[name + "_compile_s"] = cs
        log(f"{name:10s}: {dt*1e6:9.2f} us/iter (compile {cs}s)")
        save()

    # s1: r4i-f exact
    def s1(i, h0, h1):
        hh0 = h0 ^ (i.astype(U32) * U32(PRIME) + U32(0x11)) & kmask
        return lookup(hh0, h1).sum(dtype=I32)

    case("s1_base", s1, hq0, hq1)

    # s2: + one wang round
    def s2(i, h0, h1):
        s = (i.astype(U32) * U32(PRIME) + U32(0x22)) & kmask
        hh0 = kops.wang_hash((h0 ^ s) & kmask, kmask)
        return lookup(hh0, h1).sum(dtype=I32)

    case("s2_wang1", s2, hq0, hq1)

    # s3: full canonical_hash32, 1-D 65536 queries
    def s3(i, h0, h1):
        s = (i.astype(U32) * U32(PRIME) + U32(0x33)) & kmask
        a0, a1 = (h0 ^ s) & kmask, h1
        c0, c1 = kops.canonical_hash32(a0, a1, a1 ^ kmask, a0 ^ kmask, K)
        return lookup(c0, c1).sum(dtype=I32)

    case("s3_canon", s3, hq0, hq1)

    # s4: canonical + concat of 4 x [B]
    def s4(i, x0, x1, x2, x3):
        s = (i.astype(U32) * U32(PRIME) + U32(0x44)) & kmask
        q0 = jnp.concatenate([(x0 ^ s) & kmask, x1, x2, x3])
        q1 = jnp.concatenate([x1, x2, x3, (x0 ^ s) & kmask])
        c0, c1 = kops.canonical_hash32(q0, q1, q1 ^ kmask, q0 ^ kmask, K)
        return lookup(c0, c1).sum(dtype=I32)

    case("s4_concat", s4, xb0, xb1, xb2, xb3)

    # s5: canonical + 4 separate [B] lookups
    def s5(i, x0, x1, x2, x3):
        s = (i.astype(U32) * U32(PRIME) + U32(0x55)) & kmask
        tot = I32(0)
        for j, xx in enumerate((x0, x1, x2, x3)):
            a0 = (xx ^ s) & kmask
            c0, c1 = kops.canonical_hash32(a0, x1, x1 ^ kmask, a0 ^ kmask, K)
            tot = tot + lookup(c0, c1).sum(dtype=I32)
        return tot

    case("s5_4xB", s5, xb0, xb1, xb2, xb3)

    # s6: base + barrier
    def s6(i, h0, h1):
        hh0 = h0 ^ (i.astype(U32) * U32(PRIME) + U32(0x66)) & kmask
        hh0, hh1 = jax.lax.optimization_barrier((hh0, h1))
        return lookup(hh0, hh1).sum(dtype=I32)

    case("s6_base_bar", s6, hq0, hq1)

    # s7: canonical + barrier before lookup
    def s7(i, h0, h1):
        s = (i.astype(U32) * U32(PRIME) + U32(0x77)) & kmask
        a0, a1 = (h0 ^ s) & kmask, h1
        c0, c1 = kops.canonical_hash32(a0, a1, a1 ^ kmask, a0 ^ kmask, K)
        c0, c1 = jax.lax.optimization_barrier((c0, c1))
        return lookup(c0, c1).sum(dtype=I32)

    case("s7_canon_bar", s7, hq0, hq1)

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
