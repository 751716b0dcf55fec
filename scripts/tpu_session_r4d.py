"""Round-4 TPU session 4: scope of the 64-bit gather poisoning.

Facts so far (r4a/r4b/r4c):
  * pure-32-bit gather loops: ~1 us per 65536-index gather (memory-
    bandwidth parallel gather - almost certainly the v5e SparseCore).
  * the u64-table cuckoo probe: ~2.0-3.9 ms (serialized ~15 ns/index),
    regardless of index dtype.
  * r4b measured even u32-value/i32-index gathers at 955 us when x64
    was enabled at process start; r4c's "fast" phase-B numbers may have
    been process-level executable-cache hits from phase A (identical
    HLO), so the poisoning trigger is still ambiguous between
    (a) any 64-bit op in the loop body, (b) the i64 fori_loop induction
    var under x64, (c) 64-bit gather operands only.

This session (fresh process, import bfc_tpu first = the product's
exact config, x64 on at init) distinguishes them, then times the REAL
cuckoo probe rewritten in pure u32-pair arithmetic - the candidate
round-4 optimization.  Every jit gets a unique salt constant so no
executable cache can blur cases.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401  (x64 on at init, mallopt - the product env)

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r4d @{time.time()-T0:.0f}s] {msg}\n")
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
    rng = np.random.default_rng(7)
    S = 1 << 21
    tab = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
    PRIME = 2654435761

    def case(name, f):
        dt = timeit(f, tab, idx) / ITER
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        log(f"{name:24s}: {dt*1e6:9.2f} us/gather-iter")

    # A. pure-32 loop, i32-forced induction (while_loop with i32 carry)
    @jax.jit
    def a_pure32(tab, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xA0001)) \
                & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    case("A_pure32_i32loop", a_pure32)

    # B. same body, fori_loop with python bounds (i64 induction under x64)
    @jax.jit
    def b_fori(tab, idx):
        def body(i, acc):
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xB0002)) \
                & U32(S - 1)
            return acc + tab[ix].sum(dtype=U32)

        return jax.lax.fori_loop(0, ITER, body, U32(0))

    case("B_fori_i64ind", b_fori)

    # C. A + one u64 op on a second carry: does ANY 64-bit op poison?
    @jax.jit
    def c_u64op(tab, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc, acc64 = c
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xC0003)) \
                & U32(S - 1)
            acc64 = acc64 * U64(0x9E3779B97F4A7C15) + U64(1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32), acc64

        return jax.lax.while_loop(cond, body, (I32(0), U32(0), U64(1)))[1]

    case("C_plus_u64_op", c_u64op)

    # D. u64 table decomposed into two u32 planes, all-32 loop
    tlo = tab
    thi = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))

    @jax.jit
    def d_planes(tlo, thi, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xD0004)) \
                & U32(S - 1)
            return i + I32(1), acc + tlo[ix].sum(dtype=U32) \
                + thi[ix].sum(dtype=U32)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    dt = timeit(d_planes, tlo, thi, idx) / ITER
    RESULTS["D_u32_planes_us"] = round(dt * 1e6, 2)
    log(f"{'D_u32_planes':24s}: {dt*1e6:9.2f} us/gather-iter (2 gathers)")

    # F. latency form: ix depends on the previous gather (no pipelining)
    @jax.jit
    def f_latency(tab, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc, carry = c
            ix = (idx + carry + U32(0xF0006)) & U32(S - 1)
            v = tab[ix]
            return i + I32(1), acc + v.sum(dtype=U32), v

        return jax.lax.while_loop(
            cond, body, (I32(0), U32(0), idx))[1]

    case("F_latency_chain", f_latency)

    # E. the REAL cuckoo probe in pure u32-pair arithmetic.
    #    Inputs pre-split: pk = (pk_hi, pk_lo), qlow = (ql_hi, ql_lo).
    #    slots: s1 = pk >> (64-cb)  -> from pk_hi (cb <= 32)
    #    alt:   (qlow * GOLD) >> (64-cb) -> top bits of the wrapped
    #           64-bit product, via u32-limb multiplication
    #    match: payload != 0, nest bit, 49-bit qlow equality - all on
    #           (elo, ehi) u32 planes
    GHI = 0x9E3779B9
    GLO = 0x7F4A7C15

    def mul32x32(a, b):
        """(hi, lo) of a*b for u32 a,b via 16-bit limbs (no 64-bit)."""
        al = a & U32(0xFFFF)
        ah = a >> U32(16)
        bl = b & U32(0xFFFF)
        bh = b >> U32(16)
        ll = al * bl
        lh = al * bh
        hl = ah * bl
        hh = ah * bh
        mid = lh + hl
        mid_c = (mid < lh).astype(U32)          # carry out of mid
        lo = ll + (mid << U32(16))
        c1 = (lo < ll).astype(U32)
        hi = hh + (mid >> U32(16)) + (mid_c << U32(16)) + c1
        return hi, lo

    def mul64_low(ahi, alo, bhi, blo):
        """(hi, lo) of the WRAPPED 64-bit product (a*b mod 2^64)."""
        hi, lo = mul32x32(alo, blo)
        hi = hi + alo * bhi + ahi * blo
        return hi, lo

    def probe_pairs(c_bits):
        Sc = 1 << c_bits
        elo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
        ehi = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
        pkh = jnp.asarray(rng.integers(0, 2**31, NQ, dtype=np.uint32))
        qlh = jnp.asarray(rng.integers(0, 1 << 17, NQ, dtype=np.uint32))
        qll = jnp.asarray(rng.integers(0, 2**31, NQ, dtype=np.uint32))

        @jax.jit
        def f(elo, ehi, pkh, qlh, qll):
            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, acc = c
                salt = i.astype(U32) * U32(PRIME)
                pk_hi = pkh ^ salt
                ql_lo = qll ^ salt
                ql_hi = qlh
                s1 = pk_hi >> U32(32 - c_bits) if c_bits < 32 else pk_hi
                mhi, _ = mul64_low(ql_hi, ql_lo, U32(GHI), U32(GLO))
                alt = mhi >> U32(32 - c_bits) if c_bits < 32 else mhi
                s2 = s1 ^ alt
                e1l = elo[s1]
                e1h = ehi[s1]
                e2l = elo[s2]
                e2h = ehi[s2]

                def match(el, eh, nest):
                    # payload = el & 0x3FFF; nest = (el >> 14) & 1;
                    # qlow49 = (el >> 15) | (eh << 17) [+ eh >> 15 top]
                    pay_ok = (el & U32(0x3FFF)) != 0
                    nest_ok = ((el >> U32(14)) & U32(1)) == U32(nest)
                    lo_ok = ((el >> U32(15)) | (eh << U32(17))) == (
                        (ql_lo >> U32(15)) | (ql_lo << U32(17))) | True
                    # exact 49-bit compare: low 32 of qlow vs entry bits
                    q_lo32 = (el >> U32(15)) | (eh << U32(17))
                    q_hi17 = eh >> U32(15)
                    eq = (q_lo32 == ql_lo) & (q_hi17 == ql_hi)
                    del lo_ok
                    return pay_ok & nest_ok & eq

                v1 = (e1l & U32(0x3FFF)).astype(I32)
                v2 = (e2l & U32(0x3FFF)).astype(I32)
                occ = jnp.where(match(e1l, e1h, 0), v1,
                                jnp.where(match(e2l, e2h, 1), v2, -1))
                return i + I32(1), acc + occ.sum(dtype=I32)

            return jax.lax.while_loop(cond, body, (I32(0), I32(0)))[1]

        dt = timeit(f, elo, ehi, pkh, qlh, qll) / ITER
        del elo, ehi
        return dt

    for cb in (21, 26, 28):
        dt = probe_pairs(cb)
        RESULTS[f"E_pair_cuckoo_2p{cb}_us"] = round(dt * 1e6, 2)
        log(f"E_pair_cuckoo c_bits={cb}: {dt*1e6:9.2f} us/trip")

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4d_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
