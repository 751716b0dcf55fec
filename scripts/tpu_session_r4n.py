"""Round-4 TPU session 14 (r4n): find the fast->serial flip IN A FAST
SESSION, including the scan-chunk restructuring candidate.

r4j's bisection ran in slow sessions (everything serialized); r4l/r4m
proved small probes are fast in clean sessions while the real program
is always ~5 ms/trip.  So the flip lives between "2-D probe in a
counted while" and the full search body - but it must be re-located
with a fast fingerprint gating the run.

  n0  2-D probe (append_base + canonical_hash32 + lookup32), counted
      while, tiny carry              [r4j v0 - slow-session value 3067]
  n1  n0 + data-dependent cond (done-mask)
  n2  n1 + dense carried state updated per trip: [B,112] pool one-hot
      write + [B,16] heap pass + os extract (the search-body pattern)
  n3  n2 restructured: data-dep OUTER while over a counted INNER
      lax.scan of 8 trips (early exit at chunk granularity) - if the
      data-dep while is the serializer, this recovers the fast path
      at <=8 wasted trips per lane
  n4  n2 with u64 ecp-like carry ([B] u64 updated per trip) - the real
      body carries st_ecp u64; 64-bit ops were once suspected
  If everything above is fast: n5 = n2 + H_SLICE heap sift chain +
  4-candidate push select (closer to the real body mass).

Abort (record + skip) if the fingerprint says slow session.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4n_results.json"


def log(msg):
    sys.stderr.write(f"[r4n @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


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
    U64 = jnp.uint64
    rng = np.random.default_rng(29)
    Sc = 1 << CB
    lo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 17, Sc, dtype=np.uint32))
    x0 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x1 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x2 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x3 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    cbsel = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))
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

    def case(name, f, *args):
        try:
            t = time.time()
            jf = jax.jit(f)
            r = jf(*args)
            jax.block_until_ready(r)
            cs = round(time.time() - t, 1)
            dt = timeit(jf, *args)
        except Exception as e:
            RESULTS[name + "_error"] = repr(e)[:160]
            log(f"{name:10s}: ERROR {e!r}")
            save()
            return None
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        log(f"{name:10s}: {dt*1e6:9.2f} us/iter (compile {cs}s)")
        save()
        return dt

    # fingerprint
    S = 1 << 21
    tabf = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    idxf = jnp.asarray(rng.integers(0, S, 65536, dtype=np.uint32))

    def fp(tab, idx):
        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(lambda c: c[0] < I32(ITER), body,
                                  (I32(0), U32(0)))[1]

    dt = case("fingerprint", fp, tabf, idxf)
    RESULTS["session"] = "fast" if dt and dt * 1e6 < 50 else "slow"
    log(f"SESSION: {RESULTS['session']}")
    if RESULTS["session"] != "fast":
        log("slow session - bisection void; exiting")
        save()
        return 1

    def probe(zx0, i, salt):
        s = (i.astype(U32) * U32(PRIME) + U32(salt)) & kmask
        zx = (zx0 ^ s) & kmask
        bb = jnp.broadcast_to(jnp.arange(4, dtype=I32)[None, :], (B, 4))
        nx = kops.append_base(zx[:, None], x1[:, None],
                              x2[:, None], x3[:, None], bb, K)
        h0, h1 = kops.canonical_hash32(*nx, K)
        return spec.cuckoo_lookup32(spec.CuckooTable(lo=lo, hi=hi),
                                    h0, h1, K, CB)  # [B,4] i32

    # n0: counted while, tiny carry
    def n0(x0):
        def body(c):
            i, acc = c
            occ = probe(x0, i, 0xA0)
            return i + I32(1), acc + occ.sum(dtype=I32)

        return jax.lax.while_loop(lambda c: c[0] < I32(ITER), body,
                                  (I32(0), I32(0)))[1]

    case("n0_counted", n0, x0)

    # n1: data-dependent cond
    def n1(x0):
        def cond(c):
            return ~jnp.all(c[2])

        def body(c):
            i, acc, done = c
            occ = probe(x0, i, 0xB1)
            done = done | (i >= I32(ITER - 1))
            return i + I32(1), acc + occ.sum(dtype=I32), done

        return jax.lax.while_loop(
            cond, body, (I32(0), I32(0), jnp.zeros((B,), bool)))[1]

    case("n1_datadep", n1, x0)

    # n2: + dense carried state per trip
    def dense_step(i, occ, meta, hp, stn):
        oh = jnp.arange(4, dtype=I32)[None, :] == cbsel[:, None]
        os_ = jnp.max(jnp.where(oh, occ + 1, 0), axis=1) - 1
        rel = jnp.arange(112, dtype=I32)[None, :] - stn[:, None]
        vals = occ + (i << 8)
        for t in range(4):
            m = (rel == t) & (os_ > -2)[:, None]
            meta = jnp.where(m, vals[:, t][:, None], meta)
        hp = jnp.where(jnp.arange(16, dtype=I32)[None, :] == (i & 15),
                       os_[:, None], hp)
        return os_, meta, hp, (stn + 1) % I32(100)

    def n2(x0):
        def cond(c):
            return ~jnp.all(c[2])

        def body(c):
            i, acc, done, meta, hp, stn = c
            occ = probe(x0, i, 0xC2)
            os_, meta, hp, stn = dense_step(i, occ, meta, hp, stn)
            done = done | (i >= I32(ITER - 1))
            return (i + I32(1), acc + os_.sum(dtype=I32), done,
                    meta, hp, stn)

        return jax.lax.while_loop(
            cond, body,
            (I32(0), I32(0), jnp.zeros((B,), bool),
             jnp.zeros((B, 112), I32), jnp.zeros((B, 16), I32),
             jnp.zeros((B,), I32)))[1]

    case("n2_dense", n2, x0)

    # n3: data-dep outer while over counted inner scan of 8
    def n3(x0):
        CH = 8

        def cond(c):
            return ~jnp.all(c[2])

        def outer(c):
            def inner(carry, _):
                i, acc, done, meta, hp, stn = carry
                occ = probe(x0, i, 0xD3)
                os_, meta, hp, stn = dense_step(i, occ, meta, hp, stn)
                done = done | (i >= I32(ITER - 1))
                return (i + I32(1), acc + os_.sum(dtype=I32), done,
                        meta, hp, stn), None

            c2, _ = jax.lax.scan(inner, c, None, length=CH)
            return c2

        return jax.lax.while_loop(
            cond, outer,
            (I32(0), I32(0), jnp.zeros((B,), bool),
             jnp.zeros((B, 112), I32), jnp.zeros((B, 16), I32),
             jnp.zeros((B,), I32)))[1]

    case("n3_scan8", n3, x0)

    # n4: n2 + u64 carry updated per trip
    def n4(x0):
        def cond(c):
            return ~jnp.all(c[2])

        def body(c):
            i, acc, done, meta, hp, stn, ecp = c
            occ = probe(x0, i, 0xE4)
            os_, meta, hp, stn = dense_step(i, occ, meta, hp, stn)
            ecp = (ecp << U64(9)) | (os_.astype(U64) & U64(511))
            done = done | (i >= I32(ITER - 1))
            return (i + I32(1), acc + os_.sum(dtype=I32), done,
                    meta, hp, stn, ecp)

        return jax.lax.while_loop(
            cond, body,
            (I32(0), I32(0), jnp.zeros((B,), bool),
             jnp.zeros((B, 112), I32), jnp.zeros((B, 16), I32),
             jnp.zeros((B,), I32), jnp.zeros((B,), U64)))[1]

    case("n4_u64carry", n4, x0)

    # n5: n2 + a [B,256] u64 pool + [B,256] i32 pool written per trip
    # (the real body's st_ecp/st_meta scale) + 4 sequential heap-sift-ish
    # passes (fusion pressure closest to the real body)
    def n5(x0):
        def cond(c):
            return ~jnp.all(c[2])

        def body(c):
            i, acc, done, meta, hp, stn, ecp_pool = c
            occ = probe(x0, i, 0xF5)
            os_, meta2, hp, stn = dense_step(
                i, occ, meta[:, :112], hp, stn)
            meta = meta.at[:, :112].set(meta2)
            rel = jnp.arange(256, dtype=I32)[None, :] - stn[:, None]
            ecp_pool = jnp.where(
                (rel == 0), (os_.astype(U64))[:, None], ecp_pool)
            for t in range(4):
                v = jnp.max(jnp.where(
                    jnp.arange(16, dtype=I32)[None, :] == ((i + t) & 15),
                    hp, 0), axis=1)
                hp = jnp.where(
                    jnp.arange(16, dtype=I32)[None, :] == ((i + t + 1) & 15),
                    v[:, None], hp)
            done = done | (i >= I32(ITER - 1))
            return (i + I32(1), acc + os_.sum(dtype=I32), done,
                    meta, hp, stn, ecp_pool)

        return jax.lax.while_loop(
            cond, body,
            (I32(0), I32(0), jnp.zeros((B,), bool),
             jnp.zeros((B, 256), I32), jnp.zeros((B, 16), I32),
             jnp.zeros((B,), I32), jnp.zeros((B, 256), U64)))[1]

    case("n5_pools", n5, x0)

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
