"""Round-4 TPU session 10 (r4j, take 2): bisect the probe serializer.

Take-1 result: v0 - the real probe subgraph (append_base +
canonical_hash32 + cuckoo_lookup32 on [B,4] 2-D queries) in a counted
while - is ALREADY serialized at 3067 us/iter, while r4i's f-case
(same cuckoo_lookup32, 1-D pre-hashed queries) ran 0.7 us.  So the
trigger is inside {2-D query shape, append_base, canonical_hash32}.
This take isolates it:

  w_flat_hash : 1-D [65536] queries, canonical_hash32 + lookup32
  w_flat_app  : 1-D queries, append_base + canonical_hash32 + lookup32
  w_2d_nohash : 2-D [B,4] queries, x used directly as h0/h1
  w_2d_hash   : 2-D + canonical_hash32 (no append_base)
  w_2d_full   : 2-D + append_base + canonical_hash32  (v0 = slow ref)
  w_fix_flat  : w_2d_full but cuckoo_lookup32 FLATTENS queries to 1-D
                internally (the candidate product fix, via env knob)

then the data-dependent-cond + dense-carry contexts on the winning
form (to make sure the fix survives the full-body context), and HLO
dumps of one fast + one slow case.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4j_results.json"


def log(msg):
    sys.stderr.write(f"[r4j @{time.time()-T0:.0f}s] {msg}\n")
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
    rng = np.random.default_rng(13)
    Sc = 1 << CB
    lo = jnp.asarray(rng.integers(0, 2**31, Sc, dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 17, Sc, dtype=np.uint32))
    x0 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x1 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x2 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
    x3 = jnp.asarray(rng.integers(0, 1 << K, B).astype(np.uint32))
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

    def counted(body_of):
        def f(lo_, hi_, x0, x1, x2, x3):
            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, acc = c
                s = (i.astype(U32) * U32(PRIME) + U32(0xA0)) & kmask
                return i + I32(1), acc + body_of(
                    (x0 ^ s) & kmask, (x1 ^ s) & kmask, x2, x3)

            return jax.lax.while_loop(cond, body, (I32(0), I32(0)))[1]

        return f

    def case(name, body_of):
        f = counted(body_of)
        t = time.time()
        jf = jax.jit(f)
        r = jf(lo, hi, x0, x1, x2, x3)
        jax.block_until_ready(r)
        cs = round(time.time() - t, 1)
        dt = timeit(jf, lo, hi, x0, x1, x2, x3)
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        log(f"{name:14s}: {dt*1e6:9.2f} us/iter (compile {cs}s)")
        save()
        return f

    # 1-D, hash only
    def w_flat_hash(zx0, zx1, zx2, zx3):
        q0 = jnp.concatenate([zx0, zx1, zx2, zx3])
        q1 = jnp.concatenate([zx1, zx2, zx3, zx0])
        h0, h1 = kops.canonical_hash32(q0, q1, q1, q0, K)
        return lookup(h0, h1).sum(dtype=I32)

    case("w_flat_hash", w_flat_hash)

    # 1-D, append_base + hash (flattened BEFORE append)
    def w_flat_app(zx0, zx1, zx2, zx3):
        b4 = jnp.tile(jnp.arange(4, dtype=I32), B // 4)
        nx = kops.append_base(zx0, zx1, zx2, zx3, b4, K)
        h0, h1 = kops.canonical_hash32(*nx, K)
        # 16384 queries only; scale time mentally (1/4 the gathers)
        return lookup(h0, h1).sum(dtype=I32)

    case("w_flat_app", w_flat_app)

    # 2-D, no hash (x broadcast to [B,4], used directly as h0/h1)
    def w_2d_nohash(zx0, zx1, zx2, zx3):
        bb = jnp.arange(4, dtype=jnp.uint32)[None, :]
        h0 = (zx0[:, None] ^ bb) & kmask
        h1 = (zx1[:, None] ^ bb) & kmask
        return lookup(h0, h1).sum(dtype=I32)

    case("w_2d_nohash", w_2d_nohash)

    # 2-D + canonical_hash32 (no append_base)
    def w_2d_hash(zx0, zx1, zx2, zx3):
        bb = jnp.arange(4, dtype=jnp.uint32)[None, :]
        q0 = (zx0[:, None] ^ bb) & kmask
        q1 = (zx1[:, None] ^ bb) & kmask
        q2 = (zx2[:, None] ^ bb) & kmask
        q3 = (zx3[:, None] ^ bb) & kmask
        h0, h1 = kops.canonical_hash32(q0, q1, q2, q3, K)
        return lookup(h0, h1).sum(dtype=I32)

    case("w_2d_hash", w_2d_hash)

    # 2-D full (the slow v0 reference)
    def w_2d_full(zx0, zx1, zx2, zx3):
        bb = jnp.broadcast_to(jnp.arange(4, dtype=I32)[None, :], (B, 4))
        nx = kops.append_base(zx0[:, None], zx1[:, None],
                              zx2[:, None], zx3[:, None], bb, K)
        h0, h1 = kops.canonical_hash32(*nx, K)
        return lookup(h0, h1).sum(dtype=I32)

    fslow = case("w_2d_full", w_2d_full)

    # candidate fix: flatten inside the lookup
    def w_fix_flat(zx0, zx1, zx2, zx3):
        bb = jnp.broadcast_to(jnp.arange(4, dtype=I32)[None, :], (B, 4))
        nx = kops.append_base(zx0[:, None], zx1[:, None],
                              zx2[:, None], zx3[:, None], bb, K)
        h0, h1 = kops.canonical_hash32(*nx, K)
        occ = lookup(h0.reshape(-1), h1.reshape(-1)).reshape(B, 4)
        return occ.sum(dtype=I32)

    ffix = case("w_fix_flat", w_fix_flat)

    # fix under full-body pressure: data-dependent cond + dense carries
    def w_fix_ctx(lo_, hi_, x0, x1, x2, x3):
        done0 = jnp.zeros((B,), bool)
        meta0 = jnp.zeros((B, 112), I32)
        cb = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))

        def cond(c):
            return ~jnp.all(c[2])

        def body(c):
            i, acc, done, meta = c
            s = (i.astype(U32) * U32(PRIME) + U32(0xC7)) & kmask
            zx0 = (x0 ^ s) & kmask
            bb = jnp.broadcast_to(jnp.arange(4, dtype=I32)[None, :], (B, 4))
            nx = kops.append_base(zx0[:, None], x1[:, None],
                                  x2[:, None], x3[:, None], bb, K)
            h0, h1 = kops.canonical_hash32(*nx, K)
            occ = lookup(h0.reshape(-1), h1.reshape(-1)).reshape(B, 4)
            oh = jnp.arange(4, dtype=I32)[None, :] == cb[:, None]
            os = jnp.max(jnp.where(oh, occ + 1, 0), axis=1) - 1
            rel = jnp.arange(112, dtype=I32)[None, :] - (i % 100)
            meta = jnp.where((rel == 0) & (os > -2)[:, None],
                             os[:, None], meta)
            done = done | (i >= I32(ITER - 1))
            return i + I32(1), acc + os.sum(dtype=I32), done, meta

        return jax.lax.while_loop(
            cond, body, (I32(0), I32(0), done0, meta0))[1]

    t = time.time()
    jfx = jax.jit(w_fix_ctx)
    r = jfx(lo, hi, x0, x1, x2, x3)
    jax.block_until_ready(r)
    cs = round(time.time() - t, 1)
    dt = timeit(jfx, lo, hi, x0, x1, x2, x3)
    RESULTS["w_fix_ctx_us"] = round(dt * 1e6, 2)
    log(f"{'w_fix_ctx':14s}: {dt*1e6:9.2f} us/iter (compile {cs}s)")
    save()

    # HLO of slow vs fixed
    for tag, f in (("slow2d", counted(w_2d_full)),
                   ("fixflat", counted(w_fix_flat))):
        try:
            txt = jax.jit(f).lower(lo, hi, x0, x1, x2, x3).compile().as_text()
            p = f"/root/repo/scripts/r4j_hlo_{tag}.txt"
            with open(p, "w") as fh:
                fh.write(txt)
            n_fast = txt.count("AssumeGatherIndicesInBound")
            n_g = txt.count(" gather(")
            log(f"{tag}: HLO {len(txt)}B, gathers={n_g}, "
                f"AssumeInBound={n_fast} -> {p}")
            RESULTS[f"{tag}_gathers"] = n_g
            RESULTS[f"{tag}_assume_inbound"] = n_fast
        except Exception as e:
            log(f"{tag}: as_text failed {e!r}")
    save()
    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
