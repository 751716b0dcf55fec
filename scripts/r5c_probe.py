"""Round-5 session C: new counting path on-chip + gather-defer mock.

1. counting at the new defaults: asymmetric top merges (no spill at
   bench scale) + device finalize (no tunnel pull).  Expect CuckooTable
   from cuckoo_build_device and a tail of pure device work.
2. the deferred-consume experiment: the round-4 finding is that the
   search body's probe gathers serialize (~2.8 ms/trip) while identical
   gathers in SMALL bodies run ~1 us.  Hypothesis (r4g): a gather whose
   result feeds the body's big dense chain is fused into a serial
   loop-fusion; a gather whose result only enters the while CARRY
   (consumed next iteration) stays a standalone fast op.  The mock
   mimics the real body's shapes: [16k,16] heap passes + [16k,256]
   pool passes + 4x16k-lane 2-plane probes, in three variants:
     now      - probe consumed in-iteration (today's structure)
     defer    - probe issued this iteration, consumed next (carry)
     tiny     - probe + sum only (the known-fast control)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RES = {}


def log(msg):
    sys.stderr.write(f"[r5c {time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def fingerprints():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    U32, I32 = jnp.uint32, jnp.int32
    S = 1 << 21
    tab = jnp.zeros((S,), U32)
    idx = jnp.asarray(rng.integers(0, S, 65536).astype(np.uint32))

    @jax.jit
    def f(tab, idx):
        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(2654435761)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(lambda c: c[0] < I32(64), body,
                                  (I32(0), U32(0)))[1]

    jax.block_until_ready(f(tab, idx))
    t = time.time()
    for _ in range(4):
        r = f(tab, idx)
    jax.block_until_ready(r)
    RES["gather_us"] = round((time.time() - t) / 4 / 64 * 1e6, 2)
    log(f"gather fingerprint {RES['gather_us']} us/iter")


def mock_experiment():
    import jax
    import jax.numpy as jnp

    U32, I32 = jnp.uint32, jnp.int32
    B = 16384
    H, S = 16, 256
    CB = 21
    TS = 1 << CB
    rng = np.random.default_rng(3)
    lo0 = jnp.asarray(rng.integers(0, 1 << 32, TS, dtype=np.uint64).astype(np.uint32))
    hi0 = jnp.asarray(rng.integers(0, 1 << 32, TS, dtype=np.uint64).astype(np.uint32))
    hp0 = jnp.asarray(rng.integers(0, 1 << 30, (B, H)).astype(np.int32))
    pool0 = jnp.asarray(rng.integers(0, 1 << 30, (B, S)).astype(np.int32))

    def probe(hp, i):
        # 4 candidate slots per lane from the current heap root (mimics
        # the dependency: indices derive from this trip's pop)
        root = jax.lax.bitcast_convert_type(hp[:, 0], U32)
        cand = root[:, None] * U32(2654435761) + jnp.arange(
            4, dtype=U32)[None, :] * U32(0x9E3779B9) + i.astype(U32)
        ix = (cand & U32(TS - 1)).reshape(-1)
        return lo0[ix].reshape(B, 4), hi0[ix].reshape(B, 4)

    def dense(hp, pool, occ, i):
        # ~the real body's dense budget: a few [B,16] heap passes and
        # [B,256] pool passes, all consuming occ
        o = (occ[0] & U32(0xFF)).astype(I32) + (occ[1] >> U32(24)).astype(I32)
        best = jnp.argmin(jnp.where(o > 0, o, 1 << 20), axis=1).astype(I32)
        v = jnp.min(o, axis=1)
        for t in range(4):  # heap-ish sift passes
            cols = jnp.arange(H, dtype=I32)[None, :]
            m = cols == ((best[:, None] + t) & (H - 1))
            hp = jnp.where(m, hp + v[:, None], hp)
        rel = jnp.arange(S, dtype=I32)[None, :]
        st_n = (hp[:, 1] & (S - 1))
        for t in range(4):  # pool write passes
            m = rel == ((st_n[:, None] + t) & (S - 1))
            pool = jnp.where(m, pool ^ (v + t)[:, None], pool)
        red = jnp.sum(jnp.where(rel < (st_n[:, None] & 63), pool, 0),
                      axis=1, dtype=I32)
        hp = hp.at[:, 2].set(hp[:, 2] ^ red)
        return hp, pool

    def make(kind):
        @jax.jit
        def run(lo, hi, hp, pool):
            pend = (jnp.zeros((B, 4), U32), jnp.zeros((B, 4), U32))

            def body(c):
                i, hp, pool, pend = c
                if kind == "now":
                    occ = probe(hp, i)
                    hp, pool = dense(hp, pool, occ, i)
                elif kind == "defer":
                    hp, pool = dense(hp, pool, pend, i)
                    pend = probe(hp, i)
                else:  # tiny: dense chain without probe + carried sum
                    hp, pool = dense(hp, pool, pend, i)
                return i + I32(1), hp, pool, pend

            out = jax.lax.while_loop(lambda c: c[0] < I32(64), body,
                                     (I32(0), hp, pool, pend))
            return out[1][:, :3], out[2][:, :2]

        return run

    for kind in ("now", "defer", "tiny"):
        f = make(kind)
        t0 = time.time()
        r = f(lo0, hi0, hp0, pool0)
        jax.block_until_ready(r)
        compile_s = time.time() - t0
        t = time.time()
        for _ in range(4):
            r = f(lo0, hi0, hp0, pool0)
        jax.block_until_ready(r)
        us = (time.time() - t) / 4 / 64 * 1e6
        RES[f"mock_{kind}_us_per_trip"] = round(us, 1)
        log(f"mock {kind}: {us:.1f} us/trip (first call {compile_s:.1f}s)")


def counting():
    import tempfile

    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    rng = np.random.default_rng(1234)
    glen, cov, rlen = 500_000, 60, 100
    n_reads = glen * cov // rlen
    gcodes = rng.integers(0, 4, glen).astype(np.uint8)
    seg, n_rep = 2000, int(glen * 0.1) // 2000
    for _ in range(n_rep):
        src = int(rng.integers(0, glen - seg))
        dst = int(rng.integers(0, glen - seg))
        gcodes[dst : dst + seg] = gcodes[src : src + seg]
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4, mat).astype(np.uint8)
    qmat = np.where(err, 33 + 2 + rng.integers(0, 13, mat.shape),
                    33 + 30 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    tdir = tempfile.mkdtemp(prefix="r5c_")
    fq = os.path.join(tdir, "r5c.fq")
    with open(fq, "wb") as f:
        for i in range(n_reads):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, bc[mat[i]].tobytes(), qmat[i].tobytes()))
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, glen.bit_length() + 7)
    t0 = time.time()
    C.count_file_device(fq, opt, batch_reads=16384)
    C.await_merge_ladder()
    C.count_file_device(fq, opt, batch_reads=16384)
    log(f"counting warm-up {time.time()-t0:.1f}s tail {C.TAIL_TIMINGS}")
    t0 = time.time()
    ds = C.count_file_device(fq, opt, batch_reads=16384)
    dt = time.time() - t0
    RES["count_s"] = round(dt, 2)
    RES["count_rps"] = round(n_reads / dt, 1)
    RES["count_tail"] = dict(C.TAIL_TIMINGS)
    RES["count_table"] = type(ds.table).__name__
    RES["count_c_bits"] = ds.s_bits
    RES["count_n"] = ds.n_entries
    log(f"counting timed {dt:.1f}s = {n_reads/dt:.0f} r/s "
        f"tail {C.TAIL_TIMINGS} table {type(ds.table).__name__} "
        f"c_bits {ds.s_bits}")


def main():
    fingerprints()
    counting()
    mock_experiment()
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5c_results.json")
    with open(out, "w") as f:
        json.dump(RES, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
