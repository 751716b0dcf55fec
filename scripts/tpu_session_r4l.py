"""Round-4 TPU session 12 (r4l): serialized-gather cost vs slice size.

Context: the parallel gather path appears/disappears per SESSION
(r4i fast, r4j/r4k slow on identical code).  Whichever side the
lottery lands, the product needs the best worst-case: if the serial
gather loop costs per INDEX rather than per element, storing the
lo/hi planes interleaved (entry i at plane[2i], plane[2i+1]) fetches
both words with ONE gather of slice 2 - halving worst-case probe cost
- and a 2-hash x 4-slot bucketized layout would fetch a whole nest
with one slice-4 gather.

Cases (u32 operands, u32->i32 index chain, in-loop, 64 iters):
  g1   [65536] indices, slice 1   (the current probe unit cost)
  g2   [65536] indices, slice 2   (interleaved-pair candidate)
  g4   [65536] indices, slice 4   (bucket candidate)
  g8   [65536] indices, slice 8
  pair [65536] indices: gather slice 2 + split + match (the real
       interleaved lookup shape)
First: a 5 s session fingerprint (r4i's base case) so every result is
labeled fast-session or slow-session.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4l_results.json"


def log(msg):
    sys.stderr.write(f"[r4l @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


NQ = 65536
ITER = 64
CB = 21


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    U32 = jnp.uint32
    I32 = jnp.int32
    rng = np.random.default_rng(19)
    S = 1 << CB
    tab = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    tab2 = jnp.asarray(rng.integers(0, 2**31, 2 * S, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
    PRIME = 2654435761

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
            log(f"{name:12s}: ERROR {e!r}")
            save()
            return
        RESULTS[name + "_us"] = round(dt * 1e6, 2)
        RESULTS[name + "_compile_s"] = cs
        log(f"{name:12s}: {dt*1e6:9.2f} us/iter (compile {cs}s)")
        save()

    # fingerprint: r4i base form
    def fp(tab, idx):
        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME) + U32(0xA1)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    case("fingerprint", fp, tab, idx)
    RESULTS["session"] = (
        "fast" if RESULTS["fingerprint_us"] < 50 else "slow")
    log(f"SESSION: {RESULTS['session']}")

    # slice-size sweep via vmap'd dynamic_slice (lowers to gather slice w)
    def mk_slice(w, salt):
        rows = 2 * S // w

        def f(tab2, idx):
            tw = tab2.reshape(rows, w)

            def cond(c):
                return c[0] < I32(ITER)

            def body(c):
                i, acc = c
                ix = (idx + i.astype(U32) * U32(PRIME) + U32(salt)) \
                    & U32(rows - 1)
                v = tw[ix]  # [NQ, w] row gather (slice_sizes={1,w})
                return i + I32(1), acc + v.sum(dtype=U32)

            return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

        return f

    for w in (1, 2, 4, 8):
        case(f"g{w}_slice", mk_slice(w, 0xB0 + w), tab2, idx)

    # the real interleaved-pair lookup shape: slice-2 gather + match
    def pair(tab2, idx):
        ql = idx * U32(PRIME)

        def cond(c):
            return c[0] < I32(ITER)

        def body(c):
            i, acc = c
            s1 = (idx + i.astype(U32) * U32(PRIME) + U32(0xC9)) & U32(S - 1)
            alt = (ql * U32(0x9E3779B9)) >> U32(32 - CB)
            s2 = s1 ^ alt

            tw = tab2.reshape(S, 2)
            e1 = tw[s1]  # [NQ,2] lo,hi (one slice-2 row gather)
            e2 = tw[s2]

            def match(e, nest):
                el, eh = e[:, 0], e[:, 1]
                q_lo32 = (el >> U32(15)) | (eh << U32(17))
                return ((el & U32(0x3FFF)) != 0) \
                    & (((el >> U32(14)) & U32(1)) == U32(nest)) \
                    & (q_lo32 == ql)

            v1 = e1[:, 0] & U32(0x3FFF)
            v2 = e2[:, 0] & U32(0x3FFF)
            occ = jnp.where(match(e1, 0), v1,
                            jnp.where(match(e2, 1), v2, U32(0)))
            return i + I32(1), acc + occ.sum(dtype=U32)

        return jax.lax.while_loop(cond, body, (I32(0), U32(0)))[1]

    case("pair_lookup", pair, tab2, idx)

    # ---- the REAL search program in THIS session: does a clean (fast-
    # fingerprint) session make correct_core's probe gathers parallel,
    # or do big programs serialize regardless (VMEM pressure)?
    import os

    DUMP = "/root/repo/scripts/r4_table.dump"
    if os.path.exists(DUMP):
        from bfc_tpu.models import corrector as DC
        from bfc_tpu.models import counter as C
        from bfc_tpu.opts import Opts

        glen, cov, rlen = 500_000, 60, 100
        rng2 = np.random.default_rng(1234)
        n_reads = glen * cov // rlen
        gcodes = rng2.integers(0, 4, glen).astype(np.uint8)
        seg = 2000
        for _ in range(int(glen * 0.1) // seg):
            src = int(rng2.integers(0, glen - seg))
            dst = int(rng2.integers(0, glen - seg))
            gcodes[dst : dst + seg] = gcodes[src : src + seg]
        starts = rng2.integers(0, glen - rlen, n_reads)
        mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
        rc = rng2.random(n_reads) < 0.5
        mat[rc] = 3 - mat[rc, ::-1]
        err = rng2.random((n_reads, rlen)) < 0.01
        mat = np.where(err, (mat + rng2.integers(1, 4, mat.shape)) % 4,
                       mat).astype(np.uint8)
        qmat = np.where(err, 35 + rng2.integers(0, 13, mat.shape),
                        63 + rng2.integers(0, 10, mat.shape)).astype(np.uint8)
        bc = np.frombuffer(b"ACGT", np.uint8)
        batch = 8192
        opt = Opts()
        opt.k = 25
        opt.bf_shift = max(20, glen.bit_length() + 7)
        ds = C.restore_spectrum(DUMP)
        corr = DC.Corrector(opt, ds)
        lens_all = np.full((batch,), rlen, np.int32)
        has_q = np.ones((batch,), bool)
        reads_txt = lambda i: (bc[mat[i]].tobytes().decode(),
                               qmat[i].tobytes().decode())

        def dispatch(lo_, sc):
            corr._soft_cap = sc
            ctx = corr.dispatch_arrays(mat[lo_:lo_ + batch],
                                       qmat[lo_:lo_ + batch],
                                       lens_all, has_q, reads_txt, soft=True)
            jax.block_until_ready(ctx["out"]["packed_bq"])

        t = time.time()
        dispatch(0, 64)
        RESULTS["real_compile_s"] = round(time.time() - t, 1)
        log(f"real program compile+first: {RESULTS['real_compile_s']}s")
        dispatch(0, 64)  # warm
        for sc in (1, 16, 64):
            t = time.time()
            for j in range(4):
                dispatch(j * batch, sc)
            dt = (time.time() - t) / 4
            RESULTS[f"real_sc{sc}_s"] = round(dt, 3)
            log(f"real sc={sc}: {dt:.3f}s/batch")
        slope = (RESULTS["real_sc64_s"] - RESULTS["real_sc1_s"]) / 63
        RESULTS["real_ms_per_trip"] = round(slope * 1e3, 2)
        log(f"real: fixed {RESULTS['real_sc1_s']}s + {slope*1e3:.2f} ms/trip"
            f"  (session fingerprint: {RESULTS['session']})")
        # end-to-end for the ledger
        n_use = n_reads // batch * batch
        corr._soft_cap = 64
        for rep in range(2):
            t = time.time()
            res = corr.correct_many(mat[:n_use], qmat[:n_use],
                                    np.full((n_use,), rlen, np.int32),
                                    np.ones((n_use,), bool), reads_txt,
                                    batch, bucketed=True, as_arrays=True)
            dt = time.time() - t
            RESULTS[f"real_cm_rps_rep{rep}"] = round(n_use / dt, 1)
            log(f"real correct_many rep{rep}: {n_use/dt:.0f} r/s ({dt:.1f}s)")
            assert res is not None and res.n == n_use
        save()

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
