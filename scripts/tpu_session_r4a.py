"""Round-4 TPU session 1: measurement only (no product changes).

Questions answered on the real chip:
  1. Gather cost vs table size (u32 element gathers, 64k indices,
     2^20..2^28 words): explains the big-table 3x correction slowdown.
  2. Layout A/Bs at the real probe shape: planar-2-plane vs manually
     interleaved [lo,hi] pairs vs u64-emulated vs 2-D row gather vs
     3-op split probe (2 tag gathers + 1 dependent verify gather).
  3. Per-batch fixed/slope split of the current search (soft_cap is a
     traced scalar: one program) + requeue fraction vs soft_cap (the
     read-level trip-count tail, for the early-exit ladder design).
  4. Profiler trace of a sc=1 dispatch: exact anatomy of the ~150 ms
     per-batch fixed cost.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r4a @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def microbench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    U32 = jnp.uint32
    NQ = 65536            # real probe width: 16384 lanes x 4 candidates
    PRIME = np.uint32(2654435761)

    def timeit(fn, *args, reps=8):
        r = fn(*args)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        return (time.time() - t) / reps

    rng = np.random.default_rng(7)

    # ---- 1. element-gather cost vs array size (one plane, one gather op)
    ITER = 32

    @jax.jit
    def g_elem(tab, idx):
        S = tab.shape[0]

        def body(i, acc):
            ix = (idx + i.astype(jnp.uint32) * PRIME) & jnp.uint32(S - 1)
            return acc + tab[ix].astype(jnp.uint32).sum()

        return jax.lax.fori_loop(0, ITER, body, jnp.uint32(0))

    sizes = {}
    for lg in (20, 22, 24, 26, 28):
        S = 1 << lg
        tab = jnp.asarray(rng.integers(0, 2**32, S, dtype=np.uint32))
        idx = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
        dt = timeit(g_elem, tab, idx) / ITER
        sizes[lg] = round(dt * 1e6, 1)
        log(f"elem gather u32[2^{lg}] x{NQ}: {dt*1e6:.1f} us "
            f"({dt/NQ*1e9:.2f} ns/elem)")
        del tab
    RESULTS["gather_us_by_log2size"] = sizes

    # ---- 2. probe-layout A/B at the real shape (S = 2^21 and 2^26)
    def mk_layouts(lg):
        S = 1 << lg
        lo = jnp.asarray(rng.integers(0, 2**32, S, dtype=np.uint32))
        hi = jnp.asarray(rng.integers(0, 2**32, S, dtype=np.uint32))
        inter = jnp.stack([lo, hi], axis=1).reshape(-1)  # [2S] pairs
        u64t = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
        s1 = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
        s2 = jnp.asarray(rng.integers(0, S, NQ, dtype=np.uint32))
        return S, lo, hi, inter, u64t, s1, s2

    def rot(s, i, S):
        return (s + i.astype(jnp.uint32) * PRIME) & jnp.uint32(S - 1)

    def mk_probe(kind, S):
        def body_of(tabs, s1, s2):
            def body(i, acc):
                a = rot(s1, i, S)
                b = rot(s2, i, S)
                if kind == "planar4":        # current: 4 independent gathers
                    lo, hi = tabs
                    v = lo[a] + hi[a] + lo[b] + hi[b]
                elif kind == "inter4":       # interleaved pairs, 4 gathers
                    (t,) = tabs
                    v = t[2 * a] + t[2 * a + 1] + t[2 * b] + t[2 * b + 1]
                elif kind == "u64emul":      # u64 array (XLA 2-plane emul)
                    (t,) = tabs
                    e1 = t[a]
                    e2 = t[b]
                    v = (e1 + e2).astype(jnp.uint32) + (
                        (e1 >> jnp.uint64(32)).astype(jnp.uint32))
                elif kind == "split3":       # 2 tag gathers + 1 dependent
                    lo, hi = tabs
                    t1 = lo[a]
                    t2 = lo[b]
                    sv = jnp.where((t1 & 1) == 1, a, b)
                    v = t1 + t2 + hi[sv]
                elif kind == "split3i":      # interleaved split: t[2s],t[2sv+1]
                    (t,) = tabs
                    t1 = t[2 * a]
                    t2 = t[2 * b]
                    sv = jnp.where((t1 & 1) == 1, a, b)
                    v = t1 + t2 + t[2 * sv + 1]
                elif kind == "row2d":        # [S,2] dynamic row gather
                    (t2d,) = tabs
                    r1 = t2d[a]
                    r2 = t2d[b]
                    v = r1[:, 0] + r1[:, 1] + r2[:, 0] + r2[:, 1]
                elif kind == "single2":      # floor: 2 gathers (1 per slot)
                    lo, hi = tabs
                    v = lo[a] + lo[b]
                else:
                    raise ValueError(kind)
                return acc + v.astype(jnp.uint32).sum()

            return jax.lax.fori_loop(0, ITER, body, jnp.uint32(0))

        return jax.jit(body_of)

    for lg in (21, 26):
        S, lo, hi, inter, u64t, s1, s2 = mk_layouts(lg)
        t2d = inter.reshape(S, 2)
        cases = {
            "planar4": (lo, hi),
            "inter4": (inter,),
            "u64emul": (u64t,),
            "split3": (lo, hi),
            "split3i": (inter,),
            "row2d": (t2d,),
            "single2": (lo, hi),
        }
        out = {}
        for kind, tabs in cases.items():
            try:
                dt = timeit(mk_probe(kind, S), tabs, s1, s2) / ITER
                out[kind] = round(dt * 1e6, 1)
                log(f"S=2^{lg} {kind:8s}: {dt*1e6:8.1f} us/trip-equiv")
            except Exception as e:
                out[kind] = f"FAIL {type(e).__name__}"
                log(f"S=2^{lg} {kind}: FAILED {e}")
        RESULTS[f"probe_layouts_2p{lg}_us"] = out
        del lo, hi, inter, u64t, t2d, cases


def main() -> int:
    import numpy as np

    log("=== microbenches ===")
    microbench()

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen, cov, rlen, k = 500_000, 60, 100, 25
    batch, cbatch = 8192, 16384
    rng = np.random.default_rng(1234)
    n_reads = glen * cov // rlen
    gcodes = rng.integers(0, 4, glen).astype(np.uint8)
    seg = 2000
    for _ in range(int(glen * 0.1) // seg):
        src = int(rng.integers(0, glen - seg))
        dst = int(rng.integers(0, glen - seg))
        gcodes[dst : dst + seg] = gcodes[src : src + seg]
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4, mat).astype(np.uint8)
    qmat = np.where(err, 35 + rng.integers(0, 13, mat.shape),
                    63 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    seq_bytes = bc[mat]
    reads = [(seq_bytes[i].tobytes().decode(), qmat[i].tobytes().decode())
             for i in range(n_reads)]
    opt = Opts()
    opt.k = k
    opt.bf_shift = max(20, glen.bit_length() + 7)
    n_use = n_reads // batch * batch
    tdir = tempfile.mkdtemp(prefix="bfc_r4a_")
    fq_warm = os.path.join(tdir, "w.fq")
    with open(fq_warm, "wb") as f:
        for i in range(cbatch):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    log(f"data ready: {n_use} reads")

    t = time.time()
    ds = C.count_file_device(fq_warm, opt, batch_reads=cbatch)
    C.await_merge_ladder()
    log(f"count warm-up {time.time()-t:.1f}s (c_bits={ds.s_bits})")
    RESULTS["c_bits"] = ds.s_bits

    import jax

    corr = DC.Corrector(opt, ds)
    lens_all = np.full((batch,), rlen, np.int32)
    has_q = np.ones((batch,), bool)

    def dispatch(lo, sc):
        corr._soft_cap = sc
        ctx = corr.dispatch_arrays(mat[lo:lo + batch], qmat[lo:lo + batch],
                                   lens_all, has_q, lambda i: reads[i],
                                   soft=True)
        jax.block_until_ready(ctx["out"]["packed_bq"])
        return ctx

    t = time.time()
    dispatch(0, 64)
    RESULTS["search_compile_s"] = round(time.time() - t, 1)
    log(f"search compile {time.time()-t:.1f}s")

    # fixed/slope on one program
    for sc in (1, 8, 16, 32, 64):
        t = time.time()
        for j in range(4):
            dispatch(j * batch, sc)
        dt = (time.time() - t) / 4
        RESULTS[f"sc{sc}_s"] = round(dt, 3)
        log(f"soft_cap={sc}: {dt:.3f}s/batch")

    # requeue fraction vs soft_cap over many batches (read trip tail):
    # overflow lanes at cap sc = reads needing > sc trips
    n_batches = n_use // batch
    for sc in (12, 16, 24, 32, 48, 64):
        tot = 0
        t = time.time()
        for j in range(n_batches):
            ctx = dispatch(j * batch, sc)
            tot += int(np.asarray(ctx["out"]["overflow"][:batch]).sum())
        dt = time.time() - t
        frac = tot / n_use
        RESULTS[f"requeue_frac_sc{sc}"] = round(frac, 4)
        RESULTS[f"window_s_sc{sc}"] = round(dt, 2)
        log(f"sc={sc}: requeue {tot}/{n_use} = {frac*100:.2f}%  "
            f"window {dt:.2f}s ({n_use/dt:.0f} r/s no-requeue)")

    # NOTE: batches here are NOT difficulty-bucketed (raw order), unlike
    # correct_many; fractions are stream-representative anyway.

    # profiler traces: sc=1 (fixed anatomy) and sc=64
    for sc in (1, 64):
        tr = os.path.join(tdir, f"trace{sc}")
        try:
            with jax.profiler.trace(tr):
                dispatch(0, sc)
            files = glob.glob(os.path.join(tr, "**", "*.trace.json.gz"),
                              recursive=True)
            if files:
                ev = json.loads(gzip.open(files[0]).read()).get(
                    "traceEvents", [])
                dur = {}
                for e in ev:
                    if e.get("ph") == "X" and "dur" in e:
                        name = e.get("name", "?")[:70]
                        dur[name] = dur.get(name, 0) + e["dur"]
                top = sorted(dur.items(), key=lambda x: -x[1])[:30]
                RESULTS[f"trace_sc{sc}_top_us"] = top
                log(f"--- trace sc={sc} top ops:")
                for name, us in top[:20]:
                    log(f"  {us/1e3:9.2f}ms  {name}")
        except Exception as e:
            log(f"profiler sc={sc} failed: {type(e).__name__}: {e}")

    # full production-path correction baseline (bucketed, requeue active)
    t = time.time()
    corr._soft_cap = 64
    res = corr.correct_many(mat[:n_use], qmat[:n_use],
                            np.full((n_use,), rlen, np.int32),
                            np.ones((n_use,), bool),
                            lambda i: reads[i], batch, bucketed=True,
                            as_arrays=True)
    dt = time.time() - t
    RESULTS["baseline_correct_s"] = round(dt, 2)
    RESULTS["baseline_correct_rps"] = round(n_use / dt, 1)
    log(f"baseline correct_many: {n_use} in {dt:.2f}s = {n_use/dt:.0f} r/s")

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4a_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
