"""Round-4 TPU session 6: the real search program on the u32 probe path.

Everything before this measured microbenches; this session compiles the
actual production correction program (now with the all-32-bit
hash->slot->gather chain, spectrum.cuckoo_lookup32) and measures:
  1. soft-cap sweep: fixed/slope split of the per-batch device time
     (was ~150 ms + 4.8 ms/trip; the probe gathers were 2.8 ms of the
     4.8 and should now be ~microseconds)
  2. requeue fraction vs soft_cap (unchanged semantics sanity)
  3. a profiler trace of one sc=64 dispatch (where does the trip time
     go now?)
  4. the full correct_many window (the BENCH_r04 correction figure)
  5. counting pass timing through the production path (unchanged code,
     fresh tail anatomy)
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
    sys.stderr.write(f"[r4f @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def main() -> int:
    import numpy as np

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
    tdir = tempfile.mkdtemp(prefix="bfc_r4f_")
    fq_warm = os.path.join(tdir, "w.fq")
    fq_main = os.path.join(tdir, "main.fq")
    with open(fq_warm, "wb") as f:
        for i in range(cbatch):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    with open(fq_main, "wb") as f:
        for i in range(n_use):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    log(f"data ready: {n_use} reads")

    t = time.time()
    ds = C.count_file_device(fq_warm, opt, batch_reads=cbatch)
    C.await_merge_ladder()
    C.count_file_device(fq_main, opt, batch_reads=cbatch)  # first-touch pass
    log(f"count warm-up {time.time()-t:.1f}s (c_bits={ds.s_bits})")

    # timed counting pass (production path)
    t = time.time()
    ds = C.count_file_device(fq_main, opt, batch_reads=cbatch)
    t_count = time.time() - t
    RESULTS["count_s"] = round(t_count, 2)
    RESULTS["count_rps"] = round(n_use / t_count, 1)
    RESULTS["count_tail"] = dict(C.TAIL_TIMINGS)
    log(f"counting: {n_use} in {t_count:.1f}s = {n_use/t_count:.0f} r/s "
        f"tail {C.TAIL_TIMINGS}")

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

    for sc in (1, 8, 16, 32, 64):
        t = time.time()
        for j in range(4):
            dispatch(j * batch, sc)
        dt = (time.time() - t) / 4
        RESULTS[f"sc{sc}_s"] = round(dt, 3)
        log(f"soft_cap={sc}: {dt:.3f}s/batch")

    # requeue fraction at a couple of caps
    n_batches = n_use // batch
    for sc in (16, 32, 64):
        tot = 0
        t = time.time()
        for j in range(n_batches):
            ctx = dispatch(j * batch, sc)
            tot += int(np.asarray(ctx["out"]["overflow"][:batch]).sum())
        dt = time.time() - t
        RESULTS[f"requeue_frac_sc{sc}"] = round(tot / n_use, 4)
        RESULTS[f"window_s_sc{sc}"] = round(dt, 2)
        log(f"sc={sc}: requeue {tot}/{n_use} = {tot/n_use*100:.2f}%  "
            f"window {dt:.2f}s ({n_use/dt:.0f} r/s no-requeue)")

    # profiler trace of one sc=64 dispatch
    tr = os.path.join(tdir, "trace64")
    try:
        with jax.profiler.trace(tr):
            dispatch(0, 64)
        files = glob.glob(os.path.join(tr, "**", "*.trace.json.gz"),
                          recursive=True)
        if files:
            ev = json.loads(gzip.open(files[0]).read()).get("traceEvents", [])
            dur = {}
            for e in ev:
                if e.get("ph") == "X" and "dur" in e:
                    name = e.get("name", "?")[:70]
                    dur[name] = dur.get(name, 0) + e["dur"]
            top = sorted(dur.items(), key=lambda x: -x[1])[:30]
            RESULTS["trace_sc64_top_us"] = top
            log("--- trace sc=64 top ops:")
            for name, us in top[:22]:
                log(f"  {us/1e3:9.2f}ms  {name}")
    except Exception as e:
        log(f"profiler failed: {type(e).__name__}: {e}")

    # full production correction window (bucketed + requeue)
    for rep in range(2):
        t = time.time()
        corr._soft_cap = 64
        res = corr.correct_many(mat[:n_use], qmat[:n_use],
                                np.full((n_use,), rlen, np.int32),
                                np.ones((n_use,), bool),
                                lambda i: reads[i], batch, bucketed=True,
                                as_arrays=True)
        dt = time.time() - t
        RESULTS[f"correct_many_s_rep{rep}"] = round(dt, 2)
        RESULTS[f"correct_many_rps_rep{rep}"] = round(n_use / dt, 1)
        log(f"correct_many rep{rep}: {n_use} in {dt:.2f}s = {n_use/dt:.0f} r/s")
        assert res is not None and res.n == n_use

    print(json.dumps(RESULTS))
    with open("/root/repo/scripts/r4f_results.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
