"""Round-3 TPU session 3: per-batch fixed-cost decomposition (kcov /
greedy / search gathers), heap-split validation, soft-stack size A/B.

ONE process, serial measurements (CLAUDE.md TPU rules).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r3c @{time.time()-T0:.0f}s] {msg}\n")
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
    tdir = tempfile.mkdtemp(prefix="bfc_r3b_")
    fq_warm = os.path.join(tdir, "w.fq")
    fq_main = os.path.join(tdir, "m.fq")
    for path, hi in ((fq_warm, cbatch), (fq_main, n_use)):
        with open(path, "wb") as f:
            for i in range(hi):
                f.write(b"@r%d\n%s\n+\n%s\n"
                        % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    log(f"data ready: {n_use} reads")

    t = time.time()
    C.count_file_device(fq_warm, opt, batch_reads=cbatch)
    C.await_merge_ladder()
    RESULTS["count_warmup_s"] = round(time.time() - t, 1)
    log(f"count warm-up {RESULTS['count_warmup_s']}s")

    t = time.time()
    ds = C.count_file_device(fq_main, opt, batch_reads=cbatch)
    RESULTS["count"] = {"s": round(time.time() - t, 1),
                        "tail": dict(C.TAIL_TIMINGS)}
    log(f"count: {RESULTS['count']}")

    lens_all = np.full((n_use,), rlen, np.int32)
    has_q = np.ones((n_use,), bool)

    def run_corr(name, env=None, iter_cap=1024, timing=False):
        env = env or {}
        saved = {}
        for kk, vv in env.items():
            saved[kk] = os.environ.get(kk)
            os.environ[kk] = vv
        try:
            corr = DC.Corrector(opt, ds, iter_cap=iter_cap)
            t = time.time()
            corr.prewarm(batch, read_len=rlen)
            compile_s = round(time.time() - t, 1)
            if timing:
                os.environ["BFC_TPU_TIMING"] = "1"
                os.environ["BFC_TPU_SEARCH_STATS"] = "1"
            t = time.time()
            res = corr.correct_many(mat[:n_use], qmat[:n_use], lens_all,
                                    has_q, lambda i: reads[i], batch,
                                    as_arrays=True)
            dt = time.time() - t
            if timing:
                os.environ.pop("BFC_TPU_TIMING", None)
                os.environ.pop("BFC_TPU_SEARCH_STATS", None)
            n_done = res.n if not isinstance(res, list) else len(res)
            assert n_done == n_use
            RESULTS[name] = {"compile_s": compile_s, "s": round(dt, 1),
                             "rps": round(n_use / dt)}
            log(f"{name}: {RESULTS[name]}")
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv

    def run_dev(name, env=None, iter_cap=1024, nb=6):
        """Device-dispatch-level timing (soft pass, no host finalize):
        safe for measurement-only configs whose outputs are garbage."""
        env = env or {}
        saved = {}
        for kk, vv in env.items():
            saved[kk] = os.environ.get(kk)
            os.environ[kk] = vv
        try:
            import jax

            corr = DC.Corrector(opt, ds, iter_cap=iter_cap)
            t = time.time()
            ctx = corr.dispatch_arrays(mat[:batch], qmat[:batch],
                                       lens_all[:batch], has_q[:batch],
                                       lambda i: reads[i], soft=True)
            jax.block_until_ready(ctx["out"]["final_b"])
            compile_s = round(time.time() - t, 1)
            t = time.time()
            for j in range(nb):
                sel = slice(j * batch, (j + 1) * batch)
                ctx = corr.dispatch_arrays(mat[sel], qmat[sel],
                                           lens_all[:batch], has_q[:batch],
                                           lambda i: reads[i], soft=True)
                jax.block_until_ready(ctx["out"]["final_b"])
            dt = time.time() - t
            RESULTS[name] = {"compile_s": compile_s, "s": round(dt, 2),
                             "rps": round(nb * batch / dt),
                             "trips": int(np.asarray(
                                 ctx["out"]["it"]).reshape(-1)[0])}
            log(f"{name}: {RESULTS[name]}")
        finally:
            for kk, vv in saved.items():
                if vv is None:
                    os.environ.pop(kk, None)
                else:
                    os.environ[kk] = vv

    # heap-split build: headline full run + dispatch-level baseline
    run_corr("v2_clean")
    run_dev("v2_dev")
    # fixed-cost decomposition (measurement-only variants, garbage output)
    run_dev("no_greedy", env={"BFC_TPU_PROBE_NO_GREEDY": "1"}, iter_cap=1022)
    run_dev("no_ann_occ", env={"BFC_TPU_PROBE_NO_ANN_OCC": "1",
                               "BFC_TPU_PROBE_NO_GREEDY": "1"}, iter_cap=1021)
    run_dev("no_all", env={"BFC_TPU_PROBE_NO_ANN_OCC": "1",
                           "BFC_TPU_PROBE_NO_GREEDY": "1",
                           "BFC_TPU_PROBE_NO_OCC": "1"}, iter_cap=1020)
    # smaller soft stack pool: halves the [B,S] pool-write traffic
    run_corr("v2_stack128", env={"BFC_TPU_SOFT_STACK": "128"})

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
