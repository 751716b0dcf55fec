"""Round-3 TPU measurement session (ONE process; see CLAUDE.md TPU rules).

Measures, serially on the real chip:
  1. counting (production native-reader path): stream rate + tail
     anatomy, eager-spill ON vs OFF;
  2. correction-program compile time with the parallel prewarm (the
     cold-start story number);
  3. corrected reads/s for the search variants:
       V1 ff_fold=1 ff_paths=1   (new default)
       V2 ff_fold=1 ff_paths=0
       V3 ff_fold=0              (round-2 structure)

Emits [r3] lines to stderr and a JSON summary at the end.
Run to completion; never kill mid-run (TPU claim leak).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}


def log(msg: str) -> None:
    sys.stderr.write(f"[r3 @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


T0 = time.time()


def main() -> int:
    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen = int(os.environ.get("BENCH_GENOME", 500_000))
    cov = int(os.environ.get("BENCH_COVERAGE", 60))
    rlen = 100
    k = 25
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    cbatch = int(os.environ.get("BENCH_COUNT_BATCH", 16384))

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
    n_use = max(n_reads // batch * batch, min(n_reads, batch))
    log(f"data ready: {n_use} reads")

    tdir = tempfile.mkdtemp(prefix="bfc_r3_")
    fq_warm = os.path.join(tdir, "warm.fq")
    fq_main = os.path.join(tdir, "main.fq")

    def write_fastq(path, lo, hi):
        with open(path, "wb") as f:
            for i in range(lo, hi):
                f.write(b"@r%d\n%s\n+\n%s\n"
                        % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))

    write_fastq(fq_warm, 0, min(cbatch, n_use))
    write_fastq(fq_main, 0, n_use)

    # ---- phase 1: counting warm-up (compiles + ladder)
    t = time.time()
    C.count_file_device(fq_warm, opt, batch_reads=cbatch)
    C.await_merge_ladder()
    RESULTS["count_warmup_s"] = round(time.time() - t, 1)
    log(f"counting warm-up {RESULTS['count_warmup_s']}s")

    # ---- phase 2/3: timed counting, eager spill on/off
    for eager in ("1", "0"):
        os.environ["BFC_TPU_EAGER_SPILL"] = eager
        t = time.time()
        ds = C.count_file_device(fq_main, opt, batch_reads=cbatch)
        dt = time.time() - t
        key = f"count_eager{eager}"
        RESULTS[key] = {
            "s": round(dt, 1), "reads_per_s": round(n_use / dt),
            "tail": dict(C.TAIL_TIMINGS), "distinct": ds.n_entries,
        }
        log(f"{key}: {RESULTS[key]}")
    os.environ["BFC_TPU_EAGER_SPILL"] = "1"

    lens_all = np.full((n_use,), rlen, np.int32)
    has_q = np.ones((n_use,), bool)

    # ---- phase 4/5: correction variants (compile, then timed run)
    variants = [
        ("v1_fold_paths", {"BFC_TPU_FF_FOLD": "1", "BFC_TPU_FF_PATHS": "1"}),
        ("v2_fold_only", {"BFC_TPU_FF_FOLD": "1", "BFC_TPU_FF_PATHS": "0"}),
        ("v3_prestep", {"BFC_TPU_FF_FOLD": "0", "BFC_TPU_FF_PATHS": "0"}),
    ]
    if os.environ.get("R3_VARIANTS"):
        keep = set(os.environ["R3_VARIANTS"].split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, env in variants:
        os.environ.update(env)
        corr = DC.Corrector(opt, ds)
        t = time.time()
        corr.prewarm(batch, read_len=rlen)
        compile_s = round(time.time() - t, 1)
        t = time.time()
        res = corr.correct_many(
            mat[:n_use], qmat[:n_use], lens_all, has_q,
            lambda i: reads[i], batch, as_arrays=True,
        )
        dt = time.time() - t
        n_done = len(res) if isinstance(res, list) else res.n
        assert n_done == n_use
        RESULTS[name] = {
            "compile_s": compile_s, "s": round(dt, 1),
            "reads_per_s": round(n_use / dt),
        }
        log(f"{name}: {RESULTS[name]}")

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
