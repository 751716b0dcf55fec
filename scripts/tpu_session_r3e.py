"""Round-3 TPU session 5: correction batch-size A/B (8192 vs 16384
reads = 16k vs 32k fused lanes).  The per-batch fixed cost (~150 ms)
amortizes with batch size; round 2 saw a compile pathology at 32k
lanes - this measures whether the round-3 program (split heap, folded
ff, pooled greedy) survives it."""

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
    sys.stderr.write(f"[r3e @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def main() -> int:
    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen, cov, rlen, k = 500_000, 60, 100, 25
    cbatch = 16384
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
    tdir = tempfile.mkdtemp(prefix="bfc_r3e_")
    fq = os.path.join(tdir, "w.fq")
    with open(fq, "wb") as f:
        for i in range(cbatch):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    log("data ready")
    t = time.time()
    ds = C.count_file_device(fq, opt, batch_reads=cbatch)
    log(f"count warm-up {time.time()-t:.1f}s")

    for batch in (16384, 8192):
        n_use = n_reads // batch * batch
        lens_all = np.full((n_use,), rlen, np.int32)
        has_q = np.ones((n_use,), bool)
        corr = DC.Corrector(opt, ds)
        t = time.time()
        corr.prewarm(batch, read_len=rlen)
        compile_s = round(time.time() - t, 1)
        log(f"B{batch} compile {compile_s}s")
        t = time.time()
        res = corr.correct_many(mat[:n_use], qmat[:n_use], lens_all, has_q,
                                lambda i: reads[i], batch, as_arrays=True)
        dt = time.time() - t
        n_done = res.n if not isinstance(res, list) else len(res)
        assert n_done == n_use
        RESULTS[f"B{batch}"] = {"compile_s": compile_s, "s": round(dt, 1),
                                "rps": round(n_use / dt)}
        log(f"B{batch}: {RESULTS[f'B{batch}']}")
    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
