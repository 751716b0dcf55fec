"""Benchmark: corrected reads/s per chip on a synthetic E. coli-like dataset.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: reference bfc -t16 on NA12878 human reads sustains
~42k corrected reads/s on a 20-core E5-2660 (BASELINE.md).

Environment knobs:
  BENCH_GENOME   genome length  [500000]
  BENCH_COVERAGE fold coverage  [100]
  BENCH_READLEN  read length    [100]
  BENCH_K        k-mer length   [25]
  BENCH_BATCH    correction batch size [4096]
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_READS_PER_S = 42_000.0


def main() -> int:
    import random

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen = int(os.environ.get("BENCH_GENOME", 500_000))
    cov = int(os.environ.get("BENCH_COVERAGE", 100))
    rlen = int(os.environ.get("BENCH_READLEN", 100))
    k = int(os.environ.get("BENCH_K", 25))
    batch = int(os.environ.get("BENCH_BATCH", 4096))

    rng = random.Random(1234)
    sys.stderr.write(f"[bench] generating genome={glen} cov={cov}x len={rlen}\n")
    genome = "".join(rng.choice("ACGT") for _ in range(glen))
    n_reads = glen * cov // rlen
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for _ in range(n_reads):
        p = rng.randrange(0, glen - rlen)
        frag = genome[p : p + rlen]
        if rng.random() < 0.5:
            frag = "".join(comp[c] for c in reversed(frag))
        s = list(frag)
        q = []
        for i in range(rlen):
            if rng.random() < 0.01:
                s[i] = rng.choice([b for b in "ACGT" if b != s[i]])
                q.append(chr(33 + rng.randrange(2, 15)))
            else:
                q.append(chr(33 + 30 + rng.randrange(0, 10)))
        reads.append(("".join(s), "".join(q)))

    opt = Opts()
    opt.k = k
    opt.bf_shift = max(20, glen.bit_length() + 7)

    t0 = time.time()
    ds = C.count_stream(iter(reads), opt, batch_reads=8192)
    t_count = time.time() - t0
    sys.stderr.write(
        f"[bench] counting: {t_count:.1f}s, {ds.n_entries} distinct k-mers\n"
    )

    corr = DC.Corrector(opt, ds)
    # warm up / compile on the first batch shape
    seqs = [r[0] for r in reads]
    quals = [r[1] for r in reads]
    corr.correct_batch(seqs[:batch], quals[:batch])
    t0 = time.time()
    n_done = 0
    n_fallback = 0
    for off in range(0, len(reads), batch):
        chunk_s = seqs[off : off + batch]
        chunk_q = quals[off : off + batch]
        res = corr.correct_batch(chunk_s, chunk_q)
        n_done += len(res)
    t_corr = time.time() - t0
    rps = n_done / t_corr
    sys.stderr.write(
        f"[bench] correction: {n_done} reads in {t_corr:.1f}s = {rps:.0f} reads/s\n"
    )
    print(json.dumps({
        "metric": "corrected_reads_per_s_per_chip",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
