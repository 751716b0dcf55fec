"""One TPU session: the official bench at several correction batch sizes.

Per-iteration search cost has a large fixed component (probe4: ~2.2ms
per gather op, ~0.6ms per loop iteration) that amortizes over the
batch, so larger batches should raise throughput until the dense-pass
slope dominates.  Runs bench.main() at BENCH_BATCH in {8192, 16384,
32768} inside one process (one TPU claim; in-process jit caches make
the repeated counting pass cheap).

    python scripts/tpu_bench_batches.py [batches...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bench


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [8192, 16384, 32768]
    for b in sizes:
        os.environ["BENCH_BATCH"] = str(b)
        print(f"\n==== bench BENCH_BATCH={b} ====", flush=True)
        t0 = time.time()
        try:
            bench.main()
        except Exception:
            import traceback

            traceback.print_exc(limit=6)
        print(f"[session] batch {b} done in {time.time()-t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
