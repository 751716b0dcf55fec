"""One TPU session: fresh bench, then the capacity rehearsal.

    python scripts/tpu_session5.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("BFC_TPU_TIMING", "1")

import bench

print("==== bench (count-batch 16384, tail fixes) ====", flush=True)
bench.main()

print("\n==== capacity rehearsal: 20Mbp genome, 10M reads ====", flush=True)
from scripts import human_scale  # noqa: E402

t0 = time.time()
human_scale.main([
    "--genome", "20000000", "--reads", "10000000", "--k", "27",
    "--batch", "8192", "--correct-reads", "500000",
])
print(f"[session] rehearsal done in {time.time()-t0:.1f}s", flush=True)
