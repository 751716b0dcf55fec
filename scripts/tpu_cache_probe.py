"""Persistent-compile-cache probe on the axon TPU (startup story).

Round-2 measurement: executable DESERIALIZATION on this backend hangs
(13 KB loads in 19 ms; 220 KB blocks > 5 min) - so the cache is
disabled on axon (bfc_tpu/__init__.py).  This probe re-tests with the
current jax, with heartbeat prints so a hang is observable and the
driver can see HOW far it got.

Run TWICE (serially, per CLAUDE.md TPU rules):
    BFC_TPU_JAX_CACHE=/root/repo/.cache/jax_cache_tpu \
        timeout 1200 python scripts/tpu_cache_probe.py write
    BFC_TPU_JAX_CACHE=/root/repo/.cache/jax_cache_tpu \
        timeout 1200 python scripts/tpu_cache_probe.py read

The probe compiles three programs of increasing size (elementwise
chain, a radix-sort pass, a small lockstep search) and times each
compile; on the "read" pass the times are cache-hit times.
"""

from __future__ import annotations

import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def hb(tag):
    """Heartbeat so a hang is visible + attributable in the log."""
    stop = threading.Event()

    def run():
        t0 = time.time()
        while not stop.wait(15):
            print(f"[cache-probe] ...{tag} still running "
                  f"({time.time()-t0:.0f}s)", flush=True)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return stop


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "write"
    import os

    assert os.environ.get("BFC_TPU_JAX_CACHE"), "set BFC_TPU_JAX_CACHE"
    import bfc_tpu  # noqa: F401  (applies the cache config)
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"[cache-probe] mode={mode} backend={jax.default_backend()} "
          f"cache={os.environ['BFC_TPU_JAX_CACHE']}", flush=True)

    # 1. small elementwise chain
    def f1(x):
        for _ in range(32):
            x = x * 3 + 1
        return x

    s = hb("f1")
    t0 = time.time()
    jax.jit(f1)(jnp.arange(1 << 16, dtype=jnp.uint32)).block_until_ready()
    s.set()
    print(f"[cache-probe] f1 (elementwise): {time.time()-t0:.2f}s", flush=True)

    # 2. the engine's radix-pass sort shape
    from bfc_tpu.ops import spectrum as spec

    s = hb("sort")
    t0 = time.time()
    k = jnp.asarray(np.random.default_rng(0).integers(
        0, 1 << 32, 1 << 20, dtype=np.uint64).astype(np.uint32))
    jax.jit(lambda a: spec.stable_order(a))(k).block_until_ready()
    s.set()
    print(f"[cache-probe] radix pass: {time.time()-t0:.2f}s", flush=True)

    # 3. a small lockstep search program (the expensive class)
    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 20000).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    for i in range(512):
        p = int(rng.integers(0, 20000 - 80))
        reads.append((bc[g[p:p + 80]].tobytes().decode(), "I" * 80))
    opt = Opts()
    opt.k = 19
    opt.bf_shift = 22
    ds = C.count_stream(iter(reads), opt, batch_reads=512)
    corr = DC.Corrector(opt, ds)
    s = hb("search-compile")
    t0 = time.time()
    corr.correct_batch([r[0] for r in reads[:256]],
                       [r[1] for r in reads[:256]])
    s.set()
    print(f"[cache-probe] search program (B=256): {time.time()-t0:.2f}s",
          flush=True)
    print("[cache-probe] DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
