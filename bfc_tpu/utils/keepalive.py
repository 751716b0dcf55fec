"""Device keep-alive: prevent the idle-tunnel first-dispatch stall.

Measured on the axon-tunneled v5e (PLAN.md): after the device sits
idle for a few minutes (e.g. during the counting merge-ladder compiles
or a long host finalize), the FIRST execution afterwards stalls ~28 s.
A daemon thread that touches the device with a trivial executable
every ~90 s keeps the tunnel claim warm, so no production phase ever
pays the stall.  The ping is a scalar add (~sub-ms round trip) and is
dispatched from a separate thread, which is safe and invisible to the
pipeline's own dispatch stream.

No reference counterpart: bfc is a local binary (bfc.c:77); this is a
remote-accelerator concern only.  Disabled automatically on the CPU
backend (tests) and via BFC_TPU_KEEPALIVE=0.
"""

from __future__ import annotations

import os
import threading
import time

_lock = threading.Lock()
_thread = None
_stop = threading.Event()
_interval = 90.0


def _ping() -> None:
    import jax
    import jax.numpy as jnp

    jnp.add(jnp.uint32(1), jnp.uint32(1)).block_until_ready()


def _run() -> None:
    while not _stop.wait(_interval):
        try:
            _ping()
        except Exception:
            return  # backend torn down; never crash the pipeline


def start_keepalive(interval: float = 90.0) -> bool:
    """Start the keep-alive daemon (idempotent).  Returns True if live."""
    global _thread, _interval
    if os.environ.get("BFC_TPU_KEEPALIVE", "1") != "1":
        return False
    import jax

    if jax.default_backend() == "cpu":
        return False
    with _lock:
        _interval = interval
        if _thread is None or not _thread.is_alive():
            _stop.clear()
            _thread = threading.Thread(
                target=_run, daemon=True, name="bfc-keepalive"
            )
            _thread.start()
    return True


def stop_keepalive() -> None:
    with _lock:
        _stop.set()
