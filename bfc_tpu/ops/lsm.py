"""Shared LSM counting tree: device binary counter + host spill.

Both counting paths - the single-device AggBuilder and the
hash-prefix-sharded mesh path - fold read-chunk runs through a
log-depth binary counter of DEVICE merges and spill COMPLETE
contiguous stream spans to a HOST binary counter whenever a device
merge would exceed device memory (the merge callback signals that by
returning None).  Span order is load-bearing: the reference's
first-occurrence semantics resolve ties by stream position, so host
pushes must arrive oldest-span-first - draining the device counter
completely on spill guarantees every host push is the next contiguous
span.

The reference sizes everything for tables that fit one node's RAM
(htab.c:28-33); this tree is the TPU-native answer to HBM being an
order of magnitude smaller than that.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from ..utils.log import log


class LsmTree:
    """merge(older, newer) -> run | None (None = would exceed the device
    cap: the tree spills); to_host(run) -> HostAgg; host_merge(older,
    newer) -> HostAgg.  async_spill runs to_host+host_merge on a single
    ordered worker thread (numpy releases the GIL) - only safe when
    to_host contains no collectives."""

    def __init__(self, merge: Callable, to_host: Callable,
                 host_merge: Callable, async_spill: bool = False,
                 name: str = "LsmTree"):
        self.merge = merge
        self.to_host = to_host
        self.host_merge = host_merge
        self.async_spill = async_spill
        self.name = name
        self.levels: List = []       # device binary counter
        self.host_levels: List = []  # host binary counter (HostAggs)
        self._q = None
        self._thread = None
        self._err: Optional[BaseException] = None

    # -- host counter -----------------------------------------------------

    def _host_push(self, ha) -> None:
        i = 0
        while i < len(self.host_levels) and self.host_levels[i] is not None:
            ha = self.host_merge(self.host_levels[i], ha)  # older first
            self.host_levels[i] = None
            i += 1
        if i == len(self.host_levels):
            self.host_levels.append(None)
        self.host_levels[i] = ha

    # -- async spill worker ----------------------------------------------

    def _worker(self) -> None:
        # deprioritize: on this host every axon device dispatch rides a
        # local terminal process, so host CPU contention from the spill
        # merges directly slows the DEVICE stream (measured ~3-8x on
        # batch cadence).  A niced worker only uses cycles the stream
        # leaves idle; the final drain runs with the device idle anyway.
        try:
            import os
            import threading

            os.setpriority(os.PRIO_PROCESS, threading.get_native_id(), 15)
        except Exception:
            pass
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            try:
                self._host_push(self.to_host(item))
            except BaseException as e:  # surfaced by push()/finish()
                self._err = e
            finally:
                self._q.task_done()

    def _spill_item(self, run) -> None:
        if not self.async_spill:
            self._host_push(self.to_host(run))
            return
        import queue
        import threading

        if self._q is None:
            self._q = queue.Queue(maxsize=2)
            self._thread = threading.Thread(
                target=self._worker, daemon=True, name="bfc-lsm-spill"
            )
            self._thread.start()
        self._q.put(run)

    def _drain(self) -> None:
        if self._q is not None:
            self._q.join()
            self._q.put(None)  # shut the worker down (no leaked thread)
            self._thread.join()
            self._q = None
            self._thread = None
        if self._err is not None:
            raise self._err

    def _spill_all(self, run) -> None:
        import time

        t0 = time.time()
        for j in range(len(self.levels) - 1, -1, -1):  # oldest span first
            if self.levels[j] is not None:
                self._spill_item(self.levels[j])
                self.levels[j] = None
        if run is not None:
            self._spill_item(run)
        log(f"spilled device counter to host in {time.time()-t0:.1f}s",
            func=self.name)

    # -- public ------------------------------------------------------------

    def push(self, run) -> None:
        """Fold the newest run into the counter (stream order)."""
        if self._err is not None:  # fail fast, not hours later at finish
            raise self._err
        i = 0
        while i < len(self.levels) and self.levels[i] is not None:
            merged = self.merge(self.levels[i], run)  # older first
            if merged is None:
                # levels[i] not yet cleared: _spill_all drains it (and
                # everything older) before the newer run
                self._spill_all(run)
                return
            self.levels[i] = None
            run = merged
            i += 1
        if i == len(self.levels):
            self.levels.append(None)
        self.levels[i] = run

    def finish(self):
        """Drain everything -> (device_run | None, host_agg | None);
        at most one is non-None."""
        import time

        t0 = time.time()
        self._drain()
        t_drain = time.time() - t0
        acc = None
        for lvl in reversed(self.levels):  # oldest (highest level) first
            if lvl is None:
                continue
            if acc is None:
                acc = lvl
                continue
            merged = self.merge(acc, lvl)
            if merged is None:
                self._host_push(self.to_host(acc))  # acc = older span
                acc = lvl
            else:
                acc = merged
        self.levels = []
        has_host = any(x is not None for x in self.host_levels)
        if has_host and acc is not None:
            self._host_push(self.to_host(acc))
            acc = None
        t1 = time.time()
        hacc = None
        for ha in reversed(self.host_levels):  # oldest first
            if ha is None:
                continue
            hacc = ha if hacc is None else self.host_merge(hacc, ha)
        self.host_levels = []
        if has_host:
            log(f"finish: drain {t_drain:.1f}s, device spill "
                f"{t1 - t0 - t_drain:.1f}s, host chain {time.time() - t1:.1f}s",
                func=self.name)
        return acc, hacc
