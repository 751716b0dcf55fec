"""bfc-tpu: a TPU-native Illumina read error-correction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of lh3/bfc
(reference mounted read-only at /root/reference): two-pass k-mer
spectrum error correction (blocked-Bloom + count-hash spectrum build,
then a penalty-minimizing best-first per-read search), k-mer trimming,
spectrum dump/restore, refine mode, and a drop-in compatible CLI.

Instead of pthreads over spin-locked shared tables, the engine runs
reads in lockstep batches per chip, builds the spectrum with sort-based
exact counting (replicating the reference's sequential insert-order
semantics, including Bloom false-positive promotion), and scales over a
device mesh by hash-prefix sharding with all-to-all k-mer shuffles.
"""

import os as _os

# glibc malloc tuning, applied before numpy/jax allocate anything big:
# on this class of VM (Firecracker/uffd paging) a first-touch page
# fault costs ~100-300 us, and glibc's default mmap threshold makes
# every large numpy temporary a fresh mmap that is returned to the OS
# on free - so EVERY multi-MB host pass re-pays the fault storm.
# Keeping large blocks on the heap free list (huge mmap threshold,
# never trim) pays the faults once per process; measured 3-10x on the
# host finalize/merge passes (a 5M-row adjudicate: 25 s -> 4 s).
try:
    import ctypes as _ctypes

    _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
    _libc.mallopt(-3, 1 << 30)       # M_MMAP_THRESHOLD: 1 GiB
    _libc.mallopt(-1, 0x7FFFFFFF)    # M_TRIM_THRESHOLD: never trim
except Exception:  # non-glibc platform: harmless
    pass

import jax

# The k-mer/hash pipeline is 64-bit integer arithmetic end to end; the
# engine requires x64 (emulated as 32-bit pairs on TPU where needed; the
# Pallas hot kernels use explicit u32-pair arithmetic).
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU sort/search kernels are expensive to
# compile (tens of seconds to minutes); cache them across processes.
#
# History: disabled on axon through round 3 (2026-08-17 measured
# executable deserialization hanging minutes; 2026-08-19 re-probe had
# big entries at compile parity).  Round-4 measurement (r4o session,
# 2026-08-20) settles it the other way: the FULL search program -
# whose fresh compile costs 254-1218 s through the remote compile
# service - loads from a warm cache in 9.9 s including the first
# dispatch.  Cold-to-first-corrected-read drops from ~280 s to ~10 s
# on any host that has run the same configuration before (the cache
# key covers program HLO + compile options).  Default ON everywhere;
# BFC_TPU_JAX_CACHE=dir overrides the location, BFC_TPU_JAX_CACHE=""
# (empty) disables.
# Scoped by platform: CPU AOT entries are ISA-specific and go into a
# host-keyed subdirectory (cross-host loads spew SIGILL-hazard feature
# warnings, MULTICHIP_r04); TPU entries are remote-compiled and
# host-independent, at the root.  Consumers that switch the platform
# AFTER import (tests' conftest, cli --cpu) re-apply the scope.
if _os.environ.get("BFC_TPU_JAX_CACHE", None) != "":
    from .utils.cache import apply_cache_dir as _apply_cache_dir

    _apply_cache_dir(_os.environ.get("JAX_PLATFORMS", ""))

from .opts import Opts  # noqa: E402,F401

__version__ = "0.1.0"
