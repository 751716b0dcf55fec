"""Persistent-compile-cache directory scoping.

TPU executables are compiled by the axon remote-compile service and are
host-independent: they live at the cache root so warm entries survive
across sessions and hosts (a warm big-search entry loads in ~10 s vs a
254-1218 s fresh compile).

XLA:CPU AOT executables are NOT host-independent - the cache entry
records the compile machine's ISA features, and loading it on a
different host spews "could lead to SIGILL" feature-mismatch warnings
(observed in MULTICHIP_r04 after the cache went default-on).  CPU runs
therefore get a subdirectory keyed by a hash of the local CPU feature
flags, so an entry is only ever reloaded on an ISA-identical host.
"""

from __future__ import annotations

import os


def _host_isa_tag() -> str:
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except Exception:
        flags = platform.machine() or "unknown"
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def scoped_cache_dir(platform_str: str, base: str | None = None) -> str:
    """Cache directory for the given jax platform ("cpu", "axon", ...)."""
    if base is None:
        base = os.environ.get("BFC_TPU_JAX_CACHE") or os.path.join(
            os.path.dirname(__file__), "..", "..", ".cache", "jax_cache"
        )
    base = os.path.abspath(base)
    if "cpu" in (platform_str or ""):
        return os.path.join(base, f"cpu-{_host_isa_tag()}")
    return base


def apply_cache_dir(platform_str: str) -> None:
    """Point jax's persistent cache at the scope for platform_str.

    Virtual-mesh CPU runs (xla_force_host_platform_device_count set:
    the multi-chip dryrun and the test suite) get NO persistent cache:
    XLA:CPU AOT entries embed compile-preference pseudo-features
    (+prefer-no-scatter/-gather) that the loader compares against real
    host CPU flags, spewing SIGILL-hazard warnings even for same-host
    reloads - and CPU compiles are cheap enough that correctness of
    the log wins (MULTICHIP_r04 noise; VERDICT r4 #9)."""
    if os.environ.get("BFC_TPU_JAX_CACHE", None) == "":
        return  # explicitly disabled
    import jax

    try:
        if ("cpu" in (platform_str or "")
                and "xla_force_host_platform_device_count"
                in os.environ.get("XLA_FLAGS", "")):
            jax.config.update("jax_compilation_cache_dir", None)
            return
        jax.config.update(
            "jax_compilation_cache_dir", scoped_cache_dir(platform_str)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # older jax without the knobs: harmless
        pass
