"""Round-4 TPU session 13 (r4m): kill the 2.8 ms/trip probe-gather cost.

Facts: small programs gather at ~1 us/65536 in clean sessions; the
REAL search program serializes its probe gathers ALWAYS (r4l: 4.95
ms/trip in a fast-fingerprint session).  Two candidate mechanisms and
two candidate fixes, all decided here:

  1. VMEM theory test (cheap): AOT-compile the small fast probe with
     xla_tpu_scoped_vmem_limit_kib=1024 (starved).  If it serializes,
     the fast gather lowering is VMEM-budget-gated - and raising the
     limit on the big program becomes the fix candidate.
  2. Real program, interleaved-pair probes (BFC_TPU_PAIR_PROBE=1):
     each probe = ONE slice-2 row gather instead of two -> halves the
     serialized cost if it is per-index.
  3. Real program, default planes + compiler_options raising
     xla_tpu_scoped_vmem_limit_kib (BFC_TPU_COMPILER_OPTIONS hook) -
     only if (1) confirms.

Each real variant: compile, warm, sc{1,16,64} sweep -> ms/trip, and
correct_many for whatever wins.  BFC_TPU_JAX_CACHE should be set so
the compiles also populate the persistent cache for the cold-start
session (r4h).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import bfc_tpu  # noqa: F401

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4m_results.json"
DUMP = "/root/repo/scripts/r4_table.dump"


def log(msg):
    sys.stderr.write(f"[r4m @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    U32 = jnp.uint32
    I32 = jnp.int32
    PRIME = 2654435761
    rng = np.random.default_rng(23)
    ITER = 64

    def timeit(fn, *args, reps=6, kw=None):
        kw = kw or {}
        r = fn(*args, **kw)
        jax.block_until_ready(r)
        t = time.time()
        for _ in range(reps):
            r = fn(*args, **kw)
        jax.block_until_ready(r)
        return (time.time() - t) / reps / ITER

    # ---- 1. fingerprint + VMEM starvation test on the small probe
    S = 1 << 21
    tab = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, S, 65536, dtype=np.uint32))

    def fp(tab, idx):
        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(lambda c: c[0] < I32(ITER), body,
                                  (I32(0), U32(0)))[1]

    dt = timeit(jax.jit(fp), tab, idx)
    RESULTS["fingerprint_us"] = round(dt * 1e6, 2)
    RESULTS["session"] = "fast" if dt * 1e6 < 50 else "slow"
    log(f"fingerprint: {dt*1e6:.2f} us/iter -> {RESULTS['session']} session")
    save()

    vmem_gated = None
    for kib, tag in ((1024, "starved"), (65536, "raised")):
        try:
            comp = jax.jit(fp).lower(tab, idx).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
            dt = timeit(comp, tab, idx)
            RESULTS[f"fp_vmem{kib}_us"] = round(dt * 1e6, 2)
            log(f"small probe @scoped_vmem={kib}KiB: {dt*1e6:.2f} us/iter")
        except Exception as e:
            RESULTS[f"fp_vmem{kib}_error"] = repr(e)[:160]
            log(f"small probe @vmem={kib}: ERROR {e!r}")
    if "fp_vmem1024_us" in RESULTS:
        vmem_gated = RESULTS["fp_vmem1024_us"] > 50 and \
            RESULTS["session"] == "fast"
        RESULTS["vmem_theory_confirmed"] = bool(vmem_gated)
        log(f"VMEM-budget theory: {'CONFIRMED' if vmem_gated else 'refuted'}")
    save()

    # ---- real program helpers
    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen, cov, rlen = 500_000, 60, 100
    rng2 = np.random.default_rng(1234)
    n_reads = glen * cov // rlen
    gcodes = rng2.integers(0, 4, glen).astype(np.uint8)
    seg = 2000
    for _ in range(int(glen * 0.1) // seg):
        src = int(rng2.integers(0, glen - seg))
        dst = int(rng2.integers(0, glen - seg))
        gcodes[dst : dst + seg] = gcodes[src : src + seg]
    starts = rng2.integers(0, glen - rlen, n_reads)
    mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng2.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng2.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng2.integers(1, 4, mat.shape)) % 4,
                   mat).astype(np.uint8)
    qmat = np.where(err, 35 + rng2.integers(0, 13, mat.shape),
                    63 + rng2.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    batch = 8192
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, glen.bit_length() + 7)
    lens_all = np.full((batch,), rlen, np.int32)
    has_q = np.ones((batch,), bool)
    reads_txt = lambda i: (bc[mat[i]].tobytes().decode(),
                           qmat[i].tobytes().decode())
    n_use = n_reads // batch * batch

    def measure(tag, env=None):
        env = env or {}
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            ds = C.restore_spectrum(DUMP)
            corr = DC.Corrector(opt, ds)

            def dispatch(lo_, sc):
                corr._soft_cap = sc
                ctx = corr.dispatch_arrays(
                    mat[lo_:lo_ + batch], qmat[lo_:lo_ + batch],
                    lens_all, has_q, reads_txt, soft=True)
                jax.block_until_ready(ctx["out"]["packed_bq"])

            t = time.time()
            dispatch(0, 64)
            RESULTS[f"{tag}_compile_s"] = round(time.time() - t, 1)
            log(f"{tag}: compile+first {RESULTS[f'{tag}_compile_s']}s")
            dispatch(0, 64)
            for sc in (1, 16, 64):
                t = time.time()
                for j in range(4):
                    dispatch(j * batch, sc)
                dt = (time.time() - t) / 4
                RESULTS[f"{tag}_sc{sc}_s"] = round(dt, 3)
            slope = (RESULTS[f"{tag}_sc64_s"] - RESULTS[f"{tag}_sc1_s"]) / 63
            RESULTS[f"{tag}_ms_per_trip"] = round(slope * 1e3, 2)
            log(f"{tag}: fixed {RESULTS[f'{tag}_sc1_s']}s + "
                f"{slope*1e3:.2f} ms/trip")
            save()
            return corr
        except Exception as e:
            RESULTS[f"{tag}_error"] = repr(e)[:200]
            log(f"{tag}: ERROR {e!r}")
            save()
            return None
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # ---- 2. pair-probe program
    corr_pair = measure("pair", {"BFC_TPU_PAIR_PROBE": "1"})

    # ---- 3. raised-vmem program (only if theory confirmed)
    corr_vmem = None
    if vmem_gated:
        corr_vmem = measure("vmem96m", {
            "BFC_TPU_COMPILER_OPTIONS":
                "xla_tpu_scoped_vmem_limit_kib=98304"})

    # ---- 4. baseline planes (for in-session comparability)
    corr_base = measure("base")

    # ---- correct_many on the best variant
    cands = [(t, c) for t, c in (("pair", corr_pair), ("vmem96m", corr_vmem),
                                 ("base", corr_base))
             if c is not None and f"{t}_ms_per_trip" in RESULTS]
    cands.sort(key=lambda tc: RESULTS[f"{tc[0]}_ms_per_trip"])
    for t, c in cands[:2]:
        if t == "vmem96m":  # the AOT hook reads env at dispatch time
            os.environ["BFC_TPU_COMPILER_OPTIONS"] = \
                "xla_tpu_scoped_vmem_limit_kib=98304"
        else:
            os.environ.pop("BFC_TPU_COMPILER_OPTIONS", None)
        c._soft_cap = 64
        for rep in range(2):
            tt = time.time()
            res = c.correct_many(mat[:n_use], qmat[:n_use],
                                 np.full((n_use,), rlen, np.int32),
                                 np.ones((n_use,), bool), reads_txt,
                                 batch, bucketed=True, as_arrays=True)
            dt = time.time() - tt
            RESULTS[f"{t}_cm_rps_rep{rep}"] = round(n_use / dt, 1)
            log(f"{t} correct_many rep{rep}: {n_use/dt:.0f} r/s ({dt:.1f}s)")
            assert res is not None and res.n == n_use
        save()

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
