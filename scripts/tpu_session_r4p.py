"""Round-4 TPU session 15 (r4o): starve scoped VMEM on the REAL program.

Model from the r4i-r4n evidence + scheduled-HLO reading: the TPU
gather lowering STAGES the table planes into VMEM scratch inside the
loop (async slice-start x4 per plane + ConcatBitcast).  Small loop
bodies let the pipeliner overlap the staging (probes measure ~1 us);
the real search body cannot, so every trip pays ~16 MB of staging at
DMA rate ~= the whole 2.8 ms/trip probe cost.  Tables too big to
stage (c_bits >= 24 in the small probes) measured FAST and
size-independent - the direct-HBM gather path is good.  Therefore:
compile the real program with xla_tpu_scoped_vmem_limit_kib starved
so the staging is impossible, and the probe gathers should go
HBM-direct.

Arms (each a fresh big compile through the _core_call AOT hook):
  o1  starve 4096 KiB
  o2  starve 1024 KiB   (if o1 helps or is ambiguous)
  o3  control: default   (in-session baseline)
Each: sc{1,16,64} sweep -> fixed + ms/trip; correct_many on the best.
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
OUT = "/root/repo/scripts/r4p_results.json"
DUMP = "/root/repo/scripts/r4_table.dump"


def log(msg):
    sys.stderr.write(f"[r4p @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    U32, I32 = jnp.uint32, jnp.int32
    PRIME = 2654435761
    rng = np.random.default_rng(31)

    # fingerprint
    S = 1 << 21
    tabf = jnp.asarray(rng.integers(0, 2**31, S, dtype=np.uint32))
    idxf = jnp.asarray(rng.integers(0, S, 65536, dtype=np.uint32))

    @jax.jit
    def fp(tab, idx):
        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(PRIME)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(lambda c: c[0] < I32(64), body,
                                  (I32(0), U32(0)))[1]

    jax.block_until_ready(fp(tabf, idxf))
    t = time.time()
    for _ in range(4):
        r = fp(tabf, idxf)
    jax.block_until_ready(r)
    fpu = (time.time() - t) / 4 / 64 * 1e6
    RESULTS["fingerprint_us"] = round(fpu, 2)
    RESULTS["session"] = "fast" if fpu < 50 else "slow"
    log(f"fingerprint {fpu:.2f} us/iter -> {RESULTS['session']}")
    save()

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
    ds = C.restore_spectrum(DUMP)

    def measure(tag, opts_val):
        if opts_val:
            os.environ["BFC_TPU_COMPILER_OPTIONS"] = opts_val
        else:
            os.environ.pop("BFC_TPU_COMPILER_OPTIONS", None)
        try:
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

    o1 = measure("starve12m", "xla_tpu_scoped_vmem_limit_kib=12288")
    o2 = measure("starve8m", "xla_tpu_scoped_vmem_limit_kib=8192") \
        if (o1 is None or "starve12m_error" in RESULTS) else None
    o3 = measure("raise96m", "xla_tpu_scoped_vmem_limit_kib=98304")
    o4 = measure("control", "")

    # correct_many on best two arms, env set to match the arm
    arms = []
    for tag, corr, envv in (
        ("starve12m", o1, "xla_tpu_scoped_vmem_limit_kib=12288"),
        ("starve8m", o2, "xla_tpu_scoped_vmem_limit_kib=8192"),
        ("raise96m", o3, "xla_tpu_scoped_vmem_limit_kib=98304"),
        ("control", o4, ""),
    ):
        if corr is not None and f"{tag}_ms_per_trip" in RESULTS:
            arms.append((RESULTS[f"{tag}_ms_per_trip"], tag, corr, envv))
    arms.sort()
    for _, tag, corr, envv in arms[:2]:
        if envv:
            os.environ["BFC_TPU_COMPILER_OPTIONS"] = envv
        else:
            os.environ.pop("BFC_TPU_COMPILER_OPTIONS", None)
        corr._soft_cap = 64
        for rep in range(2):
            t = time.time()
            res = corr.correct_many(mat[:n_use], qmat[:n_use],
                                    np.full((n_use,), rlen, np.int32),
                                    np.ones((n_use,), bool), reads_txt,
                                    batch, bucketed=True, as_arrays=True)
            dt = time.time() - t
            RESULTS[f"{tag}_cm_rps_rep{rep}"] = round(n_use / dt, 1)
            log(f"{tag} correct_many rep{rep}: {n_use/dt:.0f} r/s ({dt:.1f}s)")
            assert res is not None and res.n == n_use
        save()

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
