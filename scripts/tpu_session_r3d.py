"""Round-3 TPU session 4: exact fixed/slope split via the traced
soft_cap (one program, no recompiles), a jax profiler trace of one
dispatch (op-level breakdown from the perfetto JSON), and
cost_analysis of the search executable.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
T0 = time.time()


def log(msg):
    sys.stderr.write(f"[r3d @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def main() -> int:
    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    glen, cov, rlen, k = 500_000, 60, 100, 25
    batch, cbatch = 8192, 16384
    rng = np.random.default_rng(1234)
    n_reads = glen * cov // rlen
    gcodes = rng.integers(0, 4, glen).astype(np.uint8)
    seg = 2000
    for _ in range(int(glen * 0.1) // seg):
        src = int(rng.integers(0, glen - seg))
        dst = int(rng.integers(0, glen - seg))
        gcodes[dst : dst + seg] = gcodes[src : src + seg]
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4, mat).astype(np.uint8)
    qmat = np.where(err, 35 + rng.integers(0, 13, mat.shape),
                    63 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    seq_bytes = bc[mat]
    reads = [(seq_bytes[i].tobytes().decode(), qmat[i].tobytes().decode())
             for i in range(n_reads)]
    opt = Opts()
    opt.k = k
    opt.bf_shift = max(20, glen.bit_length() + 7)
    n_use = n_reads // batch * batch
    tdir = tempfile.mkdtemp(prefix="bfc_r3d_")
    fq_warm = os.path.join(tdir, "w.fq")
    with open(fq_warm, "wb") as f:
        for i in range(cbatch):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, seq_bytes[i].tobytes(), qmat[i].tobytes()))
    log(f"data ready: {n_use} reads")

    t = time.time()
    ds = C.count_file_device(fq_warm, opt, batch_reads=cbatch)
    C.await_merge_ladder()
    log(f"count warm-up {time.time()-t:.1f}s")

    import jax

    corr = DC.Corrector(opt, ds)
    lens_all = np.full((batch,), rlen, np.int32)
    has_q = np.ones((batch,), bool)

    def dispatch(lo, sc):
        corr._soft_cap = sc
        ctx = corr.dispatch_arrays(mat[lo:lo + batch], qmat[lo:lo + batch],
                                   lens_all, has_q, lambda i: reads[i],
                                   soft=True)
        jax.block_until_ready(ctx["out"]["final_b"])
        return ctx

    t = time.time()
    dispatch(0, 64)
    log(f"search compile {time.time()-t:.1f}s")

    # soft-cap sweep on ONE program (sc is a traced scalar): exact
    # fixed-vs-slope split of the per-batch device time
    for sc in (1, 4, 16, 32, 64):
        t = time.time()
        for j in range(4):
            dispatch(j * batch, sc)
        dt = (time.time() - t) / 4
        RESULTS[f"sc{sc}_s"] = round(dt, 3)
        log(f"soft_cap={sc}: {dt:.3f}s/batch")

    # profiler trace of one 64-trip dispatch
    tr = os.path.join(tdir, "trace")
    try:
        with jax.profiler.trace(tr):
            dispatch(0, 64)
        files = glob.glob(os.path.join(tr, "**", "*.trace.json.gz"),
                          recursive=True)
        log(f"trace files: {files}")
        if files:
            ev = json.loads(gzip.open(files[0]).read()).get("traceEvents", [])
            dur = {}
            for e in ev:
                if e.get("ph") == "X" and "dur" in e:
                    name = e.get("name", "?")[:60]
                    dur[name] = dur.get(name, 0) + e["dur"]
            top = sorted(dur.items(), key=lambda x: -x[1])[:40]
            RESULTS["top_ops_us"] = top
            for name, us in top:
                log(f"  {us/1e3:9.2f}ms  {name}")
    except Exception as e:
        log(f"profiler failed: {type(e).__name__}: {e}")

    # cost analysis of the compiled search step
    try:
        import jax.numpy as jnp

        from bfc_tpu.ops import search as srch

        cfg = corr.cfg_main
        B2, L = 2 * batch, 128
        sds = lambda s, d: jax.ShapeDtypeStruct(s, d)
        lowered = srch.ec1dir_batch.lower(
            ds.table, cfg,
            sds((B2, L), jnp.uint8), sds((B2, L), jnp.bool_),
            sds((B2, L), jnp.bool_), sds((B2, L), jnp.int32),
            sds((B2, L), jnp.int32), sds((B2,), jnp.int32),
            sds((B2,), jnp.int32), sds((B2,), jnp.bool_),
            win_bits=tuple(sds((B2, L), jnp.bool_) for _ in range(4)),
            soft_cap=sds((), jnp.int32),
        )
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        RESULTS["cost_analysis"] = {
            k2: v for k2, v in ca.items()
            if isinstance(v, (int, float)) and abs(v) > 1e6
        }
        log(f"cost_analysis: {RESULTS['cost_analysis']}")
    except Exception as e:
        log(f"cost_analysis failed: {type(e).__name__}: {e}")

    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    sys.exit(main())
