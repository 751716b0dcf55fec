"""Round-4 TPU session 7 (r4g): per-fusion anatomy of the search program.

r4f measured the u32-probe-path program at ~9 ms/trip (sc sweep slope)
vs round-3's 4.8 ms/trip and correct_many at 13k reads/s vs 22k - the
all-32-bit rewrite REGRESSED the real program even though the probe
microbench improved 2000x.  Hypothesis: the flat-gather per-row
extracts (BFC_TPU_FLAT_EXTRACT) each become a separate non-fusable
kernel; the v5e pays a fixed ~0.05-0.1 ms per fusion inside a while
body, so trading fused one-hot reduces for 20+ standalone gathers is
a net loss.  This session settles it with data:

  1. table via dump-restore (or a CPU-backend in-process count on
     first run) - no 19-min TPU merge-ladder warm-up
  2. program A (flat_extract=True) vs program B (False), both compiled
     in ONE process (cfg now carries the flag): sc-cap sweep slopes,
     one profiler trace each, fusions mapped to the XLA HLO dump
     (launch with --xla_dump_to) and classified (gather or dense)
  3. correct_many end-to-end for both programs
  4. cuckoo_lookup32 latency vs table size (c_bits 20..28) - the
     VERDICT #2 size-independence check

Launch:
  XLA_FLAGS="--xla_dump_to=/tmp/xdump_r4g --xla_dump_hlo_module_re=correct_core --xla_dump_hlo_as_text" \
  BFC_TPU_JAX_CACHE=/root/repo/.cache/jax_cache \
  python scripts/tpu_session_r4g.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

RESULTS: dict = {}
T0 = time.time()
OUT = "/root/repo/scripts/r4g_results.json"
DUMP = "/root/repo/scripts/r4_table.dump"


def log(msg):
    sys.stderr.write(f"[r4g @{time.time()-T0:.0f}s] {msg}\n")
    sys.stderr.flush()


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def make_data():
    import numpy as np

    glen, cov, rlen = 500_000, 60, 100
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
    return mat, qmat


def parse_hlo_fusions(path):
    """Map fusion instruction name -> (shape, kind, op-count dict)."""
    comps: dict = {}
    fus: dict = {}
    cur = None
    op_re = re.compile(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\S+)\s+([a-z][\w\-]*)\(")
    with open(path) as f:
        for line in f:
            s = line.rstrip()
            if s.endswith("{"):
                mm = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)", s)
                cur = mm.group(1) if mm else None
                if cur:
                    comps[cur] = {}
                continue
            m = op_re.match(line)
            if m and cur is not None:
                name, shape, op = m.groups()
                comps[cur][op] = comps[cur].get(op, 0) + 1
                if op == "fusion":
                    mk = re.search(r"kind=(\w+)", line)
                    mc = re.search(r"calls=%?([\w.\-]+)", line)
                    fus[name] = (shape, mk.group(1) if mk else "",
                                 mc.group(1) if mc else None)
    out = {}
    for name, (shape, kind, comp) in fus.items():
        ops = comps.get(comp, {})
        out[name] = (shape, kind, ops)
    return out


def trace_one(tag, fn, tdir):
    """Profile one call of fn(); return ({hlo-op-name: total_us},
    {hlo-op-name: metadata-args}) - the event args carry XLA metadata
    (source lines / long_name) when the backend provides it, which
    substitutes for an HLO dump on backends where --xla_dump_to lands
    on the remote compile server."""
    import jax

    tr = os.path.join(tdir, f"trace_{tag}")
    with jax.profiler.trace(tr):
        fn()
    files = glob.glob(os.path.join(tr, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        return {}, {}
    ev = json.loads(gzip.open(files[0]).read()).get("traceEvents", [])
    dur: dict = {}
    meta: dict = {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")[:80]
            dur[name] = dur.get(name, 0) + e["dur"]
            a = e.get("args")
            if a and name not in meta:
                meta[name] = {k: str(v)[:160] for k, v in a.items()}
    return dur, meta


def newest_hlo_dump():
    files = glob.glob("/tmp/xdump_r4g/*after_optimizations*.txt")
    return max(files, key=os.path.getmtime) if files else None


def classify_trace(tag, dur, fmap):
    """Join trace durations with the HLO fusion map; print + record."""
    rows = []
    gather_us = dense_us = 0.0
    for name, us in sorted(dur.items(), key=lambda x: -x[1]):
        base = name.split("(")[0].strip()
        if base in fmap:
            shape, kind, ops = fmap[base]
            has_g = "gather" in ops or "scatter" in ops
            opstr = ",".join(f"{k}x{v}" for k, v in
                             sorted(ops.items(), key=lambda x: -x[1])[:5])
            rows.append([base, round(us / 1e3, 2), shape, kind, opstr])
            if has_g:
                gather_us += us
            else:
                dense_us += us
    RESULTS[f"{tag}_fusion_rows_top"] = rows[:40]
    RESULTS[f"{tag}_gather_fusion_ms"] = round(gather_us / 1e3, 2)
    RESULTS[f"{tag}_dense_fusion_ms"] = round(dense_us / 1e3, 2)
    log(f"--- {tag}: gather-fusion total {gather_us/1e3:.1f}ms, "
        f"dense-fusion total {dense_us/1e3:.1f}ms; top rows:")
    for r in rows[:25]:
        log(f"    {r[1]:9.2f}ms  {r[0]:<16} {r[3]:<7} {r[2][:28]:<28} {r[4]}")
    # the while/loop + entry rows for context
    for name, us in sorted(dur.items(), key=lambda x: -x[1])[:8]:
        if "while" in name or "jit_" in name:
            log(f"    {us/1e3:9.2f}ms  {name}")


def make_table() -> int:
    """CPU-only subprocess: count the r4 bench stream exactly through
    the production path and dump the table (bfc -d format).  Runs with
    JAX_PLATFORMS=cpu so it never claims the TPU tunnel."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    mat, qmat = make_data()
    n_use = len(mat) // 8192 * 8192
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, (500_000).bit_length() + 7)
    bc = np.frombuffer(b"ACGT", np.uint8)
    fq = tempfile.mktemp(suffix=".fq")
    with open(fq, "wb") as f:
        for i in range(n_use):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, bc[mat[i]].tobytes(), qmat[i].tobytes()))
    t = time.time()
    ds = C.count_file_device(fq, opt, batch_reads=16384)
    log(f"cpu count: {n_use} reads -> {ds.n_entries} entries "
        f"in {time.time()-t:.0f}s")
    ds.dump(DUMP)
    os.unlink(fq)
    return 0


def main() -> int:
    import jax
    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    k, batch, cbatch = 25, 8192, 16384
    rlen = 100
    mat, qmat = make_data()
    n_reads = len(mat)
    n_use = n_reads // batch * batch
    opt = Opts()
    opt.k = k
    opt.bf_shift = max(20, (500_000).bit_length() + 7)
    bc = np.frombuffer(b"ACGT", np.uint8)
    tdir = tempfile.mkdtemp(prefix="bfc_r4g_")
    log(f"data ready: {n_use} reads")

    # ---- table: restore from dump (see make_table / --make-table)
    t = time.time()
    if not os.path.exists(DUMP):
        import subprocess

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)  # no HLO dump for the CPU count
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--make-table"],
            env=env,
        ).returncode
        assert rc == 0 and os.path.exists(DUMP), "table subprocess failed"
        RESULTS["table_src"] = "cpu_subprocess"
    else:
        RESULTS["table_src"] = "restore"
    ds = C.restore_spectrum(DUMP)
    RESULTS["table_s"] = round(time.time() - t, 1)
    RESULTS["table_entries"] = int(ds.n_entries)
    log(f"table ready ({RESULTS['table_src']}) in {RESULTS['table_s']}s: "
        f"{ds.n_entries} entries, c_bits={ds.s_bits}")
    save()

    lens_all = np.full((batch,), rlen, np.int32)
    has_q = np.ones((batch,), bool)
    reads_txt = lambda i: (bc[mat[i]].tobytes().decode(),
                           qmat[i].tobytes().decode())

    def build(flat):
        os.environ["BFC_TPU_FLAT_EXTRACT"] = "1" if flat else "0"
        return DC.Corrector(opt, ds)

    def dispatch(corr, lo, sc):
        corr._soft_cap = sc
        ctx = corr.dispatch_arrays(mat[lo:lo + batch], qmat[lo:lo + batch],
                                   lens_all, has_q, reads_txt, soft=True)
        jax.block_until_ready(ctx["out"]["packed_bq"])
        return ctx

    def measure(tag, corr):
        t = time.time()
        dispatch(corr, 0, 64)
        RESULTS[f"{tag}_compile_s"] = round(time.time() - t, 1)
        log(f"{tag}: compile+first {RESULTS[f'{tag}_compile_s']}s")
        dispatch(corr, 0, 64)  # warm repeat (first-touch separation)
        for sc in (1, 4, 16, 64):
            t = time.time()
            for j in range(4):
                dispatch(corr, j * batch, sc)
            dt = (time.time() - t) / 4
            RESULTS[f"{tag}_sc{sc}_s"] = round(dt, 3)
            log(f"{tag}: soft_cap={sc}: {dt:.3f}s/batch")
        slope = (RESULTS[f"{tag}_sc64_s"] - RESULTS[f"{tag}_sc1_s"]) / 63
        RESULTS[f"{tag}_ms_per_trip"] = round(slope * 1e3, 2)
        log(f"{tag}: fixed {RESULTS[f'{tag}_sc1_s']}s + "
            f"{slope*1e3:.2f} ms/trip")
        dur, meta = trace_one(tag, lambda: dispatch(corr, 0, 64), tdir)
        hlo = newest_hlo_dump()
        if hlo and dur:
            log(f"{tag}: HLO dump {os.path.basename(hlo)[:60]} "
                f"({os.path.getsize(hlo)//1048576} MB)")
            fmap = parse_hlo_fusions(hlo)
            classify_trace(tag, dur, fmap)
        elif dur:
            # no local HLO dump (remote compile service): fall back to
            # trace-event metadata for attribution
            rows = []
            for name, us in sorted(dur.items(), key=lambda x: -x[1])[:30]:
                m = meta.get(name, {})
                extra = m.get("long_name") or m.get("source") or \
                    ",".join(f"{k}={v[:60]}" for k, v in list(m.items())[:2])
                rows.append([name, round(us / 1e3, 2), extra[:160]])
                log(f"    {us/1e3:9.2f}ms  {name:<24} {extra[:100]}")
            RESULTS[f"{tag}_trace_rows"] = rows
        save()

    # ---- program A: flat extracts (current default)
    corrA = build(True)
    measure("flatA", corrA)

    # ---- program B: one-hot extracts (round-3 form + u32 probes)
    corrB = build(False)
    measure("onehotB", corrB)

    # ---- end-to-end correct_many for both
    for tag, corr in (("flatA", corrA), ("onehotB", corrB)):
        corr._soft_cap = 64
        for rep in range(2):
            t = time.time()
            res = corr.correct_many(mat[:n_use], qmat[:n_use],
                                    np.full((n_use,), rlen, np.int32),
                                    np.ones((n_use,), bool),
                                    reads_txt, batch, bucketed=True,
                                    as_arrays=True)
            dt = time.time() - t
            RESULTS[f"{tag}_cm_rps_rep{rep}"] = round(n_use / dt, 1)
            log(f"{tag} correct_many rep{rep}: {n_use/dt:.0f} r/s ({dt:.1f}s)")
            assert res is not None and res.n == n_use
        save()

    # ---- cuckoo_lookup32 latency vs table size (VERDICT #2)
    from bfc_tpu.ops import spectrum as spec
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    h0 = jnp.asarray(rng.integers(0, 1 << k, 65536).astype(np.uint32))
    h1 = jnp.asarray(rng.integers(0, 1 << k, 65536).astype(np.uint32))
    for c_bits in (20, 24, 26, 28):
        lo = jnp.asarray(rng.integers(0, 1 << 32, 1 << c_bits, dtype=np.uint64)
                         .astype(np.uint32))
        hi = jnp.asarray(rng.integers(0, 1 << 17, 1 << c_bits, dtype=np.uint64)
                         .astype(np.uint32))
        tab = spec.CuckooTable(lo=lo, hi=hi)
        out = spec.cuckoo_lookup32(tab, h0, h1, k, c_bits)
        jax.block_until_ready(out)
        t = time.time()
        for _ in range(50):
            out = spec.cuckoo_lookup32(tab, h0, h1, k, c_bits)
        jax.block_until_ready(out)
        us = (time.time() - t) / 50 * 1e6
        RESULTS[f"lookup32_cbits{c_bits}_us"] = round(us, 1)
        log(f"cuckoo_lookup32 c_bits={c_bits}: {us:.1f} us / 65536 queries "
            f"(dispatch-inclusive)")
        del tab, lo, hi, out
    save()
    print(json.dumps(RESULTS))
    return 0


if __name__ == "__main__":
    if "--make-table" in sys.argv:
        sys.exit(make_table())
    sys.exit(main())
