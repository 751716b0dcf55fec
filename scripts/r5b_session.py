"""Round-5 TPU session B: counting device-finalize + resume correction.

One process, serial steps (CLAUDE.md TPU rules):
  1. gather + pull fingerprints
  2. counting with BFC_TPU_MAX_MERGE_CAP=2^23: does the 8M-row merge
     compile on a v5e (round-2's 4M wall was measured on u64 planes)?
     If yes, the bench-scale stream never spills and finalize runs on
     device (no tunnel pull, no host sort/build).
  3. correction with state-resume: prewarm (3 programs in parallel),
     then warm correct_many sweeps over soft caps (traced - no
     recompiles).
Results -> scripts/r5b_results.json; compiles seed .cache/jax_cache.
"""

import json
import os
import sys
import time

os.environ.setdefault("BFC_TPU_MAX_MERGE_CAP", str(1 << 23))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RES = {"env": {"merge_cap": os.environ["BFC_TPU_MAX_MERGE_CAP"]}}


def log(msg):
    sys.stderr.write(f"[r5b {time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def fingerprints():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    U32, I32 = jnp.uint32, jnp.int32
    S = 1 << 21
    tab = jnp.zeros((S,), U32)
    idx = jnp.asarray(rng.integers(0, S, 65536).astype(np.uint32))

    @jax.jit
    def f(tab, idx):
        def body(c):
            i, acc = c
            ix = (idx + i.astype(U32) * U32(2654435761)) & U32(S - 1)
            return i + I32(1), acc + tab[ix].sum(dtype=U32)

        return jax.lax.while_loop(lambda c: c[0] < I32(64), body,
                                  (I32(0), U32(0)))[1]

    jax.block_until_ready(f(tab, idx))
    t = time.time()
    for _ in range(4):
        r = f(tab, idx)
    jax.block_until_ready(r)
    g_us = (time.time() - t) / 4 / 64 * 1e6
    a = jnp.zeros(((32 << 20) // 4,), U32)
    aa = [jax.block_until_ready(a + U32(i)) for i in range(3)]
    _ = np.asarray(aa[0])
    t = time.time()
    for x in aa[1:]:
        _ = np.asarray(x)
    pull = (32 << 20) / ((time.time() - t) / 2) / 1e6
    RES["gather_us"] = round(g_us, 2)
    RES["pull_mbps"] = round(pull, 1)
    log(f"fingerprints: gather {g_us:.2f} us/iter, pull {pull:.0f} MB/s")


def gen_dataset(tdir):
    # byte-for-byte the bench.py generator (same seeds/sizes)
    rng = np.random.default_rng(1234)
    glen, cov, rlen = 500_000, 60, 100
    n_reads = glen * cov // rlen
    gcodes = rng.integers(0, 4, glen).astype(np.uint8)
    seg, n_rep = 2000, int(glen * 0.1) // 2000
    for _ in range(n_rep):
        src = int(rng.integers(0, glen - seg))
        dst = int(rng.integers(0, glen - seg))
        gcodes[dst : dst + seg] = gcodes[src : src + seg]
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = gcodes[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4, mat).astype(np.uint8)
    qmat = np.where(err, 33 + 2 + rng.integers(0, 13, mat.shape),
                    33 + 30 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    fq = os.path.join(tdir, "r5b.fq")
    with open(fq, "wb") as f:
        for i in range(n_reads):
            f.write(b"@r%d\n%s\n+\n%s\n"
                    % (i, bc[mat[i]].tobytes(), qmat[i].tobytes()))
    return fq, mat, qmat, n_reads, rlen


def main():
    import tempfile

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    fingerprints()
    tdir = tempfile.mkdtemp(prefix="r5b_")
    fq, mat, qmat, n_reads, rlen = gen_dataset(tdir)
    log(f"dataset: {n_reads} reads")
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, (500_000).bit_length() + 7)

    # ---- counting
    cbatch = 16384
    try:
        t0 = time.time()
        C.count_file_device(fq, opt, batch_reads=cbatch)
        C.await_merge_ladder()
        ds = C.count_file_device(fq, opt, batch_reads=cbatch)
        warm_s = time.time() - t0
        log(f"counting warm-up {warm_s:.1f}s; tail {C.TAIL_TIMINGS}")
        t0 = time.time()
        ds = C.count_file_device(fq, opt, batch_reads=cbatch)
        t_count = time.time() - t0
        RES["count_s"] = round(t_count, 2)
        RES["count_rps"] = round(n_reads / t_count, 1)
        RES["count_tail"] = dict(C.TAIL_TIMINGS)
        RES["count_table"] = type(ds.table).__name__
        RES["count_c_bits"] = ds.s_bits
        log(f"counting timed: {t_count:.1f}s = {n_reads/t_count:.0f} r/s "
            f"tail {C.TAIL_TIMINGS} table {type(ds.table).__name__} "
            f"s_bits {ds.s_bits}")
    except Exception as e:
        RES["count_error"] = f"{type(e).__name__}: {e}"[:500]
        log(f"counting at 8M cap FAILED: {type(e).__name__}: {e}")
        os.environ["BFC_TPU_MAX_MERGE_CAP"] = str(1 << 22)
        ds = C.count_file_device(fq, opt, batch_reads=cbatch)

    # ---- correction (state-resume on by default)
    batch = 8192
    n_use = n_reads // batch * batch
    corr = DC.Corrector(opt, ds)
    log(f"resume active: {corr._resume}")
    t0 = time.time()
    corr.prewarm(batch, read_len=rlen)
    log(f"correction prewarm {time.time()-t0:.1f}s")
    lens_all = np.full((n_use,), rlen, np.int32)
    has_q = np.ones((n_use,), bool)
    TR = bytes.maketrans(b"\x00\x01\x02\x03\x04", b"ACGTN")

    def text_of(i):
        # only overflow->scalar reads ever need text; decode on demand
        return (mat[i].tobytes().translate(TR).decode(),
                qmat[i].tobytes().decode())

    sweeps = [64, 64, 40, 28, 96]  # first 64 is the extra warm pass
    RES["correct"] = []
    for i, sc in enumerate(sweeps):
        corr._soft_cap = sc
        t0 = time.time()
        res = corr.correct_many(
            mat[:n_use], qmat[:n_use], lens_all, has_q, text_of, batch,
            bucketed=True, as_arrays=True,
        )
        dt = time.time() - t0
        rec = {"soft_cap": sc, "final_cap": corr._soft_cap,
               "s": round(dt, 2), "rps": round(n_use / dt, 1),
               "warm": i > 0}
        RES["correct"].append(rec)
        log(f"correct_many sc={sc}: {dt:.1f}s = {n_use/dt:.0f} r/s "
            f"(final cap {corr._soft_cap})")

    # optional resume-off A/B (extra big compile) gated by env
    if os.environ.get("R5B_RESUME_OFF_AB", "0") == "1":
        os.environ["BFC_TPU_RESUME"] = "0"
        corr2 = DC.Corrector(opt, ds)
        corr2.prewarm(batch, read_len=rlen)
        for sc in (64, 64):
            corr2._soft_cap = sc
            t0 = time.time()
            corr2.correct_many(
                mat[:n_use], qmat[:n_use], lens_all, has_q, text_of, batch,
                bucketed=True, as_arrays=True,
            )
            dt = time.time() - t0
            RES.setdefault("correct_noresume", []).append(
                {"soft_cap": sc, "s": round(dt, 2),
                 "rps": round(n_use / dt, 1)})
            log(f"no-resume sc={sc}: {dt:.1f}s = {n_use/dt:.0f} r/s")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5b_results.json")
    with open(out, "w") as f:
        json.dump(RES, f, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
