"""Round-5 session E: counting batch-size A/B + correction scheduling.

One process: counting at BENCH_COUNT_BATCH 16384 vs 32768 (alternated,
warm), then correction steady-state with the soft-cap escalation
on/off at several caps.  Results -> scripts/r5e_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RES = {"count": [], "correct": []}


def log(msg):
    sys.stderr.write(f"[r5e {time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

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
    RES["gather_us"] = round((time.time() - t) / 4 / 64 * 1e6, 2)
    log(f"gather {RES['gather_us']} us/iter")

    rng = np.random.default_rng(1234)
    glen, cov, rlen = 500_000, 60, 100
    n_reads = glen * cov // rlen
    g = rng.integers(0, 4, glen).astype(np.uint8)
    seg, n_rep = 2000, int(glen * 0.1) // 2000
    for _ in range(n_rep):
        src = int(rng.integers(0, glen - seg))
        dst = int(rng.integers(0, glen - seg))
        g[dst : dst + seg] = g[src : src + seg]
    starts = rng.integers(0, glen - rlen, n_reads)
    mat = g[starts[:, None] + np.arange(rlen)[None, :]]
    rc = rng.random(n_reads) < 0.5
    mat[rc] = 3 - mat[rc, ::-1]
    err = rng.random((n_reads, rlen)) < 0.01
    mat = np.where(err, (mat + rng.integers(1, 4, mat.shape)) % 4, mat).astype(np.uint8)
    qmat = np.where(err, 33 + 2 + rng.integers(0, 13, mat.shape),
                    33 + 30 + rng.integers(0, 10, mat.shape)).astype(np.uint8)
    bc = np.frombuffer(b"ACGT", np.uint8)
    tdir = tempfile.mkdtemp(prefix="r5e_")
    fq = os.path.join(tdir, "r5e.fq")
    with open(fq, "wb") as fo:
        for i in range(n_reads):
            fo.write(b"@r%d\n%s\n+\n%s\n"
                     % (i, bc[mat[i]].tobytes(), qmat[i].tobytes()))
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, glen.bit_length() + 7)

    def count(cb, timed):
        t0 = time.time()
        ds = C.count_file_device(fq, opt, batch_reads=cb)
        dt = time.time() - t0
        RES["count"].append({"batch": cb, "s": round(dt, 2),
                             "rps": round(n_reads / dt, 1),
                             "tail": dict(C.TAIL_TIMINGS), "timed": timed})
        log(f"count cb={cb}: {dt:.1f}s = {n_reads/dt:.0f} r/s "
            f"tail {C.TAIL_TIMINGS}")
        return ds

    count(16384, False)
    C.await_merge_ladder()
    count(32768, False)
    C.await_merge_ladder()
    ds = count(16384, True)
    count(32768, True)
    count(16384, True)
    count(32768, True)

    batch = 8192
    n_use = n_reads // batch * batch
    corr = DC.Corrector(opt, ds)
    t0 = time.time()
    corr.prewarm(batch, read_len=rlen)
    log(f"prewarm {time.time()-t0:.1f}s (resume={corr._resume})")
    lens_all = np.full((n_use,), rlen, np.int32)
    has_q = np.ones((n_use,), bool)
    TR = bytes.maketrans(b"\x00\x01\x02\x03\x04", b"ACGTN")

    def text_of(i):
        return (mat[i].tobytes().translate(TR).decode(),
                qmat[i].tobytes().decode())

    def correct(sc, esc, timed):
        os.environ["BFC_TPU_SOFT_ESC"] = "1" if esc else "0"
        corr._soft_cap = sc
        t0 = time.time()
        corr.correct_many(mat[:n_use], qmat[:n_use], lens_all, has_q,
                          text_of, batch, bucketed=True, as_arrays=True)
        dt = time.time() - t0
        RES["correct"].append({"sc": sc, "esc": esc,
                               "final": corr._soft_cap,
                               "s": round(dt, 2),
                               "rps": round(n_use / dt, 1), "timed": timed})
        log(f"correct sc={sc} esc={esc}: {dt:.1f}s = {n_use/dt:.0f} r/s "
            f"(final {corr._soft_cap})")

    correct(64, True, False)   # untimed first pass (page faults)
    correct(64, True, True)
    correct(48, False, True)
    correct(64, False, True)
    correct(96, False, True)
    correct(64, True, True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5e_results.json")
    with open(out, "w") as f2:
        json.dump(RES, f2, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
