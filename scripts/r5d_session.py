"""Round-5 session D: pick the counting finalize mode (device vs host)
with the asymmetric no-spill merge tree, decomposed timings.

Runs in ONE process: warm both modes, then time device-finalize and
host-finalize counting passes back-to-back (alternating to dodge the
first-pass A/B trap).  Results -> scripts/r5d_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

RES = {"passes": []}


def log(msg):
    sys.stderr.write(f"[r5d {time.strftime('%H:%M:%S')}] {msg}\n")
    sys.stderr.flush()


def main():
    import tempfile

    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    # fingerprints (gather + pull)
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
    RES["gather_us"] = round((time.time() - t) / 4 / 64 * 1e6, 2)
    a = jnp.zeros(((32 << 20) // 4,), U32)
    aa = [jax.block_until_ready(a + U32(i)) for i in range(3)]
    _ = np.asarray(aa[0])
    t = time.time()
    for x in aa[1:]:
        _ = np.asarray(x)
    RES["pull_mbps"] = round((32 << 20) / ((time.time() - t) / 2) / 1e6, 1)
    log(f"gather {RES['gather_us']} us/iter, pull {RES['pull_mbps']} MB/s")

    # bench dataset (bench.py generator, same seeds)
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
    tdir = tempfile.mkdtemp(prefix="r5d_")
    fq = os.path.join(tdir, "r5d.fq")
    with open(fq, "wb") as fo:
        for i in range(n_reads):
            fo.write(b"@r%d\n%s\n+\n%s\n"
                     % (i, bc[mat[i]].tobytes(), qmat[i].tobytes()))
    opt = Opts()
    opt.k = 25
    opt.bf_shift = max(20, glen.bit_length() + 7)

    def count(mode, timed):
        os.environ["BFC_TPU_DEVICE_FINALIZE"] = mode
        t0 = time.time()
        ds = C.count_file_device(fq, opt, batch_reads=16384)
        dt = time.time() - t0
        rec = {"mode": "device" if mode != "0" else "host",
               "s": round(dt, 2), "rps": round(n_reads / dt, 1),
               "tail": dict(C.TAIL_TIMINGS),
               "table": type(ds.table).__name__, "timed": timed}
        RES["passes"].append(rec)
        log(f"count mode={rec['mode']}: {dt:.1f}s = {n_reads/dt:.0f} r/s "
            f"tail {C.TAIL_TIMINGS}")
        return ds

    # warm both modes (compiles + first-touch)
    count("1", False)
    C.await_merge_ladder()
    count("0", False)
    # timed, alternating twice
    count("1", True)
    count("0", True)
    count("1", True)
    count("0", True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "r5d_results.json")
    with open(out, "w") as f2:
        json.dump(RES, f2, indent=1)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
