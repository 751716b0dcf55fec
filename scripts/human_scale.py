"""Human-scale capacity rehearsal: stream millions of reads end to end.

Exercises the production array path (no Python strings) at a scale
approaching the reference's human benchmark (889M reads, 67.9 GB peak,
tex/bfc.tex:188-189): synthetic reads from a large genome stream
through device counting (AggBuilder merge tree) and batched correction,
with per-phase wall time, host RSS, and device memory reported.

    python scripts/human_scale.py [--reads 10000000] [--genome 100000000]
        [--k 27] [--batch 8192] [--count-only] [--cpu]

Defaults give a ~1 Gbp read set over a 100 Mbp genome -> a ~10^8-entry
spectrum (multi-GB table), the smallest config that stresses the same
capacity limits as the human run.
"""

from __future__ import annotations

import argparse
import resource
import sys
import time

sys.path.insert(0, "/root/repo")


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def dev_mem_gb() -> str:
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
        return f"{st['bytes_in_use']/1e9:.2f}GB (peak {st.get('peak_bytes_in_use', 0)/1e9:.2f}GB)"
    except Exception:
        return "n/a"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=float, default=10e6)
    ap.add_argument("--genome", type=float, default=100e6)
    ap.add_argument("--readlen", type=int, default=100)
    ap.add_argument("--k", type=int, default=27)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--err", type=float, default=0.01)
    ap.add_argument("--count-only", action="store_true")
    ap.add_argument("--correct-reads", type=float, default=500e3,
                    help="reads to push through correction (full set takes "
                         "hours; throughput is batch-stationary)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="devices: sharded counting + distributed finalize + "
                         "prefix-sharded table + sharded-table correction "
                         "(the human-scale layout; nothing gathers the "
                         "aggregate or the table to one host)")
    args = ap.parse_args(argv)

    import os

    import jax

    if args.cpu:
        if args.mesh and "xla_force_host_platform_device_count" not in \
                os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bfc_tpu.models import corrector as DC
    from bfc_tpu.models import counter as C
    from bfc_tpu.opts import Opts

    n_reads = int(args.reads)
    glen = int(args.genome)
    rlen = args.readlen
    B = args.batch
    rng = np.random.default_rng(7)

    print(f"[hs] genome {glen/1e6:.0f}Mbp, {n_reads/1e6:.1f}M reads x {rlen}bp "
          f"({n_reads*rlen/1e9:.2f} Gbp), k={args.k}", flush=True)
    t0 = time.time()
    genome = rng.integers(0, 4, glen).astype(np.uint8)
    print(f"[hs] genome generated in {time.time()-t0:.1f}s rss={rss_gb():.2f}GB",
          flush=True)

    opt = Opts()
    opt.k = args.k
    opt.apply_genome_size(glen)
    opt.k = args.k  # keep the requested k; -s only sizes the Bloom filter
    print(f"[hs] bf_shift={opt.bf_shift} l_pre={opt.effective_l_pre()}",
          flush=True)

    def gen_batch(seed):
        """One encoded batch: (bases u8 [B,L], qok bool, lens i32, rawq)."""
        r = np.random.default_rng(seed)
        starts = r.integers(0, glen - rlen, B)
        mat = genome[starts[:, None] + np.arange(rlen)[None, :]]
        rc = r.random(B) < 0.5
        mat[rc] = 3 - mat[rc, ::-1]
        err = r.random((B, rlen)) < args.err
        mat = np.where(err, (mat + r.integers(1, 4, mat.shape)) % 4,
                       mat).astype(np.uint8)
        qmat = np.where(err, 33 + 2 + r.integers(0, 13, mat.shape),
                        33 + 30 + r.integers(0, 10, mat.shape)).astype(np.uint8)
        qok = qmat.astype(np.int32) - 33 >= opt.q
        lens = np.full((B,), rlen, np.int32)
        return mat, qok, lens, qmat

    # ---- counting -------------------------------------------------------
    n_batches = n_reads // B
    mesh = None
    if args.mesh:
        from bfc_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(args.mesh)
        print(f"[hs] mesh: {args.mesh} devices, sharded counting + "
              f"distributed finalize + prefix-sharded table", flush=True)

        def batches():
            t_log = [time.time()]
            for bi in range(n_batches):
                mat, qok, lens, _ = gen_batch(1000 + bi)
                yield mat, qok, lens
                if time.time() - t_log[0] > 60:
                    t_log[0] = time.time()
                    print(f"[hs] counted {(bi+1)*B/1e6:.1f}M reads "
                          f"rss={rss_gb():.2f}GB dev={dev_mem_gb()}",
                          flush=True)

        t0 = time.time()
        ds = pmesh.count_encoded_mesh(batches(), opt, mesh, batch_reads=B,
                                      shard_table=True)
        t_fin = time.time() - t0
        from bfc_tpu.ops import spectrum as spec

        sharded = isinstance(ds.table, spec.ShardedCuckoo)
        print(f"[hs] mesh count+finalize: {ds.n_entries/1e6:.1f}M distinct "
              f"k-mers in {t_fin:.1f}s, table "
              f"{'PREFIX-SHARDED (no host gather)' if sharded else 'replicated'}"
              f" rss={rss_gb():.2f}GB dev={dev_mem_gb()}", flush=True)
    else:
        builder = C.AggBuilder(opt)
        t0 = time.time()
        t_log = t0
        for bi in range(n_batches):
            mat, qok, lens, _ = gen_batch(1000 + bi)
            builder.add(mat, qok, lens)
            if time.time() - t_log > 60:
                t_log = time.time()
                done = (bi + 1) * B
                print(f"[hs] counted {done/1e6:.1f}M reads "
                      f"({done/(t_log-t0):.0f} reads/s) rss={rss_gb():.2f}GB "
                      f"dev={dev_mem_gb()}", flush=True)
        t_add = time.time() - t0
        print(f"[hs] aggregation: {n_batches*B/1e6:.1f}M reads in {t_add:.1f}s = "
              f"{n_batches*B/t_add:.0f} reads/s dev={dev_mem_gb()}", flush=True)
        t0 = time.time()
        agg = builder.finish()
        print(f"[hs] finish (device merge + pull): {time.time()-t0:.1f}s "
              f"rss={rss_gb():.2f}GB", flush=True)
        t0 = time.time()
        ds = C.finalize_spectrum(agg, opt)
        t_fin = time.time() - t0
        print(f"[hs] finalize: {ds.n_entries/1e6:.1f}M distinct k-mers in "
              f"{t_fin:.1f}s rss={rss_gb():.2f}GB dev={dev_mem_gb()}", flush=True)
    if args.count_only:
        return 0

    # ---- correction -----------------------------------------------------
    corr = DC.Corrector(opt, ds, mesh=mesh)
    n_corr = min(int(args.correct_reads), n_reads)
    ncb = max(n_corr // B, 1)
    WINDOW = 4
    t_warm = time.time()
    done = 0
    t0 = None
    for wi in range(0, ncb, WINDOW):
        bs = [gen_batch(1000 + bi) for bi in range(wi, min(wi + WINDOW, ncb))]
        mat = np.concatenate([b[0] for b in bs])
        qmat = np.concatenate([b[3] for b in bs])
        lens = np.concatenate([b[2] for b in bs])
        has_q = np.ones((len(lens),), bool)
        basechars = np.frombuffer(b"ACGT", np.uint8)

        def text_of(i):
            return (basechars[mat[i]].tobytes().decode(),
                    qmat[i].tobytes().decode())

        res = corr.correct_many(mat, qmat, lens, has_q, text_of, B,
                                as_arrays=True)
        if t0 is None:
            print(f"[hs] correction warm-up (compile): "
                  f"{time.time()-t_warm:.1f}s", flush=True)
            t0 = time.time()  # exclude the compile window
        else:
            done += len(lens)
            if done and done % (B * WINDOW * 8) == 0:
                print(f"[hs] corrected {done/1e3:.0f}k reads "
                      f"({done/(time.time()-t0):.0f} reads/s) "
                      f"dev={dev_mem_gb()}", flush=True)
    t_corr = time.time() - t0
    print(f"[hs] correction: {done} reads in {t_corr:.1f}s = "
          f"{done/max(t_corr,1e-9):.0f} reads/s rss={rss_gb():.2f}GB "
          f"dev={dev_mem_gb()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
