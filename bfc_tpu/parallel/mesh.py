"""Multi-chip scaling: hash-prefix-sharded counting + data-parallel correction.

TPU-native replacement for the reference's shared-memory concurrency
(spin-locked Bloom blocks / hash shards + per-thread insert buffers,
/root/reference/bbf.c:34, htab.c:67-71, count.c:20-66).  The reference
already partitions its table by a hash prefix (htab.c:28-33); here that
prefix becomes the device-sharding key:

  counting   each device rolls k-mers from its read slice, buckets them
             by table-shard prefix, and exchanges buckets with a single
             jax.lax.all_to_all over ICI; every per-shard combine is
             then purely local (the per-thread insbuf trick, writ large).
  adjudicate Bloom first-occurrence adjudication routes first-occurrence
             events by Bloom-block prefix (a second all_to_all), computes
             per-bit min arrivals locally, and routes verdicts back.
  correction data-parallel over reads with the finalized table
             replicated (sharded-table lookup via all-to-all gather is
             the human-scale path; see SURVEY.md §5.8).

Determinism: arrival indices are global (read-major over the unsharded
stream), so the sequential-order counting semantics are preserved
exactly regardless of device count.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmer as kops
from ..ops import spectrum as spec

U64 = jnp.uint64
U32 = jnp.uint32
I32 = jnp.int32


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("d",))


def gput(arr, mesh: Mesh, pspec) -> jax.Array:
    """Build a global device array from host data, multi-process aware.

    Single process: a plain device_put.  Multi-process (jax.distributed
    initialized): every process passes the SAME full host array; for a
    row-sharded spec each process contributes only the row range owned
    by its local devices (jax.make_array_from_process_local_data), for a
    replicated spec the full array.  Device order in the mesh must be
    process-major (jax.devices() order) so global row order equals the
    host array's row order."""
    sh = NamedSharding(mesh, pspec)
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sh)
    arr = np.asarray(arr)
    if pspec == P():
        return jax.make_array_from_process_local_data(sh, arr)
    n_proc = jax.process_count()
    pid = jax.process_index()
    B = arr.shape[0]
    assert B % n_proc == 0, (B, n_proc)
    step = B // n_proc
    return jax.make_array_from_process_local_data(
        sh, arr[pid * step : (pid + 1) * step]
    )


def to_host(x) -> np.ndarray:
    """Pull a (possibly non-fully-addressable) global array to every
    host: allgather under multi-process, np.asarray otherwise."""
    if jax.process_count() == 1 or not isinstance(x, jax.Array):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _dev_of_shard(shard, l_pre: int, n_dev: int):
    """Owning device of a table shard = top log2(n_dev) bits of the prefix."""
    shift = max(l_pre - int(np.log2(n_dev)), 0)
    return (shard >> U32(shift)).astype(I32) % n_dev


@functools.partial(
    jax.jit, static_argnames=("k", "l_pre", "cap", "bucket_cap", "mesh_ref")
)
def sharded_chunk_aggregate(bases, qual_ok, lens, arrival_base, k: int,
                            l_pre: int, cap: int, bucket_cap: int, mesh_ref):
    """One sharded counting step: local k-mer roll -> all-to-all by hash
    prefix -> local combine.  Inputs are sharded over reads (axis 0 of
    [B, L]); the returned Aggregate is sharded over hash-prefix ranges
    (axis 0 of [n_dev * cap])."""
    mesh = mesh_ref.mesh
    n_dev = mesh.shape["d"]

    def step(bases, qual_ok, lens, arrival_base):
        # local shard of the batch
        s = kops.kmer_stream(bases, qual_ok, lens, k, l_pre)
        Bl, L = bases.shape
        my = jax.lax.axis_index("d")
        arrival = (
            arrival_base
            + my.astype(U64) * U64(Bl * L)
            + jnp.arange(Bl * L, dtype=U64)
        )
        valid = s["valid"].reshape(-1)
        shard = jnp.where(valid, s["shard"].reshape(-1), spec.INVALID_SHARD)
        keybody = s["keybody"].reshape(-1)
        ret = s["ret"].reshape(-1)
        is_high = s["is_high"].reshape(-1).astype(U32)
        dest = jnp.where(valid, _dev_of_shard(shard, l_pre, n_dev), n_dev)
        # bucket by destination: sort by dest, then scatter into fixed
        # [n_dev, bucket_cap] send buffers (per-dest overflow detected)
        order = spec.stable_order(dest.astype(jnp.uint32))
        dest_s = dest[order]
        rank = jnp.arange(dest_s.shape[0]) - jnp.searchsorted(
            dest_s, dest_s, side="left"
        )
        counts = jnp.bincount(jnp.minimum(dest_s, n_dev), length=n_dev + 1)[:n_dev]
        overflow = jnp.any(counts > bucket_cap)
        slot = jnp.where(
            (dest_s < n_dev) & (rank < bucket_cap),
            dest_s * bucket_cap + rank,
            n_dev * bucket_cap + 1,
        )

        def bucketize(v, fill):
            buf = jnp.full((n_dev * bucket_cap,), fill, v.dtype)
            return buf.at[slot].set(v[order], mode="drop").reshape(n_dev, bucket_cap)

        b_shard = bucketize(shard, spec.INVALID_SHARD)
        b_kb = bucketize(keybody, U64(0xFFFFFFFFFFFFFFFF))
        b_ret = bucketize(ret, U64(0))
        b_high = bucketize(is_high, U32(0))
        b_arr = bucketize(arrival, U64(0xFFFFFFFFFFFFFFFF))
        # exchange: row j of the result = row my of device j's buffer
        def xch(b):
            return jax.lax.all_to_all(b, "d", split_axis=0, concat_axis=0, tiled=True)

        r_shard = xch(b_shard).reshape(-1)
        r_kb = xch(b_kb).reshape(-1)
        r_ret = xch(b_ret).reshape(-1)
        r_high = xch(b_high).reshape(-1)
        r_arr = xch(b_arr).reshape(-1)
        one = (r_shard != spec.INVALID_SHARD).astype(U32)
        agg, g = spec._segment_combine(
            r_shard, r_kb, r_ret, one, r_high, r_arr, r_high, cap
        )
        return tuple(x[None] for x in agg) + (g[None], overflow[None])

    out = shard_map(
        step, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P()),
        out_specs=tuple([P("d")] * 7) + (P("d"), P("d")),
    )(bases, qual_ok, lens, arrival_base)
    agg = spec.Aggregate(*[x.reshape(-1) for x in out[:7]])
    return agg, out[7], jnp.any(out[8])


@functools.partial(jax.jit, static_argnames=("cap", "mesh_ref"))
def sharded_merge(a: spec.Aggregate, b: spec.Aggregate, cap: int, mesh_ref):
    """Merge two prefix-sharded aggregates; combines stay device-local."""
    mesh = mesh_ref.mesh

    def step(*cols):
        ca = cols[:7]
        cb = cols[7:]
        cat = [jnp.concatenate([x.reshape(-1), y.reshape(-1)]) for x, y in zip(ca, cb)]
        agg, g = spec._segment_combine(
            cat[0], cat[1], cat[2], cat[3], cat[4], cat[5], cat[6], cap
        )
        return tuple(x[None] for x in agg) + (g[None],)

    out = shard_map(
        step, mesh=mesh,
        in_specs=tuple([P("d")] * 14),
        out_specs=tuple([P("d")] * 7) + (P("d"),),
    )(*(list(a) + list(b)))
    return spec.Aggregate(*[x.reshape(-1) for x in out[:7]]), out[7]


@functools.partial(jax.jit, static_argnames=("bf_shift", "n_hashes", "mesh_ref",
                                              "ev_slack"))
def sharded_adjudicate(agg: spec.Aggregate, bf_shift: int, n_hashes: int, mesh_ref,
                       ev_slack: int = 2):
    """Distributed Bloom first-occurrence adjudication.

    Routes (probe-bit, arrival) events to the device owning the Bloom
    block (low ret bits), computes per-bit min arrivals locally, and
    routes verdicts back to the k-mers' owners."""
    mesh = mesh_ref.mesh
    n_dev = mesh.shape["d"]

    def step(shard, ret, first_arr):
        shard = shard.reshape(-1)
        ret = ret.reshape(-1)
        first_arr = first_arr.reshape(-1)
        C = shard.shape[0]
        valid = shard != spec.INVALID_SHARD
        bits = spec.bloom_probe_bits(ret, bf_shift, n_hashes)  # [C, H]
        H = n_hashes
        flat_bits = bits.reshape(-1)
        flat_arr = jnp.broadcast_to(first_arr[:, None], (C, H)).reshape(-1)
        flat_ok = jnp.broadcast_to(valid[:, None], (C, H)).reshape(-1)
        # destination = block owner; block = bit_id >> 9
        dest = jnp.where(
            flat_ok,
            ((flat_bits >> U64(9)) % U64(n_dev)).astype(I32),
            n_dev,
        )
        cap_ev = (C * H) // n_dev * ev_slack + 64
        order = spec.stable_order(dest.astype(jnp.uint32))
        dest_s = dest[order]
        rank = jnp.arange(dest_s.shape[0]) - jnp.searchsorted(dest_s, dest_s, "left")
        counts = jnp.bincount(jnp.minimum(dest_s, n_dev), length=n_dev + 1)[:n_dev]
        overflow = jnp.any(counts > cap_ev)
        slot = jnp.where(
            (dest_s < n_dev) & (rank < cap_ev),
            dest_s * cap_ev + rank, n_dev * cap_ev + 1,
        )

        def bucketize(v, fill):
            buf = jnp.full((n_dev * cap_ev,), fill, v.dtype)
            return buf.at[slot].set(v[order], mode="drop").reshape(n_dev, cap_ev)

        sent = U64(0xFFFFFFFFFFFFFFFF)
        b_bit = bucketize(jnp.where(flat_ok, flat_bits, sent), sent)
        b_arr = bucketize(flat_arr, sent)

        def xch(b):
            return jax.lax.all_to_all(b, "d", split_axis=0, concat_axis=0, tiled=True)

        r_bit = xch(b_bit).reshape(-1)
        r_arr = xch(b_arr).reshape(-1)
        # local per-bit min arrival; events with identical bits collide here
        a_lo = (r_arr & U64(0xFFFFFFFF)).astype(U32)
        a_hi = (r_arr >> U64(32)).astype(U32)
        b_lo = (r_bit & U64(0xFFFFFFFF)).astype(U32)
        b_hi = (r_bit >> U64(32)).astype(U32)
        ksrc = spec.stable_order(a_lo, a_hi, b_lo, b_hi)
        kb = r_bit[ksrc]
        ka = r_arr[ksrc]
        first = jnp.concatenate([jnp.ones((1,), bool), kb[1:] != kb[:-1]])
        min_arr = spec._forward_fill(jnp.where(first, ka, U64(0)), first)
        was_set = (min_arr < ka) & (kb != sent)
        verdict = jnp.zeros((r_bit.shape[0],), bool).at[ksrc].set(was_set)
        # route verdicts back: the bucket layout is symmetric, so a
        # second all_to_all returns slot (j, i) to its origin device
        v_back = xch(verdict.reshape(n_dev, cap_ev)).reshape(-1)
        # undo the local bucketization: slot maps sorted position -> buffer
        in_range = slot < n_dev * cap_ev
        hit_sorted = jnp.where(
            in_range, v_back[jnp.minimum(slot, n_dev * cap_ev - 1)], False
        )
        hit = jnp.zeros((C * H,), bool).at[order].set(hit_sorted)
        fp = jnp.all(hit.reshape(C, H), axis=-1) & valid
        return fp[None], overflow[None]

    out = shard_map(
        step, mesh=mesh,
        in_specs=(P("d"), P("d"), P("d")),
        out_specs=(P("d"), P("d")),
    )(agg.shard, agg.ret, agg.first_arr)
    return out[0].reshape(-1), jnp.any(out[1])


def replicate_table(table, mesh: Mesh):
    """Replicate the finalized table across the mesh for dp correction."""
    return type(table)(*[gput(np.asarray(x), mesh, P()) for x in table])


def shard_cuckoo_table(ds, mesh: Mesh) -> bool:
    """Re-layout ds.table as a slot-range-sharded ShardedCuckoo.

    The human-scale path (htab.c:28-33): each device holds 1/n_dev of
    the spectrum; correction lookups route slot requests over the mesh
    (spectrum.sharded_cuckoo_lookup).  Requires the cuckoo layout and a
    power-of-two device count dividing the table; returns False (table
    left as-is) otherwise - callers then keep the replicated path."""
    n_dev = mesh.shape["d"]
    entries = getattr(ds.table, "entries", None)
    if not isinstance(ds.table, spec.CuckooTable):
        return False
    if n_dev & (n_dev - 1) or entries.shape[0] % n_dev:
        return False
    ds.table = spec.ShardedCuckoo(
        entries=gput(np.asarray(entries), mesh, P("d"))
    )
    return True


class MeshRef:
    """Hashable wrapper so a Mesh can be a static jit argument."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return isinstance(other, MeshRef) and self.mesh == other.mesh


# ---------------------------------------------------------------------------
# Mesh counting driver
# ---------------------------------------------------------------------------

def count_file_mesh(fn: str, opt, mesh: Mesh, batch_reads: int = 8192):
    """Counting pass sharded over the mesh: reads data-parallel in, the
    aggregate hash-prefix-sharded out, Bloom adjudication distributed.

    Returns a DeviceSpectrum (table built once from the gathered
    aggregate and replicated for the correction pass).  Output is
    bit-identical to the single-device pass: arrival indices stay
    global, so the sequential-order semantics are preserved."""
    import numpy as np

    from ..io import fast_reader as FR
    from ..models.counter import _round_up, finalize_spectrum
    from ..opts import Opts
    from ..utils.log import log

    import os

    from ..ops import spectrum_host as sph

    mref = MeshRef(mesh)
    n_dev = mesh.shape["d"]
    assert batch_reads % n_dev == 0
    k = opt.k
    l_pre = opt.effective_l_pre()
    kb_bits = kops.keybody_bits(k, l_pre)
    # per-device merge capacity: same HBM bound as the single-device
    # tree; past it the binary counter LSM-spills complete spans to a
    # host counter (see models.counter.AggBuilder)
    max_dev_cap = int(os.environ.get("BFC_TPU_MAX_MERGE_CAP", str(1 << 22)))
    ccap = 1 << 18
    arrival_base = jnp.uint64(0)
    pad_L = 0
    n_reads = 0

    def _to_host_agg(agg):
        """Pull a prefix-sharded aggregate as a compact sorted HostAgg.

        Device blocks are contiguous ascending shard-prefix ranges and
        each block is sorted, so the concatenation (minus padding) is
        globally sorted - merge_host_aggs' input contract."""
        shard = to_host(agg.shard)
        valid = shard != 0xFFFFFFFF
        return sph.HostAgg(
            shard[valid], to_host(agg.keybody)[valid],
            to_host(agg.ret)[valid], to_host(agg.n)[valid],
            to_host(agg.n_high)[valid], to_host(agg.first_arr)[valid],
            to_host(agg.first_high)[valid],
        )

    def _merge_runs(a, b):
        """LsmTree merge callback: device merge with output-capacity
        doubling (a = earlier span); None once the union would need a
        merge beyond the per-device HBM cap -> the tree spills."""
        cap = max(a[1], b[1])
        if cap > max_dev_cap:
            return None
        while True:
            merged, g2 = sharded_merge(a[0], b[0], cap, mref)
            if int(jnp.max(g2)) <= cap:
                return (merged, cap)
            cap *= 2
            if cap > max_dev_cap:
                return None

    from ..ops.lsm import LsmTree

    tree = LsmTree(
        merge=_merge_runs,
        to_host=lambda run: _to_host_agg(run[0]),
        host_merge=lambda a, b: sph.merge_host_aggs(
            a, b, l_pre=l_pre, kb_bits=kb_bits),
        async_spill=False,  # to_host allgathers: collectives stay on the
                            # main thread in identical order on every host
        name="count_file_mesh",
    )

    for rb in FR.iter_batches_prefetch(fn, batch_reads, max_bases=opt.chunk_size):
        n = rb.n
        n_reads += n
        pad_L = max(pad_L, _round_up(int(rb.lens.max()) if n else 1, 32))
        L = pad_L
        Lc = min(L, rb.bases.shape[1])
        bases = np.full((batch_reads, L), 4, np.uint8)
        bases[:n, :Lc] = rb.bases[:, :Lc]
        lens = np.zeros((batch_reads,), np.int32)
        lens[:n] = rb.lens
        qok = np.zeros((batch_reads, L), bool)
        has_q = rb.has_qual()
        inb = np.arange(Lc)[None, :] < rb.lens[:, None]
        qok[:n, :Lc] = np.where(
            has_q[:, None], rb.quals[:, :Lc].astype(np.int32) - 33 >= opt.q, inb
        )
        bases_s = gput(bases, mesh, P("d"))
        qok_s = gput(qok, mesh, P("d"))
        lens_s = gput(lens, mesh, P("d"))
        while True:
            chunk, g, ovf = sharded_chunk_aggregate(
                bases_s, qok_s, lens_s, arrival_base, k, l_pre,
                ccap, batch_reads // n_dev * L, mref,
            )
            if int(jnp.max(g)) <= ccap and not bool(ovf):
                break
            ccap *= 2  # per-device overflow: redo at doubled capacity
        arrival_base = arrival_base + jnp.uint64(batch_reads * L)
        tree.push((chunk, ccap))
    log(f"processed {n_reads} sequences over {n_dev} devices",
        func="count_file_mesh")
    acc, hacc = tree.finish()
    if hacc is not None:
        from ..models.counter import finalize_spectrum

        log(f"{len(hacc.shard)} distinct k-mers aggregated (host tree)",
            func="count_file_mesh")
        ds = finalize_spectrum(hacc, opt)
        ds.table = replicate_table(ds.table, mesh)
        return ds
    if acc is None:
        from ..models.counter import count_stream

        return count_stream(iter(()), opt)
    agg = acc[0]
    # adjudication events hash-route by Bloom bit; pathological skew can
    # overflow a destination bucket - retry with more slack instead of
    # aborting (graceful re-bucketing)
    ev_slack = 2
    while True:
        fp, ovf2 = sharded_adjudicate(agg, opt.bf_shift, opt.n_hashes, mref,
                                      ev_slack=ev_slack)
        if not bool(ovf2):
            break
        ev_slack *= 2
        log(f"adjudication bucket overflow; retrying with slack {ev_slack}",
            func="count_file_mesh")
        assert ev_slack <= 64, "adjudication bucket overflow beyond 64x slack"
    # fold the fp verdicts into the aggregate, then finalize once
    # globally (the finalize re-runs its own adjudication; zero out the
    # first-occurrence contribution instead by adjusting n/n_high)
    ds = _finalize_sharded(agg, fp, opt)
    ds.table = replicate_table(ds.table, mesh)
    return ds


def _finalize_sharded(agg: spec.Aggregate, fp, opt):
    """Payloads + table from a prefix-sharded aggregate and fp verdicts."""
    import numpy as np

    from ..models.counter import DeviceSpectrum, _mode_from_hist
    from ..ops import kmer as kops

    k = opt.k
    l_pre = opt.effective_l_pre()
    a_shard = to_host(agg.shard)
    valid = a_shard != 0xFFFFFFFF
    fp_np = to_host(fp).astype(np.uint32)
    n_occ = to_host(agg.n)
    m = n_occ - 1 + fp_np
    high = to_host(agg.n_high) - (1 - fp_np) * to_host(agg.first_high)
    keep = valid & (m >= 1)
    count = np.minimum(m, 255).astype(np.uint32)
    high = np.minimum(high, 63).astype(np.uint32)
    payload = (count | (high << 8)) * keep
    shard = a_shard[keep]
    keybody = to_host(agg.keybody)[keep]
    payload = payload[keep]
    order = np.lexsort((keybody, shard))
    from ..models.counter import _spectrum_from_sorted

    return _spectrum_from_sorted(
        shard[order], keybody[order], payload[order].astype(np.uint32), k, l_pre
    )
