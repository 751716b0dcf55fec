"""Dense (gather-free) sorting-network engine: bitonic sort / merge,
mask replay, and log-pass stream compaction over u32 record planes.

Why this exists: on TPU, XLA lowers every dynamic gather/scatter with
computed indices to a serialized per-element loop with a large fixed
startup cost (measured ~1.2-1.7 ms per gather op on a v5e + ~40-90 ns
per element).  Any sort implemented as "compute permutation, then apply
by gather" therefore costs hundreds of ms at millions of rows - this
was the counting pass bottleneck.  A sorting NETWORK moves records with
dense compare-exchange passes only (reshape + where), which are
bandwidth-bound and fuse well.

Records are tuples of u32 planes; the first `nk` planes form the sort
key, big-endian (plane 0 most significant).  All lengths power of two;
callers pad with all-ones keys (sorts last).

The compare-exchange masks of every pass can be recorded and REPLAYED
IN REVERSE, restoring the pre-sort order of all planes - this turns a
sorted-merge into a batched table lookup with no gathers at all (sort
queries, merge into the sorted table, forward-fill payloads, unsort):
see ops.spectrum merge-lookup.

Compaction (dropping invalidated records from a sorted run) uses a
log2(N)-pass monotone butterfly: each surviving record moves left by
its rank deficit d_i (# dropped before it), one bit per pass, LSB
first.  d is non-decreasing with unit steps, which makes the routing
provably collision-free (d_j - d_i <= j - i - 1 for survivors i < j,
so partial positions stay strictly increasing).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32


def _gt(a_planes, b_planes, nk: int):
    """Lexicographic a > b over the first nk (big-endian) key planes."""
    gt = None
    eq = None
    for i in range(nk):
        a, b = a_planes[i], b_planes[i]
        g = a > b
        if gt is None:
            gt, eq = g, a == b
        else:
            gt = gt | (eq & g)
            eq = eq & (a == b)
    return gt


def _exchange(planes, stride: int, up_mask, record: bool, nk: int):
    """One compare-exchange pass at the given stride.

    Partners are i and i ^ stride, realized as a [*, 2, stride] reshape;
    up_mask has the pass's ascending/descending flag per pair (shape
    broadcastable to [N/(2*stride), 1, stride]).  Returns (planes, mask)
    where mask (bool, same nested shape) says "pair was swapped"."""
    N = planes[0].shape[0]
    r = [p.reshape(N // (2 * stride), 2, stride) for p in planes]
    lo = [p[:, 0, :] for p in r]
    hi = [p[:, 1, :] for p in r]
    swap = _gt(lo, hi, nk) == up_mask  # ascending: swap when lo > hi
    out = []
    for l, h in zip(lo, hi):
        nl = jnp.where(swap, h, l)
        nh = jnp.where(swap, l, h)
        out.append(jnp.stack([nl, nh], axis=1).reshape(N))
    return out, (swap if record else None)


def _apply_mask(planes, stride: int, swap):
    """Replay (or reverse-replay) a recorded exchange: swap where masked."""
    N = planes[0].shape[0]
    out = []
    for p in planes:
        r = p.reshape(N // (2 * stride), 2, stride)
        lo, hi = r[:, 0, :], r[:, 1, :]
        nl = jnp.where(swap, hi, lo)
        nh = jnp.where(swap, lo, hi)
        out.append(jnp.stack([nl, nh], axis=1).reshape(N))
    return out


def sort_planes(planes: Sequence[jax.Array], nk: int, record: bool = False):
    """Full ascending bitonic sort.  Returns (planes, trace).

    trace is a list of (stride, mask) usable with replay() when
    record=True, else None."""
    planes = list(planes)
    N = planes[0].shape[0]
    assert N & (N - 1) == 0, "length must be a power of two"
    trace = [] if record else None
    size = 2
    while size <= N:
        # direction alternates per size-block: ascending iff (i & size)==0
        stride = size // 2
        while stride >= 1:
            n_pairs = N // (2 * stride)
            pair_base = jnp.arange(n_pairs, dtype=I32) * (2 * stride)
            up = ((pair_base & size) == 0)[:, None]
            planes, m = _exchange(planes, stride, up, record, nk)
            if record:
                trace.append((stride, m))
            stride //= 2
        size *= 2
    return planes, trace


def merge_planes(planes_a, planes_b, nk: int, record: bool = False):
    """Merge two ascending-sorted runs (equal power-of-two lengths OK,
    unequal allowed if total is a power of two).  planes_b is reversed
    to form a bitonic sequence, then log2(N) merge passes run.

    Returns (planes, trace); with record=True, replay(trace) restores
    the layout the passes started on: [a; reversed(b)] - slice
    [:len_a] / [len_a:][::-1] to recover a / b."""
    planes_a = list(planes_a)
    planes_b = list(planes_b)
    N = planes_a[0].shape[0] + planes_b[0].shape[0]
    assert N & (N - 1) == 0, "total length must be a power of two"
    trace = [] if record else None
    planes = [jnp.concatenate([a, b[::-1]]) for a, b in zip(planes_a, planes_b)]
    stride = N // 2
    while stride >= 1:
        up = jnp.ones((N // (2 * stride), 1), bool)
        planes, m = _exchange(planes, stride, up, record, nk)
        if record:
            trace.append((stride, m))
        stride //= 2
    return planes, trace


def replay(planes, trace):
    """Undo a recorded sort/merge: apply masks in reverse order.

    After replaying a merge trace, slice [:len_a] / [len_a:][::-1] to
    recover the original a / b layouts."""
    for stride, m in reversed(trace):
        planes = _apply_mask(planes, stride, m)
    return planes


def compact_planes(planes: Sequence[jax.Array], valid: jax.Array,
                   fill: Sequence[int] | None = None):
    """Move surviving records left, preserving order, in log2(N) dense
    passes (monotone butterfly; see module docstring).  Vacated slots
    get `fill` values (default all-ones).  Returns (planes, count)."""
    planes = list(planes)
    N = planes[0].shape[0]
    # any N works: the passes are shift+where (no pow2 reshapes), and
    # while b < N covers every bit of d (d <= N, and the top bit of any
    # d < 2*floor_pow2(N) is reached since floor_pow2(N) < N for the
    # non-pow2 case) - needed by the asymmetric sorted merges, whose
    # concatenated capacity (e.g. 8M + 1M) is not a power of two
    if fill is None:
        fill = [0xFFFFFFFF] * len(planes)
    # d_i = number of dropped records strictly before i (non-decreasing,
    # unit steps); survivors move left by d_i, one bit per pass
    d = jnp.cumsum((~valid).astype(I32)) - (~valid).astype(I32)
    count = jnp.sum(valid.astype(I32))
    v = valid
    b = 1
    while b < N:
        # receiver at p takes the record from p + b if that record is
        # valid and has bit b set; keeps its own if valid and bit clear
        def shifted(x, fillv):
            return jnp.concatenate([x[b:], jnp.full((b,), fillv, x.dtype)])
        d_s = shifted(d, 0)
        v_s = shifted(v.astype(U32), 0).astype(bool)
        take = v_s & ((d_s & b) != 0)
        keep = v & ((d & b) == 0)
        planes = [
            jnp.where(take, shifted(p, f), jnp.where(keep, p, U32(f)))
            for p, f in zip(planes, fill)
        ]
        d = jnp.where(take, d_s, d)  # bit b now consumed for movers
        v = take | keep
        b *= 2
    return planes, count


def pack64(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def split64(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return (x >> jnp.uint64(32)).astype(U32), (x & jnp.uint64(0xFFFFFFFF)).astype(U32)
