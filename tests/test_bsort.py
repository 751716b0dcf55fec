"""Dense bitonic sort/merge/compact engine (ops/bsort.py) unit tests.

The engine is the gather-free primitive underneath device-resident
counting: correctness here is plain "matches numpy sort/merge",
plus the trace-replay identity that merge-lookup relies on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bfc_tpu.ops import bsort


def _np(planes):
    return [np.asarray(p) for p in planes]


def _rand_planes(rng, n, nplanes, bits=32):
    hi = (1 << bits) - 1 if bits < 32 else 0xFFFFFFFF
    return [
        jnp.asarray(rng.integers(0, hi, size=n, dtype=np.uint32))
        for _ in range(nplanes)
    ]


def _lex_order(planes, nk):
    cols = _np(planes[:nk])
    return np.lexsort(tuple(reversed(cols)))  # plane 0 most significant


@pytest.mark.parametrize("n,nk,npl", [(256, 1, 1), (1024, 2, 3), (64, 2, 2)])
def test_sort_matches_numpy(n, nk, npl):
    rng = np.random.default_rng(7 + n)
    planes = _rand_planes(rng, n, npl)
    out, trace = bsort.sort_planes(planes, nk=nk, record=True)
    order = _lex_order(planes, nk)
    for i in range(npl):
        # bitonic sort is not stable; compare full records via the same
        # sorted multiset per key when payloads ride along
        pass
    # keys must match numpy-sorted keys
    key_sorted = np.sort(
        np.asarray(bsort.pack64(planes[0], planes[1]) if nk == 2 else planes[0])
    )
    got = np.asarray(
        bsort.pack64(out[0], out[1]) if nk == 2 else out[0]
    )
    np.testing.assert_array_equal(got, key_sorted)
    # payload planes must travel with their keys (check as multiset of
    # full records)
    rec_in = np.stack(_np(planes), axis=1)
    rec_out = np.stack(_np(out), axis=1)
    np.testing.assert_array_equal(
        rec_in[np.lexsort(rec_in.T[::-1])], rec_out[np.lexsort(rec_out.T[::-1])]
    )
    # replay restores the original layout exactly
    back = bsort.replay(out, trace)
    for a, b in zip(back, planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("na,nb", [(512, 512), (1024, 1024), (768, 256)])
def test_merge_matches_numpy(na, nb):
    rng = np.random.default_rng(na * 31 + nb)
    a = [jnp.asarray(np.sort(rng.integers(0, 2**32, na, dtype=np.uint32)))]
    b = [jnp.asarray(np.sort(rng.integers(0, 2**32, nb, dtype=np.uint32)))]
    a.append(jnp.asarray(rng.integers(0, 2**32, na, dtype=np.uint32)))
    b.append(jnp.asarray(rng.integers(0, 2**32, nb, dtype=np.uint32)))
    out, trace = bsort.merge_planes(a, b, nk=1, record=True)
    merged = np.sort(np.concatenate([np.asarray(a[0]), np.asarray(b[0])]))
    np.testing.assert_array_equal(np.asarray(out[0]), merged)
    # replay restores the [a; b_reversed] layout the passes started on
    back = bsort.replay(out, trace)
    for i in range(2):
        np.testing.assert_array_equal(np.asarray(back[i][:na]), np.asarray(a[i]))
        np.testing.assert_array_equal(
            np.asarray(back[i][na:][::-1]), np.asarray(b[i])
        )


def test_merge_lookup_roundtrip():
    """The merge-lookup pattern: sorted table + unsorted queries ->
    per-query payload of the greatest table key <= query key (here:
    exact-match payload), restored to query order via replay."""
    rng = np.random.default_rng(99)
    tab_keys = np.unique(rng.integers(0, 2**20, 3000, dtype=np.uint32))[:2048]
    assert len(tab_keys) == 2048
    tab_pay = rng.integers(1, 2**31, len(tab_keys), dtype=np.uint32)
    # queries: half hits, half misses
    q = np.concatenate(
        [
            rng.choice(tab_keys, 1024),
            rng.integers(0, 2**20, 1024, dtype=np.uint32),
        ]
    ).astype(np.uint32)
    rng.shuffle(q)
    # sort queries with trace
    qs, qtrace = bsort.sort_planes([jnp.asarray(q)], nk=1, record=True)
    # merge queries into table with a tie-break plane (table=0 sorts
    # before query=1 at equal keys); queries carry payload 0
    merged, mtrace = bsort.merge_planes(
        [jnp.asarray(tab_keys), jnp.zeros(2048, jnp.uint32), jnp.asarray(tab_pay)],
        [qs[0], jnp.ones(2048, jnp.uint32), jnp.zeros(2048, jnp.uint32)],
        nk=2,
        record=True,
    )
    # forward-fill table payloads down to following query rows with equal key
    keys, isq, pay = merged
    istab = jnp.uint32(1) - isq
    n = keys.shape[0]
    fill_key = jnp.where(istab == 1, keys, jnp.uint32(0xFFFFFFFF))
    fill_pay = jnp.where(istab == 1, pay, jnp.uint32(0))
    # log-pass forward fill (max-scan of (key,pay) pairs where key valid)
    carry_k, carry_p = fill_key, fill_pay
    sh = 1
    while sh < n:
        pk = jnp.concatenate([jnp.full((sh,), 0xFFFFFFFF, jnp.uint32), carry_k[:-sh]])
        pp = jnp.concatenate([jnp.zeros((sh,), jnp.uint32), carry_p[:-sh]])
        take = carry_k == jnp.uint32(0xFFFFFFFF)
        carry_k = jnp.where(take, pk, carry_k)
        carry_p = jnp.where(take, pp, carry_p)
        sh *= 2
    hit = (istab == 0) & (carry_k == keys)
    result = jnp.where(hit, carry_p, jnp.uint32(0))
    # replay merge, slice out query half, replay query sort
    back = bsort.replay([keys, result], mtrace)
    q_res = [p[2048:][::-1] for p in back]  # b half, un-reversed
    q_back = bsort.replay([qs[0], q_res[1]], qtrace)
    np.testing.assert_array_equal(np.asarray(q_back[0]), q)
    # expected
    lut = dict(zip(tab_keys.tolist(), tab_pay.tolist()))
    exp = np.array([lut.get(int(x), 0) for x in q], dtype=np.uint32)
    np.testing.assert_array_equal(np.asarray(q_back[1]), exp)


@pytest.mark.parametrize("n,frac", [(256, 0.3), (1024, 0.9), (512, 0.0), (512, 1.0)])
def test_compact(n, frac):
    rng = np.random.default_rng(int(n * 7 + frac * 100))
    keys = np.sort(rng.integers(0, 2**31, n, dtype=np.uint32))
    pay = rng.integers(0, 2**32, n, dtype=np.uint32)
    valid = rng.random(n) >= frac
    out, count = bsort.compact_planes(
        [jnp.asarray(keys), jnp.asarray(pay)], jnp.asarray(valid)
    )
    k = int(count)
    assert k == int(valid.sum())
    np.testing.assert_array_equal(np.asarray(out[0][:k]), keys[valid])
    np.testing.assert_array_equal(np.asarray(out[1][:k]), pay[valid])
    np.testing.assert_array_equal(
        np.asarray(out[0][k:]), np.full(n - k, 0xFFFFFFFF, np.uint32)
    )
