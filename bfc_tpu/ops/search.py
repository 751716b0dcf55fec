"""Lockstep vectorized best-first spectrum search (the correction core).

TPU-native recast of bfc_ec1dir (/root/reference/correct.c:249-386): a
whole batch of reads runs the penalty-ordered search simultaneously,
one heap operation per read per step, with per-read active masks
instead of data-dependent control flow.  The binary-heap arithmetic
replicates ks_heapup/ks_heapdown (/root/reference/ksort.h:125-146)
exactly - including tie behavior (new/equal elements rise, heapdown
prefers the left child on ties) - because the reference's output
depends on structural tie-breaking among equal penalties.

Fixed capacities (heap 128 >= the reference's ~104 reachable maximum
given the max_heap=100 explosion guard at correct.c:349; stack/iter
caps are config) with per-read overflow flags; overflowed reads are
re-run on the scalar host model by the driver.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import kmer as kops
from . import spectrum as spec

I32 = jnp.int32
U64 = jnp.uint64
BIG = jnp.int32(1 << 30)
HEAP_LEVELS = 7  # ceil(log2(heap_cap)); heap_cap fixed at 128


class SearchConfig(NamedTuple):
    """Static search parameters (mirrors the bfc_opt_t search fields)."""

    k: int
    min_cov: int
    win_multi_ec: int
    max_end_ext: int
    w_ec: int
    w_ec_high: int
    w_absent: int
    w_absent_high: int
    max_path_diff: int
    max_heap: int
    heap_cap: int
    stack_cap: int
    iter_cap: int
    s_bits: int
    l_pre: int
    kb_bits: int


class State(NamedTuple):
    # heap entries (echeap1_t: correct.c:153-160)
    hp_pen: jax.Array   # i32 [B,H]
    hp_i: jax.Array     # i32 [B,H]
    hp_k: jax.Array     # i32 [B,H] stack back-pointer
    hp_eph: jax.Array   # i32 [B,H,2] last high-quality correction positions
    hp_ep: jax.Array    # i32 [B,H,5] last correction positions
    hp_x0: jax.Array    # u64 [B,H] k-mer planes
    hp_x1: jax.Array
    hp_x2: jax.Array
    hp_x3: jax.Array
    heap_n: jax.Array   # i32 [B]
    # stack entries (ecstack1_t: correct.c:162-167)
    st_parent: jax.Array  # i32 [B,S]
    st_i: jax.Array       # i32 [B,S]
    st_b: jax.Array       # i32 [B,S]
    st_flags: jax.Array   # i32 [B,S]: ec | ec_high<<1 | absent<<2 | absent_high<<3
    st_tot: jax.Array     # i32 [B,S]
    st_n: jax.Array       # i32 [B]
    # per-read search registers
    min_path_pen: jax.Array  # i32 [B]
    min_path_k: jax.Array    # i32 [B] stack index of current best stopped path
    n_paths: jax.Array       # i32 [B]
    n_failures: jax.Array    # i32 [B]
    rv: jax.Array            # i32 [B]: -1/-2/-3 failure codes (valid when done)
    done: jax.Array          # bool [B]
    overflow: jax.Array      # bool [B]
    max_heap: jax.Array      # i32 [B]
    it: jax.Array            # i32 scalar


def _rows(B):
    return jnp.arange(B)


def _hgather(st: State, pos):
    """Gather full heap entries at per-read positions pos [B]."""
    B = pos.shape[0]
    r = _rows(B)
    return dict(
        pen=st.hp_pen[r, pos], i=st.hp_i[r, pos], k=st.hp_k[r, pos],
        eph=st.hp_eph[r, pos, :], ep=st.hp_ep[r, pos, :],
        x0=st.hp_x0[r, pos], x1=st.hp_x1[r, pos], x2=st.hp_x2[r, pos],
        x3=st.hp_x3[r, pos],
    )


def _hscatter(st: State, pos, e, mask):
    """Write heap entry e at pos where mask (dropped elsewhere)."""
    B = pos.shape[0]
    r = _rows(B)
    H = st.hp_pen.shape[1]
    p = jnp.where(mask, pos, H + 1)
    return st._replace(
        hp_pen=st.hp_pen.at[r, p].set(e["pen"], mode="drop"),
        hp_i=st.hp_i.at[r, p].set(e["i"], mode="drop"),
        hp_k=st.hp_k.at[r, p].set(e["k"], mode="drop"),
        hp_eph=st.hp_eph.at[r, p, :].set(e["eph"], mode="drop"),
        hp_ep=st.hp_ep.at[r, p, :].set(e["ep"], mode="drop"),
        hp_x0=st.hp_x0.at[r, p].set(e["x0"], mode="drop"),
        hp_x1=st.hp_x1.at[r, p].set(e["x1"], mode="drop"),
        hp_x2=st.hp_x2.at[r, p].set(e["x2"], mode="drop"),
        hp_x3=st.hp_x3.at[r, p].set(e["x3"], mode="drop"),
    )


def _hcopy(st: State, src, dst, mask):
    """Copy heap entry src -> dst per read where mask."""
    return _hscatter(st, dst, _hgather(st, src), mask)


def heap_push(st: State, e, mask) -> State:
    """ks_heapup insert (ksort.h:137-146): new entries rise past ties."""
    pos = jnp.where(mask, st.heap_n, 0)
    k = pos
    sifting = mask
    for _ in range(HEAP_LEVELS):
        parent = jnp.maximum((k - 1) >> 1, 0)
        par_pen = st.hp_pen[_rows(k.shape[0]), parent]
        move = sifting & (k > 0) & (e["pen"] <= par_pen)
        st = _hcopy(st, parent, k, move)
        k = jnp.where(move, parent, k)
        sifting = move
    st = _hscatter(st, k, e, mask)
    return st._replace(heap_n=st.heap_n + mask.astype(I32))


def heap_pop(st: State, mask):
    """Pop the root; sift the last element down (ksort.h:125-136)."""
    B = st.heap_n.shape[0]
    r = _rows(B)
    root = _hgather(st, jnp.zeros((B,), I32))
    n2 = jnp.where(mask, st.heap_n - 1, st.heap_n)
    last = _hgather(st, jnp.maximum(n2, 0))
    st = st._replace(heap_n=n2)
    # place `last` from the root downward
    i = jnp.zeros((B,), I32)
    sifting = mask & (n2 > 0)
    for _ in range(HEAP_LEVELS):
        child = 2 * i + 1
        act = sifting & (child < n2)
        childc = jnp.minimum(child, jnp.maximum(n2 - 1, 0))
        right = st.hp_pen[r, jnp.minimum(childc + 1, jnp.maximum(n2 - 1, 0))]
        pick_right = act & (child != n2 - 1) & (st.hp_pen[r, childc] > right)
        c = jnp.where(pick_right, childc + 1, childc)
        c_pen = st.hp_pen[r, c]
        cont = act & ~(c_pen > last["pen"])
        st = _hcopy(st, c, i, cont)
        i = jnp.where(cont, c, i)
        sifting = cont
    st = _hscatter(st, i, last, mask & (n2 > 0))
    return st, root


def _sscatter(st: State, pos, mask, parent, i, b, flags, tot):
    B = pos.shape[0]
    r = _rows(B)
    S = st.st_parent.shape[1]
    p = jnp.where(mask, jnp.minimum(pos, S - 1), S + 1)
    return st._replace(
        st_parent=st.st_parent.at[r, p].set(parent, mode="drop"),
        st_i=st.st_i.at[r, p].set(i, mode="drop"),
        st_b=st.st_b.at[r, p].set(b, mode="drop"),
        st_flags=st.st_flags.at[r, p].set(flags, mode="drop"),
        st_tot=st.st_tot.at[r, p].set(tot, mode="drop"),
    )


def _weighted(cfg: SearchConfig, ec, ec_high, absent, absent_high):
    return (
        cfg.w_ec * ec.astype(I32)
        + cfg.w_ec_high * ec_high.astype(I32)
        + cfg.w_absent * absent.astype(I32)
        + cfg.w_absent_high * absent_high.astype(I32)
    )


def buf_update(st: State, cfg: SearchConfig, z, mask, b, pen_ec, pen_ec_high,
               pen_absent, pen_absent_high) -> State:
    """Push one branch: stack append + heap insert (correct.c:198-230)."""
    tot = z["pen"] + _weighted(cfg, pen_ec, pen_ec_high, pen_absent, pen_absent_high)
    flags = (
        pen_ec.astype(I32)
        | (pen_ec_high.astype(I32) << 1)
        | (pen_absent.astype(I32) << 2)
        | (pen_absent_high.astype(I32) << 3)
    )
    over = mask & (st.st_n >= cfg.stack_cap)
    mask = mask & ~over
    st = _sscatter(st, st.st_n, mask, z["k"], z["i"], b, flags, tot)
    new_k = st.st_n
    st = st._replace(
        st_n=st.st_n + mask.astype(I32),
        overflow=st.overflow | over,
        done=st.done | over,
    )
    x0, x1, x2, x3 = kops.append_base(z["x0"], z["x1"], z["x2"], z["x3"], b, cfg.k)
    eph = jnp.where(
        pen_ec_high[:, None],
        jnp.concatenate([z["i"][:, None], z["eph"][:, :-1]], axis=1),
        z["eph"],
    )
    ep = jnp.where(
        pen_ec[:, None],
        jnp.concatenate([z["i"][:, None], z["ep"][:, :-1]], axis=1),
        z["ep"],
    )
    e = dict(pen=tot, i=z["i"] + 1, k=new_k, eph=eph, ep=ep,
             x0=x0, x1=x1, x2=x2, x3=x3)
    over2 = mask & (st.heap_n >= cfg.heap_cap)
    mask = mask & ~over2
    st = st._replace(overflow=st.overflow | over2, done=st.done | over2)
    return heap_push(st, e, mask)


def _occ_of(table: spec.Table, cfg: SearchConfig, x0, x1, x2, x3):
    """Batched spectrum lookup from 4-plane k-mer states."""
    _, h0, h1 = kops.canonical_hash(x0, x1, x2, x3, cfg.k)
    q_shard, q_kb = kops.shard_and_keybody(h0, h1, cfg.k, cfg.l_pre)
    return spec.table_lookup(table, q_shard, q_kb, cfg.s_bits, cfg.l_pre, cfg.kb_bits)


@functools.partial(jax.jit, static_argnames=("cfg", "debug"))
def ec1dir_batch(
    table: spec.Table,
    cfg: SearchConfig,
    seq_b,      # u8  [B,L] current bases (greedy fix applied)
    seq_q,      # bool [B,L] quality flag
    seq_oq,     # bool [B,L] original quality flag
    lcov,       # i32 [B,L]
    hcov,       # i32 [B,L]
    lens,       # i32 [B]
    start,      # i32 [B]
    active_in,  # bool [B] which reads participate
    debug: bool = False,
):
    """One direction of the batched best-first search.

    Returns (ec_b u8 [B,L], n_absent i32 [B], status i32 [B], max_heap
    i32 [B], overflow bool [B]); status: 0 ok, -1/-2/-3 reference
    failure codes (correct.c:277-280,288,342-347)."""
    B, L = seq_b.shape
    H, S = cfg.heap_cap, cfg.stack_cap
    k = cfg.k
    end = lens  # the search end is always the read length (correct.c:425,430)
    r = _rows(B)

    # ---- initial state: first k-1 valid bases rolled in (correct.c:260-266)
    idx = jnp.arange(L)
    is_n = (seq_b > 3) | (idx[None, :] >= lens[:, None])
    pos_if_n = jnp.where(is_n | (idx[None, :] < start[:, None]), idx[None, :], -1)
    last_bad = jax.lax.associative_scan(
        jnp.maximum, jnp.where(idx[None, :] >= start[:, None], pos_if_n, idx[None, :]),
        axis=-1,
    )
    run = idx[None, :] - last_bad
    ok = (run >= k) & (idx[None, :] < end[:, None])
    init_i = jnp.argmax(ok, axis=-1).astype(I32)  # first position with run >= k
    have = jnp.any(ok, axis=-1)
    active = active_in & have
    # planes of the k-1 bases before init_i, as k-bit append-state.
    # The forward planes are the (k-1)-bit suffix of the backward window
    # pack; the RC planes are the bit-reversed backward pack of the
    # complement bits (bit 0 zeroed: only k-1 bases are rolled in).
    # kmer_planes' own RC planes cannot be used here - they are only
    # defined for full k-windows (positions >= k-1).
    lo = (seq_b & 1).astype(U64)
    hi = ((seq_b >> 1) & 1).astype(U64)
    bw_lo = kops.window_pack_backward(lo, k)
    bw_hi = kops.window_pack_backward(hi, k)
    bw_clo = kops.window_pack_backward(lo ^ U64(1), k)
    bw_chi = kops.window_pack_backward(hi ^ U64(1), k)
    prev = jnp.maximum(init_i - 1, 0)
    maskk1 = U64((1 << (k - 1)) - 1)
    zx0 = bw_lo[r, prev] & maskk1
    zx1 = bw_hi[r, prev] & maskk1
    zx2 = kops.reverse_k(bw_clo[r, prev], k) & ~U64(1)
    zx3 = kops.reverse_k(bw_chi[r, prev], k) & ~U64(1)

    st = State(
        hp_pen=jnp.zeros((B, H), I32), hp_i=jnp.zeros((B, H), I32),
        hp_k=jnp.zeros((B, H), I32),
        hp_eph=jnp.zeros((B, H, 2), I32), hp_ep=jnp.zeros((B, H, 5), I32),
        hp_x0=jnp.zeros((B, H), U64), hp_x1=jnp.zeros((B, H), U64),
        hp_x2=jnp.zeros((B, H), U64), hp_x3=jnp.zeros((B, H), U64),
        heap_n=jnp.zeros((B,), I32),
        st_parent=jnp.zeros((B, S), I32), st_i=jnp.zeros((B, S), I32),
        st_b=jnp.zeros((B, S), I32), st_flags=jnp.zeros((B, S), I32),
        st_tot=jnp.zeros((B, S), I32), st_n=jnp.zeros((B,), I32),
        min_path_pen=jnp.full((B,), BIG, I32),
        min_path_k=jnp.full((B,), -1, I32),
        n_paths=jnp.zeros((B,), I32),
        n_failures=jnp.zeros((B,), I32),
        rv=jnp.full((B,), -1, I32),
        done=~active,
        overflow=jnp.zeros((B,), bool),
        max_heap=jnp.zeros((B,), I32),
        it=jnp.zeros((), I32),
    )
    init = dict(
        pen=jnp.zeros((B,), I32), i=init_i, k=jnp.full((B,), -1, I32),
        eph=jnp.full((B, 2), -1, I32), ep=jnp.full((B, 5), -1, I32),
        x0=zx0, x1=zx1, x2=zx2, x3=zx3,
    )
    st = heap_push(st, init, active)

    def body(st: State) -> State:
        act = ~st.done
        # max_heap bookkeeping (correct.c:276)
        st = st._replace(
            max_heap=jnp.where(
                act, jnp.minimum(jnp.maximum(st.max_heap, st.heap_n), 255),
                st.max_heap,
            )
        )
        # empty heap: uncorrectable N (correct.c:277-280)
        empty = act & (st.heap_n == 0)
        st = st._replace(rv=jnp.where(empty, -2, st.rv), done=st.done | empty)
        act = act & ~empty
        st, z = heap_pop(st, act)
        # give up when past the best path by max_path_diff (correct.c:288)
        brk = act & (st.min_path_k >= 0) & (
            z["pen"] > st.min_path_pen + cfg.max_path_diff
        )
        st = st._replace(done=st.done | brk)
        act = act & ~brk
        early_stop = z["i"] - end > cfg.max_end_ext
        ext = act & ~early_stop

        # ---- candidate generation (correct.c:291-341)
        zi = z["i"]
        zic = jnp.minimum(zi, L - 1)
        c_none = zi >= lens
        c_b = jnp.where(c_none, 4, seq_b[r, zic].astype(I32))
        c_q = ~c_none & seq_q[r, zic]
        c_oq = ~c_none & seq_oq[r, zic]
        c_lcov = jnp.where(c_none, 0, lcov[r, zic])
        c_hcov = jnp.where(c_none, 0, hcov[r, zic])
        # all four one-base extensions, hashed and looked up at once
        occ = []
        for b in range(4):
            nx = kops.append_base(z["x0"], z["x1"], z["x2"], z["x3"],
                                  jnp.full((B,), b, I32), k)
            occ.append(_occ_of(table, cfg, *nx))
        occ = jnp.stack(occ, axis=1)  # i32 [B,4]
        cb_ok = ~c_none & (c_b < 4)
        os = jnp.where(cb_ok, occ[r, jnp.minimum(c_b, 3)], -1)
        os_cnt = os & 0xFF          # NB: os==-1 reads as 255 (correct.c:300 quirk)
        os_high = (os >> 8) & 0xFF
        fixed = (zi > end) | (
            cb_ok
            & (
                (c_q & (os_cnt >= cfg.min_cov + 1) & (c_lcov >= cfg.min_cov + 1))
                | (c_hcov > k * 3 // 4)  # hcov > k*.75 with integer hcov
            )
        )
        # clustered-correction windows (correct.c:316-317)
        eph_old = z["eph"][:, -1]
        ep_old = z["ep"][:, -1]
        win_block = (~c_none) & (
            (c_q & (eph_old >= 0) & (zi - eph_old < cfg.win_multi_ec))
            | ((ep_old >= 0) & (zi - ep_old < cfg.win_multi_ec))
        )
        valid = []
        pens = []
        for b in range(4):
            is_keep = ~c_none & (b == c_b)
            s_occ = occ[:, b]
            solid = (s_occ >= 0) & ((s_occ & 0xFF) >= cfg.min_cov)
            branch_ok = (
                ~(fixed & ~c_none & (b != c_b))
                & ~win_block
                & solid
            )
            p_ec = jnp.where(is_keep, False, cb_ok)
            p_ech = p_ec & c_oq
            p_abs = jnp.where(
                is_keep, (os < 0) | ((os & 0xFF) < cfg.min_cov), False
            )
            p_absh = jnp.where(
                is_keep,
                (os < 0) | (((os >> 8) & 0xFF) < cfg.min_cov),
                ((s_occ >> 8) & 0xFF) < cfg.min_cov,
            )
            valid.append(jnp.where(is_keep, True, branch_ok))
            pens.append((p_ec, p_ech, p_abs, p_absh))
        valid = jnp.stack(valid, axis=1)  # [B,4]
        keep_col = (~c_none)[:, None] & (jnp.arange(4)[None, :] == c_b[:, None])
        other_ext = jnp.sum((valid & ~keep_col).astype(I32), axis=1)
        n_added = jnp.sum(valid.astype(I32), axis=1)

        failed = ext & (~fixed) & (other_ext == 0)
        n_failures = st.n_failures + failed.astype(I32)
        give_up = ext & (n_failures > lens * 2)
        st = st._replace(
            n_failures=n_failures,
            rv=jnp.where(give_up, -3, st.rv),
            done=st.done | give_up,
        )
        ext = ext & ~give_up

        add_cond = ext & (~c_none | (n_added == 1))
        # heap-explosion guard (correct.c:349-356): push only the min-
        # penalty branch; first minimum wins on ties
        guard = add_cond & (n_added > 1) & (st.heap_n > cfg.max_heap)
        wp = jnp.stack(
            [_weighted(cfg, *pens[b]) for b in range(4)], axis=1
        )
        wp_masked = jnp.where(valid, wp, BIG)
        winner = jnp.argmin(wp_masked, axis=1).astype(I32)
        for b in range(4):
            push_b = add_cond & valid[:, b] & (~guard | (winner == b))
            st = buf_update(
                st, cfg, z, push_b, jnp.full((B,), b, I32), *pens[b]
            )
        # dead end past the read (correct.c:361-363)
        dead = ext & ~add_cond
        dead_pen = dead & (n_added == 0)
        zk = jnp.where(dead_pen, z["k"], S + 1)
        st = st._replace(
            st_tot=st.st_tot.at[r, zk].add(
                cfg.w_absent * (cfg.max_end_ext - (z["i"] - end)), mode="drop"
            )
        )
        stop = (act & early_stop) | dead
        # record stopped path (correct.c:366-371)
        zkc = jnp.maximum(z["k"], 0)
        stop_pen = st.st_tot[r, zkc]
        better = stop & (stop_pen < st.min_path_pen)
        st = st._replace(
            min_path_pen=jnp.where(better, stop_pen, st.min_path_pen),
            min_path_k=jnp.where(better, z["k"], st.min_path_k),
            n_paths=st.n_paths + stop.astype(I32),
        )
        full = st.n_paths >= 4
        st = st._replace(done=st.done | (stop & full), it=st.it + 1)
        iter_over = (st.it >= cfg.iter_cap) & ~st.done
        st = st._replace(
            overflow=st.overflow | iter_over, done=st.done | iter_over
        )
        return st

    st = jax.lax.while_loop(lambda s: ~jnp.all(s.done), body, st)

    # ---- backtrack the best stopped path (correct.c:232-247,374-379)
    success = active & (st.n_paths > 0) & ~st.overflow
    ec_b = seq_b.astype(I32)
    n_absent = jnp.zeros((B,), I32)
    cur = jnp.where(success, st.min_path_k, -1)

    def bt_cond(c):
        cur, ec_b, n_absent = c
        return jnp.any(cur >= 0)

    def bt_body(c):
        cur, ec_b, n_absent = c
        m = cur >= 0
        curc = jnp.maximum(cur, 0)
        ni = st.st_i[r, curc]
        nb = st.st_b[r, curc]
        nfl = st.st_flags[r, curc]
        write = m & (ni < lens)
        wi = jnp.where(write, ni, L + 1)
        ec_b = ec_b.at[r, wi].set(nb, mode="drop")
        n_absent = n_absent + jnp.where(write, (nfl >> 2) & 1, 0)
        cur = jnp.where(m, st.st_parent[r, curc], cur)
        return cur, ec_b, n_absent

    cur, ec_b, n_absent = jax.lax.while_loop(bt_cond, bt_body, (cur, ec_b, n_absent))
    # mask the region this pass is not responsible for (correct.c:378-379)
    ec_b = jnp.where(
        (idx[None, :] < start[:, None] + k) | (idx[None, :] >= end[:, None]),
        4, ec_b,
    )
    status = jnp.where(success, 0, st.rv)
    status = jnp.where(active & ~have, -2, status)  # no k valid bases: like uncorrectable
    out = (
        ec_b.astype(jnp.uint8),
        n_absent,
        status,
        st.max_heap,
        st.overflow & active,
    )
    if debug:
        return out + (st,)
    return out
