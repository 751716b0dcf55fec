"""Batched device correction driver (the TPU correction pass).

Orchestrates the vectorized pipeline per read batch: conversion +
many-N gate -> coverage annotation -> best solid island (greedy
fallback) -> two-direction lockstep best-first search -> merge ->
output re-encoding.  Mirrors bfc_ec1 (/root/reference/correct.c:388-472)
read-for-read; reads that overflow the fixed device search capacities
are re-run on the exact scalar model (bfc_tpu.models.refmodel).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..opts import Opts
from ..ops import annotate as ann
from ..ops import kmer as kops
from ..ops import search as srch
from . import refmodel as M
from .counter import DeviceSpectrum

I32 = jnp.int32

ECCODE_MISC = 1
ECCODE_MANY_N = 2
ECCODE_NO_SOLID = 3
ECCODE_UNCORR_N = 4
ECCODE_MANY_FAIL = 5


def make_config(opt: Opts, ds: DeviceSpectrum, stack_cap: int = 2048,
                iter_cap: int = 2048) -> srch.SearchConfig:
    return srch.SearchConfig(
        k=opt.k, min_cov=opt.min_cov, win_multi_ec=opt.win_multi_ec,
        max_end_ext=opt.max_end_ext, w_ec=opt.w_ec, w_ec_high=opt.w_ec_high,
        w_absent=opt.w_absent, w_absent_high=opt.w_absent_high,
        max_path_diff=opt.max_path_diff, max_heap=opt.max_heap,
        heap_cap=128, stack_cap=stack_cap, iter_cap=iter_cap,
        s_bits=ds.s_bits, l_pre=ds.l_pre, kb_bits=ds.kb_bits,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def correct_core(table, cfg: srch.SearchConfig, seq_b, seq_q, lens, mode):
    """Device correction of one batch.

    seq_b: u8 [B,L] converted bases (refine substitution already applied
    by the host); seq_q: bool [B,L] quality flags; mode: i32 scalar
    coverage peak.  Returns a dict of per-read outputs."""
    B, L = seq_b.shape
    k = cfg.k
    r = jnp.arange(B)
    idx = jnp.arange(L)
    inb = idx[None, :] < lens[:, None]
    ob = seq_b  # conversion sets b == ob (correct.c:31)

    # many-N gate (correct.c:397-401); float64 to match the C double test
    n_n = jnp.sum((ob > 3) & inb, axis=1)
    many_n = n_n.astype(jnp.float64) > lens.astype(jnp.float64) * 0.05

    solid_end, high_end, lcov, hcov, _ = ann.kcov_batch(
        table, seq_b, lens, k, cfg.l_pre, cfg.s_bits, cfg.kb_bits, cfg.min_cov
    )
    isl_start, isl_end, isl_found = ann.best_island_batch(solid_end, lens, k)

    # ---- greedy fallback for reads with no solid k-mer (correct.c:406-421)
    need_greedy = ~many_n & ~isl_found
    g_start = jnp.zeros((B,), I32)
    g_ec = jnp.full((B,), -1, I32)
    g_end = jnp.zeros((B,), I32)
    g_active = need_greedy

    def g_cond(c):
        return jnp.any(c[0])

    def g_body(c):
        g_active, g_start, g_ec, g_end = c
        end_pos, x0, x1, x2, x3, found = ann.first_kmer_batch(seq_b, lens, g_start, k)
        ec = ann.greedy_k_batch(
            table, x0, x1, x2, x3, mode, k, cfg.l_pre, cfg.s_bits, cfg.kb_bits
        )
        ec = jnp.where(found, ec, -1)
        hit = g_active & found & (ec >= 0)
        g_ec = jnp.where(hit, ec, g_ec)
        g_end = jnp.where(g_active, end_pos, g_end)
        stop = g_active & (~found | hit | (end_pos + (k >> 1) >= lens))
        g_start = jnp.where(g_active & ~stop, end_pos - (k >> 1), g_start)
        return g_active & ~stop, g_start, g_ec, g_end

    g_active, g_start, g_ec, g_end = jax.lax.while_loop(
        g_cond, g_body, (g_active, g_start, g_ec, g_end)
    )
    greedy_ok = need_greedy & (g_ec >= 0)
    no_solid = need_greedy & ~greedy_ok
    # apply the greedy fix: seq[end - (ec>>2)].b = ec&3 (correct.c:415)
    fix_pos = jnp.where(greedy_ok, g_end - (g_ec >> 2), L + 1)
    seq_fix = seq_b.at[r, fix_pos].set(
        (jnp.maximum(g_ec, 0) & 3).astype(seq_b.dtype), mode="drop"
    )
    start = jnp.where(greedy_ok, g_end + 1 - k, isl_start)
    end = jnp.where(greedy_ok, g_end + 1, isl_end)

    searchable = ~many_n & ~no_solid
    # ---- forward direction over [start, n)
    ec0, na0, rv0, mh0, ov0 = srch.ec1dir_batch(
        table, cfg, seq_fix, seq_q, seq_q, lcov, hcov, lens, start, searchable
    )
    # ---- reverse-complement direction over [n-end, n)
    ridx = jnp.maximum(lens[:, None] - 1 - idx[None, :], 0)
    seq_r = jnp.where(inb, jnp.where(seq_fix[r[:, None], ridx] < 4,
                                     3 - seq_fix[r[:, None], ridx],
                                     seq_fix[r[:, None], ridx]), 4).astype(seq_b.dtype)
    q_r = jnp.where(inb, seq_q[r[:, None], ridx], False)
    lcov_r = jnp.where(inb, lcov[r[:, None], ridx], 0)
    hcov_r = jnp.where(inb, hcov[r[:, None], ridx], 0)
    start_r = lens - end
    ok0 = searchable & (rv0 >= 0) & ~ov0
    ec1r, na1, rv1, mh1, ov1 = srch.ec1dir_batch(
        table, cfg, seq_r, q_r, q_r, lcov_r, hcov_r, lens, start_r, ok0
    )
    ok1 = ok0 & (rv1 >= 0) & ~ov1
    # flip direction-2 output back (complement bases < 4)
    ec1b = ec1r[r[:, None], ridx]
    ec1b = jnp.where(inb, jnp.where(ec1b < 4, 3 - ec1b, ec1b), 4).astype(jnp.uint8)

    # ---- merge the two directions (correct.c:443-450)
    agree = ec0 == ec1b
    merged = jnp.where(
        agree,
        jnp.where(ec0 > 3, seq_fix, ec0),
        jnp.where(
            ec1b > 3, ec0, jnp.where(ec0 > 3, ec1b, ob)
        ),
    )
    final_b = jnp.where(ok1[:, None] & inb, merged, seq_b)
    is_diff = (final_b != ob) & inb & ok1[:, None]
    n_ec = jnp.sum(is_diff, axis=1)
    n_ec_high = jnp.sum(is_diff & seq_q, axis=1)

    # ---- status assembly (correct.c:425-435)
    def code_of(rv):
        return jnp.where(rv == -2, ECCODE_UNCORR_N,
                         jnp.where(rv == -3, ECCODE_MANY_FAIL, ECCODE_MISC))

    ec_code = jnp.zeros((B,), I32)
    ec_code = jnp.where(~ok1, code_of(rv1), ec_code)
    ec_code = jnp.where(~ok0, code_of(rv0), ec_code)
    ec_code = jnp.where(no_solid, ECCODE_NO_SOLID, ec_code)
    ec_code = jnp.where(many_n, ECCODE_MANY_N, ec_code)
    overflow = (ov0 | ov1) & searchable
    return dict(
        final_b=final_b, is_diff=is_diff, ob=ob, q=seq_q,
        ec_code=ec_code, brute=greedy_ok.astype(I32),
        n_ec=n_ec.astype(I32), n_ec_high=n_ec_high.astype(I32),
        n_absent=(na0 + na1).astype(I32),
        max_heap=jnp.maximum(mh0, mh1).astype(I32),
        overflow=overflow,
    )


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------

class Corrector:
    def __init__(self, opt: Opts, ds: DeviceSpectrum, stack_cap: int = 2048,
                 iter_cap: int = 2048):
        self.opt = opt
        self.ds = ds
        self.cfg = make_config(opt, ds, stack_cap, iter_cap)
        self._model_ch: Optional[M.CountHash] = None

    def _fallback_table(self) -> M.CountHash:
        """Scalar CountHash mirror for overflow fallback (built lazily)."""
        if self._model_ch is None:
            ch = M.CountHash(self.ds.k, self.ds.l_pre)
            shard, keybody, payload = self.ds.compact_entries()
            for s, kb, p in zip(shard, keybody, payload):
                ch.shards[int(s)][int(kb)] = int(p)
            self._model_ch = ch
        return self._model_ch

    def correct_batch(self, seqs: List[str], quals: List[Optional[str]]):
        """Correct a batch; returns [(EcStat, seq, qual)]."""
        opt = self.opt
        n = len(seqs)
        # host conversion (bfc_seq_conv semantics incl. refine decode)
        conv_b: List[np.ndarray] = []
        conv_q: List[np.ndarray] = []
        for seq, qual in zip(seqs, quals):
            b = kops._BASE_LUT[np.frombuffer(seq.encode("ascii"), np.uint8)].copy()
            if qual is not None:
                qv = np.frombuffer(qual.encode("ascii"), np.uint8).astype(np.int32) - 33
                q = qv >= opt.q
                if opt.refine_ec:
                    enc = qv <= 5
                    b = np.where(enc, (qv - 1) & 7, b).astype(np.uint8)
            else:
                q = np.ones(len(b), bool)
            q = q & (b <= 3)
            conv_b.append(b)
            conv_q.append(q)
        L = max((len(b) for b in conv_b), default=1)
        L = (L + 31) // 32 * 32
        B = (n + 255) // 256 * 256
        bases = np.full((B, L), 4, np.uint8)
        qflag = np.zeros((B, L), bool)
        lens = np.zeros((B,), np.int32)
        for i, (b, q) in enumerate(zip(conv_b, conv_q)):
            bases[i, : len(b)] = b
            qflag[i, : len(b)] = q
            lens[i] = len(b)
        out = correct_core(
            self.ds.table, self.cfg, jnp.asarray(bases), jnp.asarray(qflag),
            jnp.asarray(lens), jnp.int32(self.ds.mode),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        results = []
        for i in range(n):
            if out["overflow"][i]:
                ch = self._fallback_table()
                st, s2, q2 = M.ec1(opt, ch, self.ds.mode, seqs[i], quals[i])
                results.append((st, s2, q2))
                continue
            st = M.EcStat(
                ec_code=int(out["ec_code"][i]), brute=int(out["brute"][i]),
                n_ec=int(out["n_ec"][i]), n_ec_high=int(out["n_ec_high"][i]),
                n_absent=int(out["n_absent"][i]), rf_code=0,
                max_heap=int(out["max_heap"][i]),
            )
            if st.ec_code != 0:
                # on any failure the reference returns with the zero-
                # initialized stats (correct.c:394 + early returns)
                st.n_ec = st.n_ec_high = st.n_absent = st.max_heap = 0
                results.append((st, seqs[i], quals[i]))
                continue
            ln = lens[i]
            fb = out["final_b"][i, :ln]
            isd = out["is_diff"][i, :ln]
            obv = out["ob"][i, :ln]
            qv = out["q"][i, :ln]
            seq_chars = np.where(
                isd,
                np.frombuffer(b"acgtn", np.uint8)[fb],
                np.frombuffer(b"ACGTN", np.uint8)[fb],
            )
            s2 = seq_chars.tobytes().decode("ascii")
            if quals[i] is not None:
                q_chars = np.where(
                    isd, 34 + obv.astype(np.uint8),
                    np.frombuffer(b"+?", np.uint8)[qv.astype(np.int32)],
                )
                q2 = q_chars.tobytes().decode("ascii")
            else:
                q2 = None
            results.append((st, s2, q2))
        return results
