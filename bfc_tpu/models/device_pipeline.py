"""End-to-end device pipeline: count -> correct/trim -> formatted output.

The device analogue of the scalar models.pipeline, mirroring main() of
the reference CLI (/root/reference/bfc.c:126-150).  Reads stream through
the device corrector in batches; output records are emitted in input
order (the reference's kt_pipeline ordering guarantee).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

from ..io.fastq import Read, format_corrected, pack_stats, read_fastx
from ..opts import Opts
from ..utils.log import log
from . import refmodel as M
from .corrector import Corrector
from .counter import DeviceSpectrum, count_file_device, restore_spectrum
from .pipeline import parse_stats
from .trimmer import DeviceBloom, Trimmer, count_file_filter_device


def correct_file_device(fn: str, opt: Opts, ds: DeviceSpectrum,
                        out: List[str], batch_reads: int = 2048) -> None:
    corr = Corrector(opt, ds)
    pending: List[Read] = []
    n_done = 0

    def flush():
        nonlocal n_done
        if not pending:
            return
        todo_idx = []
        ori_sts: List[Optional[M.EcStat]] = []
        for i, r in enumerate(pending):
            skip = False
            ori = None
            if opt.refine_ec and r.comment and r.comment.startswith("ec:Z:"):
                ori = parse_stats(r.comment[5:])
                if ori.ec_code == 0 and ori.max_heap < 50:
                    skip = True
            if not skip:
                r.comment = None
                todo_idx.append(i)
                ori_sts.append(ori)
        if todo_idx:
            res = corr.correct_batch(
                [pending[i].seq for i in todo_idx],
                [pending[i].qual for i in todo_idx],
            )
            for j, i in enumerate(todo_idx):
                st, s2, q2 = res[j]
                r = pending[i]
                if opt.refine_ec:
                    # refine bookkeeping (correct.c:438-442,470; rf_code
                    # 1 = failed, 2 = reverted to prior result, 3 = refined)
                    st.rf_code = 1
                    ori = ori_sts[j]
                    if st.ec_code == 0:
                        if (ori is not None and ori.ec_code == 0
                                and st.n_absent > ori.n_absent):
                            st = dataclasses.replace(ori)
                            st.rf_code = 2
                            s2, q2 = r.seq, r.qual
                        else:
                            st.rf_code = 3
                r.seq, r.qual = s2, q2
                r.aux, r.aux2 = pack_stats(st)
        for r in pending:
            format_corrected(r, opt.no_qual, False, opt.discard, out)
        n_done += len(pending)
        log(f"processed {n_done} sequences", func="correct_file_device")
        pending.clear()

    for r in read_fastx(fn, keep_comment=opt.refine_ec):
        pending.append(r)
        if len(pending) >= batch_reads:
            flush()
    flush()


def run_device(opt: Opts, count_fn: str, correct_fn: Optional[str] = None,
               in_hash: Optional[str] = None, out_hash: Optional[str] = None,
               no_ec: bool = False, batch_reads: int = 2048) -> str:
    """Full device pipeline; returns the output text (reference stdout)."""
    out: List[str] = []
    next_fn = correct_fn if correct_fn is not None else count_fn
    if opt.filter_mode:
        bf_high = count_file_filter_device(count_fn, opt)
        trimmer = Trimmer(opt, bf_high)
        trimmer.trim_file(next_fn, out)
    else:
        if in_hash is not None:
            ds = restore_spectrum(in_hash)
            opt.k = ds.k
        else:
            ds = count_file_device(count_fn, opt)
        if out_hash is not None:
            ds.dump(out_hash)
        if not no_ec:
            correct_file_device(next_fn, opt, ds, out, batch_reads=batch_reads)
    return "\n".join(out) + ("\n" if out else "")
