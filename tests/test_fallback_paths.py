"""Fallback paths: long reads (>504 bp) and forced device-capacity
overflow must stay byte-exact (they re-run on the scalar model).

These paths are the rot-prone ones: nothing else exercises them
(VERDICT round 1, weak #4)."""

import numpy as np
import pytest

from bfc_tpu.models import corrector as DC
from bfc_tpu.models import counter as C
from bfc_tpu.models import device_pipeline as DP
from bfc_tpu.opts import Opts

from . import datagen, oracle


@pytest.fixture(scope="module")
def long_dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("longreads")
    genome = datagen.make_genome(8000, seed=91)
    # 600 bp reads: beyond the 504 bp packed-position limit of the
    # lockstep search (ops/search.py), forcing the direct scalar path
    reads = datagen.simulate_reads(genome, 300, read_len=600,
                                   err_rate=0.01, seed=92)
    fq = f"{d}/long.fq"
    datagen.write_fastq(fq, reads)
    return fq


@pytest.mark.slow
def test_e2e_long_reads_direct_scalar(long_dataset):
    """Reads longer than 504 bp take dispatch_arrays' direct scalar path
    (models/corrector.py); output must match the reference byte-for-byte."""
    fq = long_dataset
    ref_out, _ = oracle.run_bfc(["-k21", "-b24", "-t1", fq])
    opt = Opts()
    opt.k = 21
    opt.bf_shift = 24
    mine = DP.run_device(opt, fq)
    assert mine.encode() == ref_out


@pytest.fixture(scope="module")
def overflow_dataset():
    genome = datagen.make_genome(15000, seed=51)
    reads = datagen.simulate_reads(genome, 1500, read_len=100,
                                   err_rate=0.02, seed=52)
    return reads


def _count(reads, opt):
    return C.count_stream(iter(reads), opt,
                          batch_reads=2048)


def test_forced_overflow_scalar_fallback(overflow_dataset):
    """Tiny stack/iteration caps force device overflow -> M.ec1 re-run
    (models/corrector.py finalize_batch); results must equal the
    default-capacity corrector's."""
    reads = overflow_dataset
    opt = Opts()
    opt.k = 21
    opt.bf_shift = 24
    ds = _count(reads, opt)
    seqs = [s for s, _ in reads]
    quals = [q for _, q in reads]
    corr_ref = DC.Corrector(opt, ds)
    expected = corr_ref.correct_batch(seqs, quals)

    corr_tiny = DC.Corrector(opt, ds, stack_cap=24, iter_cap=16)
    # count overflows via the raw device output before fallback
    ctx = corr_tiny.dispatch_batch(seqs, quals)
    n_overflow = int(np.asarray(ctx["out"]["overflow"])[: len(seqs)].sum())
    assert n_overflow > 0, "caps not small enough to force overflow"
    got = corr_tiny.finalize_batch(ctx)
    assert got == expected
