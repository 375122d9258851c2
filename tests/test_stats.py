"""Confusion-matrix training classifier (engine/stats.py vs hand-computed
counts; semantics from reference src/bam.pyx:387-503)."""
import numpy as np

from npore_tpu.engine.stats import calc_confusion_matrices_range
from npore_tpu.io.sam import SamReader


REF = "GGCAAAAAGTT"        # A-homopolymer l=5 starting at pos 3


def _bam(tmp_path, body):
    p = tmp_path / "reads.sam"
    p.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n"
        "@SQ\tSN:ref\tLN:11\n" + body)
    return SamReader(str(p))


def test_cnv_classification(tmp_path):
    body = (
        # full match
        "r0\t0\tref\t1\t60\t11M\t*\t0\t0\tGGCAAAAAGTT\t" + "I" * 11 + "\n"
        # 2-base deletion of the A-run (CNV: nps[1,5,3])
        "r1\t0\tref\t1\t60\t3M2D6M\t*\t0\t0\tGGCAAAGTT\t" + "I" * 9 + "\n"
        # 1-base A insertion at the run anchor (CNV: nps[1,5,6])
        "r2\t0\tref\t1\t60\t3M1I8M\t*\t0\t0\tGGCAAAAAAGTT\t" + "I" * 12 + "\n"
        # non-CNV insertion 'CT' after pos 9 (inss[2])
        "r3\t0\tref\t1\t60\t10M2I1M\t*\t0\t0\tGGCAAAAAGTCTT\t" + "I" * 13
        + "\n")
    bam = _bam(tmp_path, body)
    subs, nps, inss, dels = calc_confusion_matrices_range(
        bam, REF, "ref", 0, 11, min_bq=0)
    assert nps[0, 5, 3] == 1          # 2-unit shrink of the 5-A run
    assert nps[0, 5, 6] == 1          # 1-unit lengthen
    assert inss[2] == 1               # non-CNV 2-base insertion
    assert dels[min(100, 2)] == 0     # the deletion was classified as CNV
    # every aligned (M) base lands in the substitution matrix; inserted
    # bases are counted via the +N tokens, not as column base calls
    assert subs[1, 1] == 5 + 3 + 5 + 5        # A->A per read
    assert subs.sum() == 11 + 9 + 11 + 11     # M-consumed bases per read


def test_non_cnv_deletion(tmp_path):
    # deleting 'GT' (not a repeat CNV anywhere) -> dels[2]
    body = ("r0\t0\tref\t1\t60\t8M2D1M\t*\t0\t0\tGGCAAAAAT\t" + "I" * 9
            + "\n")
    bam = _bam(tmp_path, body)
    _, nps, inss, dels = calc_confusion_matrices_range(
        bam, REF, "ref", 0, 11, min_bq=0)
    assert dels[2] == 1
    assert nps[:, :, :].sum() == nps.trace(axis1=1, axis2=2).sum()
