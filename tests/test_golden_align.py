"""Golden DP tests: toy repeat cases + full-BAM parity vs the reference's
checked-in realigned SAM (reference: test/align.py:33-38, test/data/)."""
import os

import numpy as np
import pytest

from npore_tpu.config import AlignConfig
from npore_tpu.constants import bases_to_int
from npore_tpu.golden.align import align, get_breaks, get_dels, get_inss
from npore_tpu.io.bam import BamReader
from npore_tpu.io.cigar import (collapse_cigar, expand_cigar, normalize_cigar,
                                ref_len, seq_len)
from npore_tpu.io.sam import SamReader

# the reference's six toy cases (test/align.py:33-38)
TOY_CASES = [
    ("CAAAGAAAGAAAG", "CAAAGAAAGAAG", "9=1D3="),
    ("CAAAGAAAGAAAG", "CAAAGAAAAGAAAG", "5=1I8="),
    ("CAAAGAAAGAAAG", "CAAAGAAAAG", "5=4D1I4="),
    ("CAAAGAAAGAAAG", "CAAGAAAG", "1=5D7="),
    ("CGAAAGAAAGAAAG", "CGAAGAAAG", "2=5D7="),
    ("CGAAAGAAAGAAAC", "CGAAGAAAC", "2=5D7="),
]


def _align_pair(ref, seq, cigar, scores, **cfg_kw):
    sub_scores, np_scores, _, _ = scores
    cfg = AlignConfig(**cfg_kw)
    errs = []
    out = align(bases_to_int(ref), bases_to_int(seq), expand_cigar(cigar),
                sub_scores, np_scores, cfg, errs)
    assert not errs, errs
    return out


@pytest.mark.parametrize("ref,seq,cigar", TOY_CASES)
def test_toy_cases_valid(ref, seq, cigar, score_matrices):
    """Output CIGAR must consume exactly the input sequences, for both the
    small test band (r=10, chunked at 20 rows) and defaults."""
    out = _align_pair(ref, seq, cigar, score_matrices, r=10, max_b_rows=20)
    assert seq_len(out) == len(seq)
    assert ref_len(out) == len(ref)
    out2 = _align_pair(ref, seq, cigar, score_matrices)
    assert seq_len(out2) == len(seq)
    assert ref_len(out2) == len(ref)


def test_cnv_indels_snap_to_units(score_matrices):
    """A deletion inside the AAAG repeat should realign to a whole 4-unit."""
    out = _align_pair("CAAAGAAAGAAAG", "CAAAGAAAG", "5=4D4=", score_matrices)
    # 4 deletions must be contiguous (one CNV event), not split
    assert "DDDD" in out
    assert seq_len(out) == 9 and ref_len(out) == 13


def test_breaks_no_di_split():
    """Chunk boundaries never split a D,I pair from an original match
    (reference: src/aln.pyx:352-355)."""
    cigar = "DI" * 50
    inss = get_inss(cigar)
    dels = get_dels(cigar)
    breaks = get_breaks(21, len(cigar) + 1, inss, dels)
    assert breaks[0] == 0 and breaks[-1] == len(cigar)
    for b in breaks[1:-1]:
        # a break at b is bad if cigar[b-1:b+1] == 'DI'
        assert not (cigar[b] == "I" and cigar[b - 1] == "D")


def test_full_bam_parity(data_dir, score_matrices):
    """End-to-end: realign every read of reads.bam and compare CIGARs with
    the reference-produced golden (test/data/npore_realigned.sam)."""
    sub_scores, np_scores, _, _ = score_matrices
    golden = {r.qname: r for r in
              SamReader(os.path.join(data_dir, "npore_realigned.sam"))}
    cfg = AlignConfig()
    n = 0
    for read in BamReader(os.path.join(data_dir, "reads.bam")):
        if read.is_secondary or read.is_supplementary or read.is_unmapped:
            continue
        cig = expand_cigar(read.cigar).replace("S", "").replace("H", "")
        int_ref = bases_to_int(read.get_reference_sequence().upper())
        int_seq = bases_to_int(read.query_alignment_sequence.upper())
        new_cig = align(int_ref, int_seq, cig, sub_scores, np_scores, cfg)
        out = collapse_cigar(normalize_cigar(new_cig, int_ref, int_seq))
        assert out == golden[read.qname].cigar, read.qname
        n += 1
    assert n == 10


def test_chunked_equals_unchunked(score_matrices):
    """max_b_rows chunking must not change results when band is unchanged
    (chunks re-anchor on the original path; reference: src/aln.pyx:344-358,
    445-456). Identity-ish alignments keep the path in-band."""
    ref = "ACGT" * 30 + "AAAAAA" + "TGCA" * 30
    seq = ref[:118] + ref[124:]  # drop 6 bases mid-way
    cigar = "118=6D122="
    a = _align_pair(ref, seq, cigar, score_matrices, max_b_rows=20000)
    b = _align_pair(ref, seq, cigar, score_matrices, max_b_rows=64)
    assert seq_len(a) == seq_len(b) == len(seq)
    assert ref_len(a) == ref_len(b) == len(ref)


def test_native_golden_parity(score_matrices):
    """Native C++ golden port == python golden spec on repeat-rich pairs."""
    import numpy as np
    from npore_tpu.config import AlignConfig
    from npore_tpu.constants import bases_to_int
    from npore_tpu.native import get_lib, golden_align_native

    if get_lib() is None:
        import pytest
        pytest.skip("no compiler for the native library")
    sub_scores, np_scores, _, _ = score_matrices
    cfg = AlignConfig()
    rng = np.random.default_rng(4)
    for _ in range(6):
        n = int(rng.integers(60, 300))
        unit = "".join("ACGT"[i] for i in rng.integers(0, 4,
                                                       rng.integers(1, 5)))
        ref = (unit * 40)[:n // 2] + "".join(
            "ACGT"[i] for i in rng.integers(0, 4, n - n // 2))
        seq, cig = [], []
        for ch in ref:
            u = rng.random()
            if u < 0.05:
                cig.append("D")
                continue
            if u < 0.10:
                seq.append("ACGT"[rng.integers(0, 4)])
                cig.append("I")
            seq.append(ch)
            cig.append("=")
        iref, iseq = bases_to_int(ref), bases_to_int("".join(seq))
        c = "".join(cig)
        nat = golden_align_native(iref, iseq, c, sub_scores, np_scores, cfg)
        py = align(iref, iseq, c, sub_scores, np_scores, cfg)
        assert nat == py
