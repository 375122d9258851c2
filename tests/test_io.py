"""I/O layer tests: FASTA, SAM, BAM, CIGAR utilities, MD reconstruction."""
import os

import numpy as np
import pytest

from npore_tpu.constants import bases_to_int, cig_to_int, int_to_bases, int_to_cig
from npore_tpu.io.bam import BamReader
from npore_tpu.io.cigar import (collapse_cigar, expand_cigar, finalize_cigar,
                                normalize_cigar, push_indels_left,
                                push_inss_thru_dels, ref_len, seq_len)
from npore_tpu.io.fasta import FastaFile
from npore_tpu.io.sam import SamReader, parse_sam_line


def test_base_encoding_roundtrip():
    s = "NACGTACGTN"
    enc = bases_to_int(s)
    assert enc.tolist() == [0, 1, 2, 3, 4, 1, 2, 3, 4, 0]
    assert int_to_bases(enc) == s
    assert bases_to_int("acgt").tolist() == [1, 2, 3, 4]


def test_cigar_expand_collapse():
    assert expand_cigar("1D3M2I") == "DMMMII"
    assert collapse_cigar("DMMMII") == "1D3M2I"
    assert expand_cigar("*") == ""
    assert collapse_cigar("") == ""
    assert seq_len("DMMMIIS") == 6
    assert ref_len("DMMMIIS") == 4
    assert int_to_cig(cig_to_int("MIDNSHP=XB")) == "MIDNSHP=XB"


def test_push_indels_left():
    # insertion of 'A' into 'CAAAT' should shift to the homopolymer start
    seq = bases_to_int("CAAAAT")  # query with extra A
    cig = cig_to_int("MMMMIM".replace("M", "M"))
    out = push_indels_left(cig.copy(), seq, 1)  # push I over query
    assert int_to_cig(out) == "MIMMMM"


def test_push_inss_thru_dels():
    cig = cig_to_int("MDDIIM")
    out = push_inss_thru_dels(cig.copy())
    assert int_to_cig(out) == "MIIDDM"


@pytest.mark.parametrize("native", [True, False])
def test_finalize_cigar_matches_normalize_collapse(native, monkeypatch):
    """finalize_cigar must equal collapse(normalize(...)) on random
    ref/seq/cigar triples (the realigner's fused hot path), via both the
    one-call C++ implementation and the numpy fallback."""
    if not native:  # force the numpy fallback path
        import npore_tpu.native as nat
        monkeypatch.setattr(nat, "finalize_cigar_native",
                            lambda *a: None)
    rng = np.random.default_rng(7)
    for _ in range(300):
        n_ops = int(rng.integers(1, 120))
        ops = rng.choice(list("MIDX="), size=n_ops,
                         p=[0.55, 0.13, 0.13, 0.13, 0.06])
        ext = "".join(ops)
        n_seq = sum(c in "MIX=" for c in ext)
        n_ref = sum(c in "MDX=" for c in ext)
        # low-cardinality alphabet maximizes shiftable periodic contexts
        int_seq = rng.integers(1, 3, n_seq).astype(np.uint8)
        int_ref = rng.integers(1, 3, n_ref).astype(np.uint8)
        want = collapse_cigar(normalize_cigar(ext, int_ref, int_seq))
        got = finalize_cigar(ext, int_ref, int_seq)
        assert got == want, (ext, got, want)
    assert finalize_cigar("", np.zeros(0, np.uint8), np.zeros(0, np.uint8)) == ""


def test_truncated_bam_raises_cleanly(tmp_path, data_dir):
    """Truncation anywhere (magic, header, record stream) must raise
    ValueError with a message naming the file — not a raw struct.error
    (the reference tolerates oddities via pysam's own error types)."""
    data = open(os.path.join(data_dir, "reads.bam"), "rb").read()
    from npore_tpu.io.bam import open_alignment_file
    for cut in (17, 100, len(data) // 2):
        p = str(tmp_path / f"t{cut}.bam")
        with open(p, "wb") as fh:
            fh.write(data[:cut])
        with pytest.raises(ValueError):
            bam = open_alignment_file(p)
            list(bam)


def test_path_inss_matches_golden():
    """windows.path_inss == golden get_inss over the 'DI'-rewritten string,
    and prefix-D counts are index - prefix-I (every step is I or D)."""
    from npore_tpu.engine.windows import path_inss
    from npore_tpu.golden.align import get_dels, get_inss
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 300))
        cig = "".join(rng.choice(list("MIDX="), size=n,
                                 p=[.5, .15, .15, .15, .05]))
        c2 = cig.replace("X", "DI").replace("=", "DI").replace("M", "DI")
        got = path_inss(cig)
        assert np.array_equal(get_inss(c2), got)
        assert np.array_equal(get_dels(c2),
                              np.arange(len(got)) - got)


def test_fasta(data_dir):
    fa = FastaFile(os.path.join(data_dir, "ref.fasta"))
    assert fa.references == ["ref"]
    assert fa.lengths == [1000]
    assert fa.fetch("ref", 0, 10) == fa.fetch("ref")[:10]


def test_bam_matches_sam(data_dir):
    bam = {r.qname: r for r in BamReader(os.path.join(data_dir, "reads.bam"))}
    sam = {r.qname: r for r in SamReader(os.path.join(data_dir, "reads.sam"))}
    assert len(bam) == len(sam) == 10
    for name, b in bam.items():
        s = sam[name]
        assert (b.flag, b.rname, b.pos) == (s.flag, s.rname, s.pos)
        assert b.seq == s.seq
        assert b.qual == s.qual
        assert b.cigar == s.cigar


def test_md_reference_reconstruction(data_dir):
    """MD-derived reference slices must equal the true FASTA slices
    (replaces pysam get_reference_sequence; reference: src/bam.pyx:45)."""
    fa = FastaFile(os.path.join(data_dir, "ref.fasta"))
    for rec in BamReader(os.path.join(data_dir, "reads.bam")):
        want = fa.fetch(rec.rname, rec.pos, rec.reference_end).upper()
        assert rec.get_reference_sequence() == want


def test_sam_line_roundtrip():
    line = ("r1\t0\tref\t100\t60\t5M1I4M\t*\t0\t10\tAAAAACCCCC\tIIIIIIIIII\t"
            "HP:i:1\tMD:Z:9")
    rec = parse_sam_line(line)
    assert rec.pos == 99
    assert rec.get_tag("HP") == 1
    assert rec.to_line() == line


def test_query_alignment_sequence():
    rec = parse_sam_line("r\t0\tref\t1\t60\t2S5M3S\t*\t0\t0\tAACCCCCTTT\t*")
    assert rec.query_alignment_sequence == "CCCCC"


def test_realigner_skips_malformed_reads(stats_dir):
    """One bad MD tag must not abort the run: skip-with-warning
    (reference envelope: pysam tolerates oddities, src/bam.pyx:18-47)."""
    from npore_tpu.engine.realigner import Realigner
    from npore_tpu.io.sam import SamRecord
    from npore_tpu.model.scores import (calc_score_matrices,
                                        load_confusion_matrices)
    subs, nps, inss, dels = load_confusion_matrices(stats_dir)
    sub_scores, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)
    rl = Realigner(sub_scores, np_scores, engine="golden")
    good = SamRecord(qname="ok", flag=0, rname="ref", pos=0, mapq=60,
                     cigar="8M", seq="ACGTACGT", qual="I" * 8,
                     tags={"MD": ("Z", "8")})
    bad = SamRecord(qname="bad", flag=0, rname="ref", pos=0, mapq=60,
                    cigar="4M2D4M", seq="ACGTACGT", qual="I" * 8,
                    tags={"MD": ("Z", "8")})  # MD lacks the deletion
    out = list(rl.realign_records(iter([good, bad])))
    assert [r.qname for r in out] == ["ok"]
    assert len(rl.skipped) == 1 and "bad" in rl.skipped[0]


def test_pileup_deletion_bases_with_ref():
    """With a reference, deletion annotations carry the deleted ref bases
    (samtools -f behavior); without, 'N's (the reference's no-f command)."""
    from npore_tpu.io.pileup import pileup_columns
    from npore_tpu.io.sam import SamRecord

    class StubBam:
        def __init__(self, recs):
            self.recs = recs

        def fetch(self, *a):
            return iter(self.recs)

    rec = SamRecord(qname="r", flag=0, rname="c", pos=0, mapq=60,
                    cigar="4M2D4M", seq="ACGTACGT", qual="I" * 8)
    bam = StubBam([rec])
    ref = "ACGTTGACGT"
    cols = dict(pileup_columns(bam, "c", 0, 10, ref=ref))
    assert cols[3].endswith("-2TG")
    cols_nof = dict(pileup_columns(bam, "c", 0, 10))
    assert cols_nof[3].endswith("-2NN")


def test_finalize_cigar_batch_equals_per_read():
    """One-FFI-call batched finalization (native.finalize_cigar_batch,
    the realigner's hot emit path) must equal the per-read path on
    normalization-heavy cases, and fall back cleanly on errors."""
    import numpy as np
    import pytest
    from npore_tpu.constants import bases_to_int
    from npore_tpu.io.cigar import finalize_cigar
    from npore_tpu.native import finalize_cigar_batch, get_lib
    if get_lib() is None:
        pytest.skip("no compiler")
    rng = np.random.default_rng(3)
    cigars, refs, seqs = [], [], []
    for i in range(40):
        n = int(rng.integers(1, 120))
        ref = bases_to_int("".join(rng.choice(list("ACGT"), n)))
        nI = int(rng.integers(0, 6))
        nD = int(rng.integers(0, min(6, n)))
        seq = bases_to_int("".join(rng.choice(list("ACGT"),
                                              n + nI - nD)))
        ops = ["M"] * (n - nD) + ["I"] * nI + ["D"] * nD
        rng.shuffle(ops)
        cigars.append("".join(ops))
        refs.append(np.ascontiguousarray(ref, np.int8))
        seqs.append(np.ascontiguousarray(seq, np.int8))
    cigars.append("")        # empty-cigar edge
    refs.append(np.zeros(0, np.int8))
    seqs.append(np.zeros(0, np.int8))
    got = finalize_cigar_batch(cigars, refs, seqs)
    want = [finalize_cigar(c, r, s)
            for c, r, s in zip(cigars, refs, seqs)]
    assert got == want
    # invalid op char -> batch declines (None); per-read path raises
    bad = finalize_cigar_batch(["MZD"], [refs[0]], [seqs[0]])
    assert bad is None


def test_path_inss_native_equals_numpy():
    """C++ one-pass path_inss == the numpy formulation on random expanded
    cigars (stage-A hot path; the numpy form is the fallback oracle)."""
    import numpy as np
    import pytest
    from npore_tpu.native import get_lib, path_inss_native
    if get_lib() is None:
        pytest.skip("no compiler")
    import npore_tpu.engine.windows as wmod
    rng = np.random.default_rng(9)
    for _ in range(25):
        n = int(rng.integers(0, 300))
        cig = "".join(rng.choice(list("MID=X"), n))
        raw = np.frombuffer(cig.encode("ascii"), dtype=np.uint8)
        m = wmod._IS_M[raw]
        sizes = m.astype(np.int64) + 1
        ends = np.cumsum(sizes)
        n2 = int(ends[-1]) if len(ends) else 0
        starts = ends - sizes
        is_i = np.zeros(n2, dtype=bool)
        is_i[starts[m] + 1] = True
        is_i[starts[raw == ord("I")]] = True
        want = np.zeros(n2 + 1, dtype=np.int64)
        np.cumsum(is_i, out=want[1:])
        got = path_inss_native(cig)
        assert np.array_equal(got, want), cig[:30]
    import pytest as _pt
    with _pt.raises(ValueError):
        path_inss_native("MZD")
