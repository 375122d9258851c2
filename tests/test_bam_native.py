"""Native (C++) streaming BAM reader parity vs the pure-Python decoder.

Covers record fields, tags, realignment prep outputs (MD-reconstructed
reference, int-coded query, expanded CIGAR), region fetch with seeks, and
re-fetch on one handle (reference envelope: pysam fetch, src/bam.pyx:18-47).
"""
import os

import numpy as np
import pytest

from npore_tpu.constants import bases_to_int
from npore_tpu.io.bam import BamReader
from npore_tpu.io.cigar import expand_cigar

try:
    from npore_tpu.io.bam_native import NativeBamReader, native_available
    HAVE = native_available()
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="native bamio unavailable")


@pytest.fixture
def bam_path(data_dir):
    return os.path.join(data_dir, "reads.bam")


def test_record_and_prep_parity(bam_path):
    a = list(BamReader(bam_path))
    nb = NativeBamReader(bam_path)
    b = list(nb)
    assert len(a) == len(b) == 10
    assert nb.references == BamReader(bam_path).references
    for x, y in zip(a, b):
        for f in ("qname", "flag", "rname", "pos", "mapq", "cigar", "rnext",
                  "pnext", "tlen", "seq", "qual"):
            assert getattr(x, f) == getattr(y, f), (x.qname, f)
        assert x.tags == y.tags, x.qname
        assert y.aln is not None
        int_ref, int_seq, ecig = y.aln
        assert np.array_equal(
            int_ref, bases_to_int(x.get_reference_sequence().upper()))
        assert np.array_equal(
            int_seq, bases_to_int(x.query_alignment_sequence.upper()))
        assert ecig == expand_cigar(x.cigar).replace("S", "").replace("H", "")


def test_fetch_parity_and_seek(bam_path):
    py = BamReader(bam_path)
    nb = NativeBamReader(bam_path)
    ctg = py.references[0]
    for (s, e) in [(0, 10**9), (100, 400), (500, 501), (0, 99), (990, 1001)]:
        fa = [r.qname for r in BamReader(bam_path).fetch(ctg, s, e)]
        fb = [r.qname for r in nb.fetch(ctg, s, e)]
        assert fa == fb, (s, e)
    # missing contig, repeated fetch on one handle (index seek back)
    assert list(nb.fetch("nope", 0, 5)) == []
    f1 = [r.qname for r in nb.fetch(ctg, 0, 10**9)]
    f2 = [r.qname for r in nb.fetch(ctg, 0, 10**9)]
    assert f1 == f2 and len(f1) == 10


def test_open_alignment_file_prefers_native(bam_path):
    from npore_tpu.io.bam import open_alignment_file
    r = open_alignment_file(bam_path)
    assert isinstance(r, NativeBamReader)
    # prep off for consumers that only stream text fields (stats path)
    r2 = open_alignment_file(bam_path, prep=False)
    recs = list(r2)
    assert len(recs) == 10 and recs[0].aln is None
