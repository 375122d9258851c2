"""Round-trip coverage for the in-process BAM writer (io/bam_writer.py)."""
import os

import numpy as np
import pytest

from npore_tpu.io.bam import BamReader, open_alignment_file
from npore_tpu.io.bam_writer import write_bam
from npore_tpu.io.sam import SamReader


def _fields(r):
    return (r.qname, r.flag, r.rname, r.pos, r.mapq, r.cigar, r.rnext,
            r.pnext, r.tlen, r.seq, r.qual, dict(r.tags))


def test_bam_writer_roundtrip_sam_source(data_dir, tmp_path):
    src = SamReader(os.path.join(data_dir, "reads.sam"))
    recs = list(src)
    out = str(tmp_path / "rt.bam")
    write_bam(out, src.references, src.lengths, recs)

    rd = BamReader(out)
    got = list(rd)
    assert rd.references == list(src.references)
    assert rd.lengths == list(src.lengths)
    assert [_fields(r) for r in got] == [_fields(r) for r in recs]


def test_bam_writer_roundtrip_bam_source(data_dir, tmp_path):
    """reads.bam -> write_bam -> both readers: all fields + MD tags, and
    the native prep fast path reconstructs the same realignment inputs."""
    src = BamReader(os.path.join(data_dir, "reads.bam"))
    recs = list(src)
    assert any(r.has_tag("MD") for r in recs)
    out = str(tmp_path / "rt.bam")
    write_bam(out, src.references, src.lengths, recs)

    got_py = list(BamReader(out))
    assert [_fields(r) for r in got_py] == [_fields(r) for r in recs]

    from npore_tpu.io.bam_native import native_available
    if not native_available():
        pytest.skip("native bamio unavailable")
    rd = open_alignment_file(out)
    got = list(rd)
    mapped = [r for r in recs if not r.is_unmapped]
    got_mapped = [g for g in got if not g.is_unmapped]
    from npore_tpu.constants import bases_to_int
    from npore_tpu.io.cigar import expand_cigar
    for r, g in zip(mapped, got_mapped):
        assert g.qname == r.qname and dict(g.tags) == dict(r.tags)
        assert g.aln is not None
        int_ref, int_seq, ecig = g.aln
        assert ecig == expand_cigar(r.cigar).replace("S", "").replace("H", "")
        np.testing.assert_array_equal(
            int_ref, bases_to_int(r.get_reference_sequence().upper()))
        np.testing.assert_array_equal(
            int_seq, bases_to_int(r.query_alignment_sequence.upper()))
    # region fetch through the sparse index
    sub = [r.qname for r in rd.fetch(src.references[0], 200, 400)]
    want = [r.qname for r in recs
            if not r.is_unmapped and r.pos < 400 and r.reference_end > 200]
    assert sub == want
