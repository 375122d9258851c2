"""VCF toolbox + bed + purity component tests."""
import os

import numpy as np
import pytest

from npore_tpu.cli.bed import complement, get_np_regions, sort_merge
from npore_tpu.cli.purity import compute_purity
from npore_tpu.constants import bases_to_int
from npore_tpu.io.vcf import (VcfReader, apply_vcf, filter_overlaps, gen_vcf,
                              merge_vcfs, parse_vcf_line, split_vcf,
                              write_vcf)


def test_filter_overlaps(tmp_path):
    """Reference docstring example (src/vcf.py:10-17)."""
    vcf = tmp_path / "in.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c\t3\t.\tATTTTTTT\tA\t60\tPASS\t.\tGT\t1|1\n"
        "c\t5\t.\tT\tC\t60\tPASS\t.\tGT\t1|1\n"
        "c\t6\t.\tTTTT\tT\t60\tPASS\t.\tGT\t1|1\n"
        "c\t12\t.\tG\tC\t60\tPASS\t.\tGT\t1|1\n")
    out = tmp_path / "out.vcf"
    filter_overlaps(str(vcf), str(out))
    recs = list(VcfReader(str(out)))
    assert [r.pos + 1 for r in recs] == [3, 12]


def test_filter_gt(tmp_path):
    """In-process form of the pipeline's bcftools GT=0/0 exclusion
    (reference: scripts/realign_pipeline.sh:277-279)."""
    from npore_tpu.io.vcf import filter_gt
    vcf = tmp_path / "in.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c\t3\t.\tA\tC\t60\tPASS\t.\tGT:GQ\t0/0:12\n"
        "c\t5\t.\tT\tC\t60\tPASS\t.\tGT\t0|0\n"
        "c\t8\t.\tG\tC\t60\tPASS\t.\tGT\t0/1\n"
        "c\t12\t.\tG\tC\t60\tPASS\t.\tGT\t1|1\n")
    out = tmp_path / "out.vcf"
    n = filter_gt(str(vcf), str(out), "0/0")
    recs = list(VcfReader(str(out)))
    assert n == 2 and [r.pos + 1 for r in recs] == [8, 12]


def test_split_and_merge(tmp_path, data_dir):
    regions = [("chr18", 0, 31), ("chr19", 0, 31)]
    pre = str(tmp_path / "pre")
    v1, v2 = split_vcf(os.path.join(data_dir, "test_std_vcf.vcf"),
                       regions, pre)
    r1 = list(VcfReader(v1))
    r2 = list(VcfReader(v2))
    # chr18: 1|1 SNP in both; 0|1 insertion only in hap2
    assert [(r.contig, r.pos + 1) for r in r1 if r.contig == "chr18"] == [
        ("chr18", 1)]
    assert [(r.contig, r.pos + 1) for r in r2 if r.contig == "chr18"] == [
        ("chr18", 1), ("chr18", 3)]
    out = str(tmp_path / "merged.vcf")
    merge_vcfs(v1, v2, out, regions)
    merged = list(VcfReader(out))
    gts = {(r.contig, r.pos + 1): r.sample for r in merged}
    assert gts[("chr18", 1)] == "1|1"
    assert gts[("chr18", 3)] == "0|1"


def test_apply_and_gen_roundtrip(tmp_path):
    """apply_vcf synthesizes the hap; gen_vcf recovers the variants."""
    ref = "ACGTACGTAAATTTCCCGGG"
    vcf = tmp_path / "h.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "c\t2\t.\tC\tG\t60\tPASS\t.\tGT\t.\n"
        "c\t8\t.\tTAAA\tT\t60\tPASS\t.\tGT\t.\n"
        "c\t15\t.\tC\tCTT\t60\tPASS\t.\tGT\t.\n")
    regions = [("c", 0, len(ref) - 1)]
    data = apply_vcf(str(vcf), 1, regions, lambda ctg: ref)
    (ctg, hap, seq, ref_out, cig) = data[0]
    assert ref_out == ref
    assert len(seq) == len(ref) - 3 + 2          # 3-base del, 2-base ins
    assert seq[1] == "G" and "TT" in seq[12:17]  # sub applied, ins applied
    out = gen_vcf(data, 1, str(tmp_path / "gen"))
    recs = list(VcfReader(out))
    assert [(r.pos + 1, r.alleles) for r in recs] == [
        (2, ("C", "G")), (8, ("TAAA", "T")), (15, ("C", "CTT"))]


def test_bed_regions_match_npinfo():
    seq = bases_to_int("CAAAGAAAGAAAGTTTTTTC")
    regs = get_np_regions(seq.astype(np.uint8), "c", 100, 6)
    # n=1: TTTTTT run of 6 at 13..19 and AAA runs
    n1 = [(b, e) for _, b, e in regs[0]]
    assert (113, 119) in n1
    # n=4: CAAAG-period repeat spanning from position 0 area
    assert any(e - b >= 12 for b, e in [(b, e) for _, b, e in regs[3]])


def test_sort_merge_and_complement():
    regs = [("chr2", 5, 10), ("chr1", 3, 7), ("chr1", 6, 12), ("chr1", 20, 25)]
    merged = sort_merge(regs)
    assert merged == [("chr1", 3, 12), ("chr1", 20, 25), ("chr2", 5, 10)]
    comp = complement(merged, [("chr1", 30)])
    assert comp == [("chr1", 0, 3), ("chr1", 12, 20), ("chr1", 25, 30)]


def test_compute_purity():
    # 4 reads: A, A, C, A with one insertion +2TT after one A
    col = "^KA$AA+2TTC"
    base, ins = compute_purity(col)
    assert base == pytest.approx((3 / 4) ** 2 + (1 / 4) ** 2)
    assert ins == pytest.approx((3 / 4) ** 2 + (1 / 4) ** 2)


def test_vcf_line_roundtrip():
    line = "chr1\t42\trs1\tACG\tA,AT\t33.5\tPASS\tDP=5\tGT:GQ\t0|1:50"
    rec = parse_vcf_line(line)
    assert rec.pos == 41 and rec.alleles == ("ACG", "A", "AT")
    assert rec.gt == (0, 1) and rec.sample_field("GQ") == "50"
    assert rec.to_line() == line
