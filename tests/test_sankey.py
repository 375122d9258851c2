"""Sankey INDEL-analysis classification tests (reference:
scripts/plot_sankey.py:70-151 count() semantics)."""
import os
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

import plot_sankey as ps  # noqa: E402


HDR = ("##fileformat=VCFv4.2\n"
       "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH"
       "\tQUERY\n")


def _vcf(tmp_path, lines):
    p = tmp_path / "ev.vcf"
    p.write_text(HDR + "".join(lines))
    return str(p)


def rec(pos, ref, alt, bd_t, bi_t, bd_q, bi_q, gt="0/1"):
    return (f"c\t{pos + 1}\t.\t{ref}\t{alt}\t30\tPASS\t.\tGT:BD:BI\t"
            f"{gt}:{bd_t}:{bi_t}\t{gt}:{bd_q}:{bi_q}\n")


def test_count_types_and_calls(tmp_path):
    # ref has a homopolymer run so CNV logic can trigger
    refs = {"c": "ACGTACGTAC" + "A" * 8 + "GTCGTTGCAT" * 4}
    vcf = _vcf(tmp_path, [
        rec(2, "G", "T", "TP", "ti", "TP", "ti"),          # SUB TP
        rec(4, "A", "G", "FN", "tv", ".", "."),            # SUB FN
        rec(6, "G", "C", ".", ".", "FP", "tv"),            # SUB FP (query)
        rec(9, refs["c"][9], refs["c"][9] + "A",
            "TP", "i1_5", "TP", "i1_5"),                   # CNV insertion
        rec(20, refs["c"][20] + refs["c"][21], refs["c"][20],
            "FN", "d1_5", ".", "."),                       # non-CNV deletion
    ])
    data = ps.count(vcf, refs)
    assert data.types[ps.SUB, ps.TP] == 1
    assert data.types[ps.SUB, ps.FN] == 1
    assert data.types[ps.SUB, ps.FP] == 1
    assert data.types[ps.INS, ps.TP] == 1
    assert data.types[ps.DEL, ps.FN] == 1
    # the insertion extends the A-homopolymer (CNV); deletion is general
    assert data.cnvs[ps.TRUE] == 1 and data.cnvs[ps.FALSE] == 1


def test_count_complex(tmp_path):
    refs = {"c": "ACGTACGTACGTACGTACGTACGTACGTACGT"}
    vcf = _vcf(tmp_path, [
        # multi-allelic with het-alt GT -> complex (reference :85-95)
        rec(2, "G", "T,GA", "TP", "ti", "TP", "ti", gt="1/2"),
        # tuple BI -> complex
        rec(8, "A", "G", "FN", "t1,i2", ".", "."),
    ])
    data = ps.count(vcf, refs)
    assert data.types[ps.CPX, ps.TP] == 1
    assert data.types[ps.CPX, ps.FN] == 1
    assert data.types[ps.SUB].sum() == 0


def test_deletion_cnv(tmp_path):
    # deletion of one unit of a 2-polymer starting right after the allele
    refs = {"c": "GG" + "AT" * 6 + "CCGGTTACGTACTGAC"}
    vcf = _vcf(tmp_path, [
        rec(1, "GAT", "G", "TP", "d1_5", "TP", "d1_5"),
    ])
    data = ps.count(vcf, refs)
    assert data.cnvs[ps.TRUE] == 1 and data.cnvs[ps.FALSE] == 0


def test_sankey_render(tmp_path):
    datas = []
    for i in range(7):
        d = ps.VcfCounts()
        d.types[ps.SUB, ps.TP] = 3 + i
        d.types[ps.INS, ps.FN] = i
        d.types[ps.DEL, ps.FP] = 1
        d.cnvs[:] = (2, i)
        datas.append(d)
    sizes = {f"np_{i}": 100 * (7 - i) for i in range(7)}
    sizes["all"] = sizes["np_all"] = sum(sizes.values())
    ps.plot_sankey(datas, sizes, str(tmp_path))
    assert os.path.exists(tmp_path / "sankey1.png")
    assert os.path.exists(tmp_path / "sankey2.png")
