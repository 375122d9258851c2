"""plot_results.py end-to-end on synthetic hap.py outputs (reference:
scripts/plot_results.py — its goldens are visual, so this pins the csv
parsing, zoom mapping, and that a figure renders)."""
import gzip
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

import plot_results  # noqa: E402


def _write_fixture(prefix):
    with open(prefix + ".summary.csv", "w") as fh:
        fh.write("Type,Filter,METRIC.Recall,METRIC.Precision\n"
                 "SNP,PASS,0.995,0.996\n"
                 "SNP,ALL,0.4,0.4\n"
                 "INDEL,PASS,0.90,0.92\n")
    with open(prefix + ".roc.Locations.SNP.PASS.csv", "w") as fh:
        fh.write("h,h,h,h,h,h,h,recall,precision\n")
        fh.write("0,0,0,0,0,0,0,0.990,0.994\n")
        fh.write("0,0,0,0,0,0,0,bad,row\n")          # tolerated
    with gzip.open(prefix + ".roc.all.csv.gz", "wt") as fh:
        fh.write("Type,Subtype,Filter,METRIC.Recall,METRIC.Precision\n"
                 "INDEL,*,ALL,0.88,0.91\n"
                 "INDEL,I16_PLUS,ALL,0.2,0.2\n")


def test_parsers_and_zoom(tmp_path):
    pre = str(tmp_path / "run1")
    _write_fixture(pre)
    s = plot_results.read_summary(pre)
    assert s["SNP"] == (0.996, 0.995)       # PASS row only, (P, R)
    snp = plot_results.read_roc_points(pre, "SNP")
    assert snp == [(0.990, 0.994)]          # per-type PASS csv preferred
    ind = plot_results.read_roc_points(pre, "INDEL")
    assert ind == [(0.88, 0.91)]            # gz fallback, Subtype == '*'
    zr, zp = plot_results.zoom_point(0.995, 0.998, 0.99)
    assert zr == pytest.approx(plot_results.BOXX
                               + plot_results.BOXW * 0.5)
    assert zp == pytest.approx(plot_results.BOXX
                               + plot_results.BOXW * 0.8)


def test_plot_results_e2e(tmp_path):
    pre = str(tmp_path / "run1")
    _write_fixture(pre)
    out = str(tmp_path / "pr.png")
    rc = plot_results.main(plot_results.argparser().parse_args([out, pre]))
    assert rc == 0 and os.path.getsize(out) > 0
