"""Precision/recall plots from hap.py outputs (reference:
scripts/plot_results.py). Parses each run's ``*.roc.all.csv.gz`` /
``summary.csv`` and draws SNP+INDEL P/R scatter per BED stratum.

usage: python scripts/plot_results.py <out.png> <happy_prefix1> [prefix2 ...]
"""
import csv
import gzip
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def read_summary(prefix):
    """(type -> (precision, recall)) from hap.py summary.csv."""
    path = prefix + ".summary.csv"
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as fh:
        for row in csv.DictReader(fh):
            if row.get("Filter") == "PASS":
                out[row["Type"]] = (float(row["METRIC.Precision"] or 0),
                                    float(row["METRIC.Recall"] or 0))
    return out


def read_roc(prefix):
    """[(qual, precision, recall)] from the all-variants ROC csv."""
    path = prefix + ".roc.all.csv.gz"
    rows = []
    if not os.path.exists(path):
        return rows
    with gzip.open(path, "rt") as fh:
        for row in csv.DictReader(fh):
            if row.get("Subtype") == "*" and row.get("Filter") == "ALL":
                rows.append((float(row["QQ"] or 0),
                             float(row["METRIC.Precision"] or 0),
                             float(row["METRIC.Recall"] or 0)))
    return rows


def main() -> int:
    out_png = sys.argv[1]
    prefixes = sys.argv[2:]
    fig, axs = plt.subplots(1, 2, figsize=(13, 6))
    for vi, vtype in enumerate(("SNP", "INDEL")):
        ax = axs[vi]
        for prefix in prefixes:
            s = read_summary(prefix)
            if vtype in s:
                p, r = s[vtype]
                ax.scatter([r], [p], label=os.path.basename(prefix), s=60)
            roc = read_roc(prefix)
            if roc:
                ax.plot([x[2] for x in roc], [x[1] for x in roc], alpha=0.4)
        ax.set_xlabel("recall")
        ax.set_ylabel("precision")
        ax.set_title(vtype)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    print(f"wrote {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
