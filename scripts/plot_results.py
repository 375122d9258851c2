"""Precision/recall plots from hap.py outputs (reference:
scripts/plot_results.py). Parses each run's ROC csvs (the per-type
``*.roc.Locations.{SNP,INDEL}.PASS.csv`` the reference reads at :47-49,
falling back to ``*.roc.all.csv.gz`` / ``*.summary.csv``) and draws the
SNP + INDEL P/R scatter per run, including the reference's corner zoom
boxes (:66-101): points with P,R above the corner threshold re-plot inside
a magnified inset square with dotted connectors and percent labels.

usage: python scripts/plot_results.py [--zoom 0.99] [--zoom_indel 0.85]
           <out.png> <happy_prefix1> [prefix2 ...]
"""
import argparse
import csv
import gzip
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.patches as patches
import matplotlib.pyplot as plt

BOXX = 0.2          # zoom square origin (reference :7-8)
BOXW = 0.5          # zoom square width
COLORS = ["red", "purple", "green", "blue", "orange", "brown"]


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


def read_roc_points(prefix, vtype):
    """[(recall, precision)] — prefers the reference's per-type PASS csv
    (recall col 7, precision col 8, scripts/plot_results.py:52-59),
    falls back to the combined roc.all.csv.gz."""
    path = f"{prefix}.roc.Locations.{vtype}.PASS.csv"
    pts = []
    if os.path.exists(path):
        with open(path) as fh:
            first = True
            for line in fh:
                if first:
                    first = False
                    continue
                f = line.split(",")
                try:
                    pts.append((float(f[7]), float(f[8])))
                except (ValueError, IndexError):
                    pass
        return pts
    path = prefix + ".roc.all.csv.gz"
    if os.path.exists(path):
        with gzip.open(path, "rt") as fh:
            for row in csv.DictReader(fh):
                if (row.get("Type") == vtype and row.get("Subtype") == "*"
                        and row.get("Filter") == "ALL"):
                    try:
                        pts.append((float(row["METRIC.Recall"] or 0),
                                    float(row["METRIC.Precision"] or 0)))
                    except ValueError:
                        pass
    return pts


def draw_zoom_box(ax, corner):
    """Corner magnifier square + connectors + labels (reference :87-142)."""
    ax.add_patch(patches.Rectangle((corner, corner), .999 - corner,
                                   .999 - corner, fill=False, linewidth=2))
    ax.plot([BOXX, corner], [BOXX + BOXW, 1], color="k", linestyle=":")
    ax.plot([BOXX + BOXW, 1], [BOXX, corner], color="k", linestyle=":")
    ax.add_patch(patches.Rectangle((BOXX, BOXX), BOXW, BOXW, fill=False,
                                   linewidth=2))
    ax.text(BOXX - 0.01, BOXX, f"{corner * 100:g}%", ha="right",
            va="bottom")
    ax.text(BOXX, BOXX - 0.01, f"{corner * 100:g}%", ha="center", va="top")
    ax.text(BOXX - 0.01, BOXX + BOXW, "100%", ha="right", va="center")
    ax.text(BOXX + BOXW, BOXX - 0.01, "100%", ha="center", va="top")


def zoom_point(r, p, corner):
    """Map a (recall, precision) point into the zoom square."""
    return (BOXX + BOXW * (r - corner) / (1 - corner),
            BOXX + BOXW * (p - corner) / (1 - corner))


def main(args) -> int:
    fig, axs = plt.subplots(1, 2, figsize=(15, 7))
    corners = (args.zoom, args.zoom_indel)
    for vi, vtype in enumerate(("SNP", "INDEL")):
        ax = axs[vi]
        corner = corners[vi]
        for ci, prefix in enumerate(args.prefixes):
            color = COLORS[ci % len(COLORS)]
            name = os.path.basename(prefix)
            pts = read_roc_points(prefix, vtype)
            for r, p in pts:
                ax.plot(r, p, color=color, marker=".", linestyle="None")
                if corner and r > corner and p > corner:
                    zr, zp = zoom_point(r, p, corner)
                    ax.plot(zr, zp, color=color, marker=".",
                            linestyle="None")
            s = read_summary(prefix)
            if vtype in s:
                p, r = s[vtype]
                ax.plot(r, p, color=color, marker="+", markersize=14,
                        linestyle="None", label=name)
                if corner and r > corner and p > corner:
                    zr, zp = zoom_point(r, p, corner)
                    ax.plot(zr, zp, color=color, marker="+", markersize=14,
                            linestyle="None")
        if corner:
            draw_zoom_box(ax, corner)
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ticks = [0, 0.2, 0.4, 0.6, 0.8, 1]
        ax.set_xticks(ticks)
        ax.set_xticklabels([f"{int(t * 100)}%" for t in ticks])
        ax.set_yticks(ticks)
        ax.set_yticklabels([f"{int(t * 100)}%" for t in ticks])
        ax.set_xlabel("Recall")
        ax.set_ylabel("Precision")
        ax.set_title(vtype)
    handles = [patches.Patch(facecolor=COLORS[i % len(COLORS)],
                             label=os.path.basename(p))
               for i, p in enumerate(args.prefixes)]
    axs[1].legend(handles=handles, fontsize=10)
    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")
    return 0


def argparser():
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .png")
    p.add_argument("prefixes", nargs="+", help="hap.py output prefixes")
    p.add_argument("--zoom", type=float, default=0.99,
                   help="SNP zoom-box corner (0 disables)")
    p.add_argument("--zoom_indel", type=float, default=0.85,
                   help="INDEL zoom-box corner (0 disables)")
    return p


if __name__ == "__main__":
    sys.exit(main(argparser().parse_args()))
