"""Sankey-style INDEL reclassification analysis (reference:
scripts/plot_sankey.py + scripts/sankey.py).

Classifies each variant of two hap.py-annotated VCFs (before/after
realignment) by n-polymer context — the reference runs get_np_info on a
+/-20bp reference window around each variant (scripts/plot_sankey.py:
117-150) — and draws the flow of TP/FP/FN categories between the two runs.

usage: python scripts/plot_sankey.py <before.vcf> <after.vcf> <ref.fasta> <out.png>
"""
import os
import sys
from collections import Counter

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npore_tpu.constants import bases_to_int
from npore_tpu.io.fasta import FastaFile
from npore_tpu.io.vcf import VcfReader
from npore_tpu.native import np_info

CTX = 20


def np_class(ref_fa, rec):
    """n-polymer category of a variant from its +/-CTX reference context
    (mirrors scripts/plot_sankey.py:117-150): the period of the longest
    repeat covering the variant start, or 0 for non-repeat."""
    beg = max(0, rec.pos - CTX)
    ctx = ref_fa.fetch(rec.contig, beg, rec.pos + CTX).upper()
    if not ctx:
        return 0
    info = np_info(bases_to_int(ctx).astype(np.uint8))
    at = min(rec.pos - beg, len(ctx) - 1)
    best_n, best_span = 0, 0
    for n in range(1, 7):
        l = int(info[at, 0, n - 1])
        if l and l * n > best_span:
            best_n, best_span = n, l * n
    return best_n


def classify(vcf_path, ref_fa):
    out = Counter()
    keys = {}
    for rec in VcfReader(vcf_path):
        verdict = "UNK"
        for field in (rec.info or "").split(";"):
            if field.startswith("BD=") or field.startswith("BVT="):
                pass
        # hap.py annotates per-sample BD (TP/FP/FN); fall back to FILTER
        bd = rec.sample_field("BD") or ("TP" if rec.filter == "PASS" else "FP")
        is_indel = any(len(a) != len(rec.alleles[0])
                       for a in rec.alleles[1:])
        cat = f"{'INDEL' if is_indel else 'SNP'}-np{np_class(ref_fa, rec)}"
        out[(bd, cat)] += 1
        keys[(rec.contig, rec.pos, rec.alleles)] = (bd, cat)
    return out, keys


def draw_sankey(flows, out_png):
    """Two-column flow diagram (compact reimplementation of the pySankey
    derivative in reference scripts/sankey.py)."""
    left_tot = Counter()
    right_tot = Counter()
    for (l, r), v in flows.items():
        left_tot[l] += v
        right_tot[r] += v
    lefts = sorted(left_tot)
    rights = sorted(right_tot)
    ly, ry = {}, {}
    y = 0.0
    for l in lefts:
        ly[l] = y
        y += left_tot[l]
    y = 0.0
    for r in rights:
        ry[r] = y
        y += right_tot[r]
    total = max(1, max(sum(left_tot.values()), sum(right_tot.values())))

    fig, ax = plt.subplots(figsize=(10, 7))
    cmap = plt.get_cmap("tab20")
    lofs = dict(ly)
    rofs = dict(ry)
    for i, ((l, r), v) in enumerate(sorted(flows.items())):
        y0, y1 = lofs[l], rofs[r]
        lofs[l] += v
        rofs[r] += v
        xs = np.linspace(0, 1, 50)
        ys0 = y0 + (y1 - y0) * (1 - np.cos(np.pi * xs)) / 2
        ax.fill_between(xs, ys0, ys0 + v, alpha=0.55,
                        color=cmap(i % 20), linewidth=0)
    for l in lefts:
        ax.text(-0.02, ly[l] + left_tot[l] / 2, f"{l} ({left_tot[l]})",
                ha="right", va="center", fontsize=9)
    for r in rights:
        ax.text(1.02, ry[r] + right_tot[r] / 2, f"{r} ({right_tot[r]})",
                ha="left", va="center", fontsize=9)
    ax.set_xlim(-0.35, 1.35)
    ax.set_ylim(0, total * 1.02)
    ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    print(f"wrote {out_png}")


def main() -> int:
    before, after, ref_path, out_png = sys.argv[1:5]
    ref_fa = FastaFile(ref_path)
    _, k_before = classify(before, ref_fa)
    _, k_after = classify(after, ref_fa)
    flows = Counter()
    for key, (bd_b, cat_b) in k_before.items():
        bd_a, _cat_a = k_after.get(key, ("GONE", ""))
        flows[(f"{bd_b} {cat_b}", f"{bd_a}")] += 1
    draw_sankey(flows, out_png)
    return 0


if __name__ == "__main__":
    sys.exit(main())
