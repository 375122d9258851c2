"""Standalone legend figure for the P/R plots (reference:
scripts/plot_legend.py).

usage: python scripts/plot_legend.py <out.png> <label1> [label2 ...]
"""
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main() -> int:
    out = sys.argv[1]
    labels = sys.argv[2:] or ["original", "npore-tpu realigned"]
    fig = plt.figure(figsize=(6, 0.5 + 0.3 * len(labels)))
    cmap = plt.get_cmap("tab10")
    handles = [plt.Line2D([0], [0], marker="o", linestyle="",
                          color=cmap(i % 10), label=lab)
               for i, lab in enumerate(labels)]
    fig.legend(handles=handles, loc="center", frameon=False)
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
