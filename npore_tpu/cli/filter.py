"""Overlap-filter CLI (reference: src/filter.py): thin wrapper over
io.vcf.filter_overlaps.

Usage: python -m npore_tpu.cli.filter in.vcf out.vcf
"""
from __future__ import annotations

import argparse
import sys

from ..io.vcf import filter_overlaps


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("vcf", help="Input VCF.")
    p.add_argument("out", help="Output VCF with overlaps removed.")
    args = p.parse_args(argv)
    filter_overlaps(args.vcf, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
