#!/usr/bin/env python3
"""Mock hap.py: functional truth-vs-call VCF comparison so
scripts/happy.sh's full call x truth x stratum sweep can EXECUTE in-suite
(the real hap.py + rtg vcfeval are absent from this image; reference
invocation: /root/reference/scripts/happy.sh:85-100).

Implements the cheap core honestly on npore_tpu's own IO stack:
variants restricted to the -T stratum BED (and -R eval BED when given)
are matched exactly by (contig, pos, ref, alt); precision/recall are
computed per Type (SNP/INDEL) and emitted in hap.py's output shapes —
``{prefix}.summary.csv`` (Type/Filter/METRIC.* columns) and gzipped
``{prefix}.roc.Locations.{SNP,INDEL}.PASS.csv.gz`` ROC sweeps over QUAL
(recall col 7, precision col 8), exactly what scripts/plot_results.py
parses after happy.sh's gunzip step.
"""
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _mock_common  # noqa: E402,F401


def parse_args(argv):
    pos, opts = [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-r", "-T", "-R", "-o", "--roc", "--engine",
                 "--engine-vcfeval-template"):
            opts[a] = argv[i + 1]
            i += 2
        elif a.startswith("-"):
            opts[a] = True
            i += 1
        else:
            pos.append(a)
            i += 1
    return pos, opts


def read_bed(path):
    ivs = {}
    with open(path) as fh:
        for line in fh:
            f = line.split("\t")
            if len(f) >= 3:
                ivs.setdefault(f[0], []).append((int(f[1]), int(f[2])))
    return ivs


def in_bed(ivs, rec):
    for s, e in ivs.get(rec.contig, ()):
        if rec.pos < e and rec.stop > s:
            return True
    return False


def load(path, beds):
    from npore_tpu.io.vcf import VcfReader
    out = []
    for rec in VcfReader(path):
        if len(rec.alleles) < 2:
            continue
        if all(in_bed(b, rec) for b in beds):
            for alt in rec.alleles[1:]:
                vtype = ("SNP" if len(rec.alleles[0]) == 1 and len(alt) == 1
                         else "INDEL")
                out.append((rec.contig, rec.pos, rec.alleles[0], alt,
                            rec.qual or 0.0, vtype))
    return out


def prf(truth, call):
    tkeys = {v[:4] for v in truth}
    ckeys = {v[:4] for v in call}
    tp = len(tkeys & ckeys)
    fp = len(ckeys - tkeys)
    fn = len(tkeys - ckeys)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return tp, fp, fn, prec, rec


def main():
    pos, opts = parse_args(sys.argv[1:])
    truth_vcf, call_vcf = pos[0], pos[1]
    prefix = opts["-o"]
    beds = []
    if "-T" in opts:
        beds.append(read_bed(opts["-T"]))
    if "-R" in opts:
        beds.append(read_bed(opts["-R"]))
    truth = load(truth_vcf, beds)
    call = load(call_vcf, beds)

    sum_rows = []
    for vtype in ("SNP", "INDEL"):
        t = [v for v in truth if v[5] == vtype]
        c = [v for v in call if v[5] == vtype]
        tp, fp, fn, prec, rec = prf(t, c)
        for filt in ("ALL", "PASS"):
            sum_rows.append((vtype, filt, len(t), tp, fn, len(c), fp,
                             f"{rec:.6f}", f"{prec:.6f}"))
        # ROC: sweep QUAL thresholds over the call set (--roc QUAL)
        quals = sorted({v[4] for v in c})
        lines = ["Type,Subtype,Subset,Filter,Genotype,QQ.Field,QQ,"
                 "METRIC.Recall,METRIC.Precision,TRUTH.TP,QUERY.FP,"
                 "TRUTH.FN"]
        for q in quals:
            cq = [v for v in c if v[4] >= q]
            tp, fp, fn, prec, rec = prf(t, cq)
            lines.append(f"{vtype},*,*,PASS,*,QUAL,{q:g},{rec:.6f},"
                         f"{prec:.6f},{tp},{fp},{fn}")
        with gzip.open(f"{prefix}.roc.Locations.{vtype}.PASS.csv.gz",
                       "wt") as fh:
            fh.write("\n".join(lines) + "\n")

    with open(prefix + ".summary.csv", "w") as fh:
        fh.write("Type,Filter,TRUTH.TOTAL,TRUTH.TP,TRUTH.FN,QUERY.TOTAL,"
                 "QUERY.FP,METRIC.Recall,METRIC.Precision\n")
        for r in sum_rows:
            fh.write(",".join(str(x) for x in r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
