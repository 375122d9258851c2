"""Synthetic test-data generator (reference: test/generate_bam.py).

Synthesizes a random reference and reads with 3%/5%/3% sub/ins/del noise,
exact '=XID' CIGARs, random positions and HP tags. Unlike the reference's
generator (which shells out to minimap2 via align.sh), records are written
directly with their true alignments, so fixtures need no external aligner.

Run as a script to regenerate fixture files:
    python tests/generate_data.py out_dir [ref_len] [n_reads]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npore_tpu.io.cigar import collapse_cigar
from npore_tpu.io.sam import SamRecord, make_header


def make_ref(rng, length: int = 1000) -> str:
    return "".join("ACGT"[i] for i in rng.integers(0, 4, length))


def make_read(rng, ref: str, min_len: int = 300, max_len: int = 700,
              p_sub: float = 0.03, p_ins: float = 0.05, p_del: float = 0.03):
    """Returns (pos, seq, extended_cigar) with the exact generating edits
    (reference: test/generate_bam.py:34-101)."""
    rlen = int(rng.integers(min_len, max_len + 1))
    pos = int(rng.integers(0, len(ref) - rlen))
    seq = []
    cig = []
    for ch in ref[pos:pos + rlen]:
        u = rng.random()
        if u < p_del:
            cig.append("D")
            continue
        if u < p_del + p_ins:
            seq.append("ACGT"[rng.integers(0, 4)])
            cig.append("I")
        if u < p_del + p_ins + p_sub:
            alt = "ACGT"[rng.integers(0, 4)]
            seq.append(alt)
            cig.append("=" if alt == ch else "X")
        else:
            seq.append(ch)
            cig.append("=")
    return pos, "".join(seq), "".join(cig)


def md_tag(ref: str, pos: int, cigar: str) -> str:
    """MD tag for an extended '=XID' CIGAR (samtools calmd semantics)."""
    out = []
    match = 0
    rp = pos
    i = 0
    n = len(cigar)
    while i < n:
        op = cigar[i]
        if op == "=":
            match += 1
            rp += 1
            i += 1
        elif op == "X":
            out.append(str(match))
            match = 0
            out.append(ref[rp])
            rp += 1
            i += 1
        elif op == "D":
            out.append(str(match))
            match = 0
            j = i
            while j < n and cigar[j] == "D":
                j += 1
            out.append("^" + ref[rp:rp + (j - i)])
            rp += j - i
            i = j
        else:          # I consumes only the query
            i += 1
    out.append(str(match))
    return "".join(out)


def generate(out_dir: str, ref_len: int = 1000, n_reads: int = 10,
             seed: int = 0):
    rng = np.random.default_rng(seed)
    ref = make_ref(rng, ref_len)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "ref.fasta"), "w") as fh:
        fh.write(">ref\n")
        for i in range(0, len(ref), 70):
            fh.write(ref[i:i + 70] + "\n")
    records = []
    for i in range(n_reads):
        pos, seq, cig = make_read(rng, ref)
        records.append(SamRecord(
            qname=f"read{i}", flag=0, rname="ref", pos=pos, mapq=60,
            cigar=collapse_cigar(cig), seq=seq, qual="I" * len(seq),
            tags={"HP": ("i", int(rng.integers(0, 3))),
                  "MD": ("Z", md_tag(ref, pos, cig))}))
    records.sort(key=lambda r: r.pos)
    path = os.path.join(out_dir, "reads.sam")
    with open(path, "w") as fh:
        for line in make_header(["ref"], [len(ref)], "generate_data"):
            fh.write(line + "\n")
        for rec in records:
            fh.write(rec.to_line() + "\n")
    return ref, records


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: generate_data.py out_dir [ref_len] [n_reads]")
    out = sys.argv[1]
    ref_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(out, ref_len, n)
    print(f"wrote {out}/ref.fasta and {out}/reads.sam ({n} reads)")
