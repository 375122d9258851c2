"""Benchmark harness: reads realigned/sec on one chip, vs CPU baseline.

Measures steady-state throughput of the device engine on the checked-in
test fixtures (tests/data/reads.sam: 10 ONT-like reads, 418-710 bp), with
the read set replicated to fill device batches. Prints ONE JSON line.

``vs_baseline`` compares against the reference's multicore Cython engine.
The reference cannot execute here (no pysam/Cython), so the baseline is
*measured* from this repo's C++ port of the reference kernel
(native/golden_align.cpp — a faithful single-thread reimplementation of
src/aln.pyx:379-787, bit-exact vs the golden spec): time it single-core on
the same fixture reads, multiply by the host's core count — the same
mp.Pool-over-all-cores setup as reference src/realign.py:110-114. The
kernel-only timing flatters the baseline (no read IO / normalization /
SAM write in its denominator), keeping ``vs_baseline`` conservative.
Override with env NPORE_BASELINE_RPS.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np


def baseline_reads_per_sec(reads, sub_scores, np_scores, cfg) -> float:
    env = os.environ.get("NPORE_BASELINE_RPS")
    if env:
        return float(env)
    ncores = os.cpu_count() or 8
    from npore_tpu.constants import bases_to_int
    from npore_tpu.io.cigar import expand_cigar
    from npore_tpu.native import get_lib, golden_align_native
    if get_lib() is None:               # no compiler: modeled fallback
        cells_per_read = 1130 * 61      # (seq+ref+1) rows x 61-wide band
        return 3.0e6 * ncores / cells_per_read
    items = []
    for r in reads:
        cig = expand_cigar(r.cigar).replace("S", "").replace("H", "")
        items.append((bases_to_int(r.get_reference_sequence().upper()),
                      bases_to_int(r.query_alignment_sequence.upper()), cig))
    for ref8, seq8, cig in items:       # warm caches/pages
        golden_align_native(ref8, seq8, cig, sub_scores, np_scores, cfg)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for ref8, seq8, cig in items:
            golden_align_native(ref8, seq8, cig, sub_scores, np_scores, cfg)
        dt = time.perf_counter() - t0
        best = max(best, len(items) / dt)
    return best * ncores


def main() -> None:
    from npore_tpu.engine.realigner import Realigner
    from npore_tpu.io.bam import BamReader, open_alignment_file
    from npore_tpu.model.scores import (calc_score_matrices,
                                        load_confusion_matrices)

    subs, nps, inss, dels = load_confusion_matrices(
        os.path.join(REPO, "guppy5_stats"))
    sub_scores, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)

    bam_path = os.path.join(REPO, "tests/data/reads.bam")
    reads = [r for r in BamReader(bam_path)
             if not (r.is_secondary or r.is_supplementary or r.is_unmapped)]

    rep = int(os.environ.get("NPORE_BENCH_REPLICAS", "256"))
    # the production streaming path, repeated: every replica pass re-reads
    # and re-decodes the BAM through the C++ reader (io/bam_native), so
    # per-read decode cost is honestly counted (and overlapped by the
    # realigner's prefetch thread, as in a real run over distinct reads)
    bam = open_alignment_file(bam_path)

    def work_iter():
        for _ in range(rep):
            for r in bam:
                if not (r.is_secondary or r.is_supplementary
                        or r.is_unmapped):
                    yield r

    n_work = rep * len(reads)
    rl = Realigner(sub_scores, np_scores, engine="pallas")

    # warmup: compile + one full pass
    list(rl.realign_records(iter(reads * 4), batch_size=256))

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = list(rl.realign_records(work_iter(), batch_size=1024))
        dt = time.perf_counter() - t0
        assert len(out) == n_work
        best = max(best, n_work / dt)

    from npore_tpu.config import AlignConfig
    base = baseline_reads_per_sec(reads, sub_scores, np_scores,
                                  AlignConfig())
    print(json.dumps({
        "metric": "reads_realigned_per_sec_single_chip",
        "value": round(best, 2),
        "unit": "reads/s",
        "vs_baseline": round(best / base, 2),
    }))


if __name__ == "__main__":
    main()
