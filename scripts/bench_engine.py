"""Engine-level microbench: windows -> extended CIGARs, steady state.

Separates device-engine throughput from the host decode/normalize path that
bench.py includes. Usage:

    PALLAS_AXON_REMOTE_COMPILE=1 python scripts/bench_engine.py [replicas]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from npore_tpu.constants import bases_to_int
    from npore_tpu.engine.pallas_engine import PallasEngine
    from npore_tpu.engine.realigner import AlignItem
    from npore_tpu.io.bam import BamReader
    from npore_tpu.io.cigar import expand_cigar
    from npore_tpu.model.scores import (calc_score_matrices,
                                        load_confusion_matrices)

    subs, nps, inss, dels = load_confusion_matrices(
        os.path.join(REPO, "guppy5_stats"))
    sub_scores, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)

    items = []
    for r in BamReader(os.path.join(REPO, "tests/data/reads.bam")):
        if r.is_secondary or r.is_supplementary or r.is_unmapped:
            continue
        cig = expand_cigar(r.cigar).replace("S", "").replace("H", "")
        items.append(AlignItem(
            bases_to_int(r.get_reference_sequence().upper()),
            bases_to_int(r.query_alignment_sequence.upper()), cig))

    eng = PallasEngine(sub_scores, np_scores)
    work = items * rep
    eng.align_batch(items * 4)        # warmup/compile
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.align_batch(work)
        dt = time.perf_counter() - t0
        assert len(out) == len(work)
        best = max(best, len(work) / dt)
    print(f"engine-level: {best:.0f} reads/s "
          f"({len(work)} reads, bails={eng.bail_count})")


if __name__ == "__main__":
    main()
