"""Differential fuzz: Pallas engine vs the golden executable spec.

Generates mutated read/ref pairs with tunable repeat density (n-polymer
contexts are where the interesting transitions live) and asserts identical
extended CIGARs. Run any time kernels change:

    python scripts/fuzz_parity.py [n_cases] [seed]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from npore_tpu.config import AlignConfig
from npore_tpu.constants import bases_to_int
from npore_tpu.engine.pallas_engine import PallasEngine
from npore_tpu.engine.realigner import AlignItem
from npore_tpu.golden.align import align as golden_align
from npore_tpu.model.scores import calc_score_matrices, load_confusion_matrices

STATS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "guppy5_stats")


def make_case(rng):
    """Random ref with injected repeats + mutated read with exact CIGAR."""
    n = int(rng.integers(60, 900))
    parts = []
    while sum(len(p) for p in parts) < n:
        u = rng.random()
        if u < 0.5:      # random sequence
            k = int(rng.integers(5, 40))
            parts.append("".join("ACGT"[i] for i in rng.integers(0, 4, k)))
        else:            # n-polymer run
            period = int(rng.integers(1, 7))
            unit = "".join("ACGT"[i] for i in rng.integers(0, 4, period))
            reps = int(rng.integers(3, 30))
            parts.append(unit * reps)
    ref = "".join(parts)[:n]
    seq, cig = [], []
    p_del, p_ins, p_sub = 0.03, 0.05, 0.03
    for ch in ref:
        u = rng.random()
        if u < p_del:
            cig.append("D")
            continue
        if u < p_del + p_ins:
            ins_len = 1 + int(rng.random() < 0.3) * int(rng.integers(1, 6))
            for _ in range(ins_len):
                seq.append("ACGT"[rng.integers(0, 4)])
                cig.append("I")
        if u < p_del + p_ins + p_sub:
            alt = "ACGT"[rng.integers(0, 4)]
            seq.append(alt)
            cig.append("=" if alt == ch else "X")
        else:
            seq.append(ch)
            cig.append("=")
    return ref, "".join(seq), "".join(cig)


def main() -> int:
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)

    subs, nps, inss, dels = load_confusion_matrices(STATS)
    sub_scores, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)
    cfg = AlignConfig()
    eng = PallasEngine(sub_scores, np_scores, cfg)

    cases = [make_case(rng) for _ in range(n_cases)]
    items = [AlignItem(bases_to_int(r), bases_to_int(s), c)
             for r, s, c in cases]
    t0 = time.perf_counter()
    got = eng.align_batch(items)
    print(f"device: {n_cases} cases in {time.perf_counter()-t0:.1f}s, "
          f"bails={eng.bail_count}")
    bad = 0
    for i, (it, g) in enumerate(zip(items, got)):
        want = golden_align(it.ref, it.seq, it.cigar, sub_scores, np_scores,
                            cfg)
        if g != want:
            bad += 1
            print(f"MISMATCH case {i} (seed={seed}): ref len {len(it.ref)}")
            print(f"  got : {g[:80]}...")
            print(f"  want: {want[:80]}...")
    print(f"parity: {n_cases - bad}/{n_cases}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
