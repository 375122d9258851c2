"""Device-engine parity: the batched XLA DP must be bit-identical to the
golden spec (small band/chunk configs keep CPU compiles fast; full-size
parity runs in test_cli_e2e / bench)."""
import numpy as np
import pytest

from npore_tpu.config import AlignConfig
from npore_tpu.constants import bases_to_int
from npore_tpu.engine.realigner import AlignItem, Realigner
from npore_tpu.golden.align import align as golden_align
from npore_tpu.io.cigar import expand_cigar

TOYS = [
    ("CAAAGAAAGAAAG", "CAAAGAAAGAAG", "9=1D3="),
    ("CAAAGAAAGAAAG", "CAAAGAAAAGAAAG", "5=1I8="),
    ("CAAAGAAAGAAAG", "CAAAGAAAAG", "5=4D1I4="),
    ("CAAAGAAAGAAAG", "CAAGAAAG", "1=5D7="),
    ("CGAAAGAAAGAAAG", "CGAAGAAAG", "2=5D7="),
    ("CGAAAGAAAGAAAC", "CGAAGAAAC", "2=5D7="),
]


@pytest.fixture(scope="module")
def small_cfg():
    return AlignConfig(r=10, max_b_rows=20)


def _items(cases):
    return [AlignItem(bases_to_int(r), bases_to_int(s), expand_cigar(c))
            for r, s, c in cases]


def test_engine_matches_golden_toys(score_matrices, small_cfg):
    sub_scores, np_scores, _, _ = score_matrices
    eng = Realigner(sub_scores, np_scores, small_cfg, engine="xla")
    got = eng.align_batch(_items(TOYS))
    for (ref, seq, cig), g in zip(TOYS, got):
        want = golden_align(bases_to_int(ref), bases_to_int(seq),
                            expand_cigar(cig), sub_scores, np_scores,
                            small_cfg)
        assert g == want, (ref, seq)


def test_engine_matches_golden_random(score_matrices, small_cfg):
    """Randomized mutated pairs, small band, multiple chunks per window."""
    sub_scores, np_scores, _, _ = score_matrices
    eng = Realigner(sub_scores, np_scores, small_cfg, engine="xla")
    rng = np.random.default_rng(7)
    cases = []
    for _ in range(12):
        n = int(rng.integers(30, 120))
        ref = "".join("ACGT"[i] for i in rng.integers(0, 4, n))
        # mutate: dels/inss/subs with exact cigar
        seq, cig = [], []
        for ch in ref:
            u = rng.random()
            if u < 0.05:
                cig.append("D")
                continue
            if u < 0.10:
                seq.append("ACGT"[rng.integers(0, 4)])
                cig.append("I")
            seq.append(ch)
            cig.append("=")
        cases.append((ref, "".join(seq), "".join(cig)))
    items = [AlignItem(bases_to_int(r), bases_to_int(s), c)
             for r, s, c in cases]
    got = eng.align_batch(items)
    for (ref, seq, cig), g in zip(cases, got):
        want = golden_align(bases_to_int(ref), bases_to_int(seq), cig,
                            sub_scores, np_scores, small_cfg)
        assert g == want, (ref, seq, cig)


def test_engine_repeat_rich(score_matrices, small_cfg):
    """Repeat-heavy sequences exercise LEN/SHR continue-runs (k >= 2)."""
    sub_scores, np_scores, _, _ = score_matrices
    eng = Realigner(sub_scores, np_scores, small_cfg, engine="xla")
    cases = [
        ("CAAAAAAAAAG", "CAAAAAG", "1=4D6="),          # 4-unit shrink
        ("CAAAAAG", "CAAAAAAAAAAG", "1=5I6="),         # 5-unit lengthen
        ("TATATATATATACG", "TATATATACG", "4D10="),     # 2-polymer shrink
        ("TATATACG", "TATATATATATACG", "6I8="),        # 2-polymer lengthen
        ("ACGACGACGACGT", "ACGACGACGACGACGACGT", "6I13="),  # 3-polymer
    ]
    got = eng.align_batch(_items(cases))
    for (ref, seq, cig), g in zip(cases, got):
        want = golden_align(bases_to_int(ref), bases_to_int(seq),
                            expand_cigar(cig), sub_scores, np_scores,
                            small_cfg)
        assert g == want, (ref, seq)
