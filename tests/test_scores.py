"""Score-matrix construction invariants (reference: src/aln.pyx:11-96)."""
import numpy as np

from npore_tpu.model.scores import calc_score_matrices, fix_matrix_properties


def test_guppy5_scores(score_matrices):
    sub_scores, np_scores, ins_scores, del_scores = score_matrices
    assert sub_scores.shape == (5, 5) and sub_scores.dtype == np.float32
    assert np_scores.shape == (6, 101, 101) and np_scores.dtype == np.float32
    # diagonal is free; short-repeat rows start at the flat 20 and the
    # monotone sweeps only ramp them upward (src/aln.pyx:26-38)
    for n in range(6):
        assert np.all(np_scores[n].diagonal()[1:] == 0)
        assert np_scores[n, 0, 1] == 20
        offdiag = np_scores[n, :3, 1:] + 100 * np.eye(3, 101)[:, 1:]
        assert np.all(offdiag >= 20)
    assert np.all(sub_scores.diagonal() == 0)
    assert np.all(sub_scores[1:, 1:] + np.eye(4) * 100 > 0)


def test_monotonicity():
    """After fix-up: longer INDELs from the same repeat cost strictly more."""
    rng = np.random.default_rng(0)
    nps = rng.integers(0, 1000, size=(1, 12, 12)).astype(np.int64)
    subs = rng.integers(1, 100, size=(5, 5)).astype(np.int64)
    inss = rng.integers(1, 50, size=12).astype(np.int64)
    dels = rng.integers(1, 50, size=12).astype(np.int64)
    _, s, _, _ = calc_score_matrices(subs, nps, inss, dels, max_n=1, max_l=11)
    n = 0
    for i in range(4, 12):
        for j in range(i + 1, 12):      # insertions: increasing j
            assert s[n, i, j] > s[n, i, j - 1] or j - 1 == i
        for j in range(i - 1, -1, -1):  # deletions: decreasing j
            assert s[n, i, j] > s[n, i, j + 1] or j + 1 == i
