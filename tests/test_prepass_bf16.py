"""The opt-in bf16 3-split one-hot lookup (NPORE_PREPASS_BF16=1) must be
bit-exact vs the f32 HIGHEST-precision dot it replaces.

The split stacks three bf16 mantissa parts along the contraction axis of
one default-precision dot; the MXU/XLA f32 accumulator reconstructs the
f32 table value exactly because the parts occupy disjoint <=8-bit
mantissa segments (every partial sum spans <=24 bits). Default is OFF on
axon v5e — measured slower in-composite (33.0 vs 27.3 ms/group, see
PERF.md) — but the path stays covered here so the switch remains safe.

Reference semantics under test: the np-score lookup of
/root/reference/src/aln.pyx:255-274 as tabulated by build_cont_cols.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from npore_tpu.engine.prepass import _split3_bf16, ct_layouts
from npore_tpu.model.scores import (calc_score_matrices,
                                    load_confusion_matrices)
from npore_tpu.ops.pallas_dp import KMAXN, build_cont_cols

import os

STATS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "guppy5_stats")


def _production_tables():
    subs, nps, inss, dels = load_confusion_matrices(STATS)
    _, np_scores, _, _ = calc_score_matrices(subs, nps, inss, dels)
    cc = build_cont_cols(np_scores)
    _, _, _, _, kcs = ct_layouts(6)
    tabs = []
    for ni in range(6):
        T0, T1 = np.asarray(cc[0][ni]), np.asarray(cc[1][ni])
        K, kc = KMAXN[ni], kcs[ni]
        tabs.append(np.concatenate(
            [T0[:, :kc], T0[:, K:K + 2], T1[:, :kc], T1[:, K:K + 2]], 1))
        tabr = np.concatenate([T0[:, kc:K], T1[:, kc:K]], 1)
        if tabr.shape[1]:
            tabs.append(tabr)
    return tabs


def test_split_reconstructs_production_tables_exactly():
    tabs = _production_tables()
    assert tabs
    for tab in tabs:
        sp = _split3_bf16(tab)
        assert sp is not None
        f = np.float32
        # every CONTIGUOUS-subset sum is exact: matmul K-accumulation
        # (MXU systolic stream, blocked gemms, contiguous reduction
        # trees) only combines contiguous K ranges, and the parts sit at
        # K positions l < l+101 < l+202 — so {p1,p2}, {p2,p3} and the
        # full sum in either association are the only sums ever formed.
        # ({p1,p3} without p2 is NOT exact in general — exponent
        # promotion can exceed the 24-bit span — and never occurs.)
        a, b, c = (p.astype(f) for p in sp)
        x = tab.astype(f)
        assert ((a + b) + c == x).all()
        assert (a + (b + c) == x).all()
        assert (x - (a + b) == c).all()
        assert (x - (b + c) == a).all()


def test_nonfinite_table_falls_back():
    bad = np.array([[1.0, np.inf], [0.5, 2.0]], np.float32)
    assert _split3_bf16(bad) is None


def test_bf16_stacked_dot_equals_highest_f32_dot():
    """The exact jnp computation the prepass emits, both paths, tiny B."""
    rng = np.random.default_rng(11)
    tabs = _production_tables()[:3]
    B, P2 = 4, 256
    for tab in tabs:
        LV = tab.shape[0]
        lin = rng.integers(0, LV, size=(B, P2)).astype(np.int32)
        linj = jnp.asarray(lin)
        oh = (linj[:, None, :] == jnp.arange(LV, dtype=jnp.int32)
              [None, :, None]).astype(jnp.float32)
        tabb = jnp.broadcast_to(jnp.asarray(tab).T[None],
                                (B, tab.shape[1], LV))
        ref = jax.lax.dot_general(
            tabb, oh, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)

        sp = _split3_bf16(tab)
        iota3 = jnp.asarray(np.tile(np.arange(LV, dtype=np.int32), 3))
        oh3 = (linj[:, None, :] == iota3[None, :, None]
               ).astype(jnp.bfloat16)
        tab3 = np.concatenate(sp, axis=0)
        tabb3 = jnp.broadcast_to(jnp.asarray(tab3).T[None],
                                 (B, tab.shape[1], 3 * LV))
        got = jax.lax.dot_general(
            tabb3, oh3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        assert np.array_equal(np.asarray(ref), np.asarray(got))
