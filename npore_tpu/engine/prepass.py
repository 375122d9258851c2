"""XLA prepass: build the Pallas engine's linear tables and score tiles
on device.

From raw int8 window sequences this emits:
  * the (B, NL, PB, 128) tiled linear tables (bases + n-polymer L/LZ
    planes; ref side position-linear, seq side reversed), and
  * the (B, nblk, QF, 128) per-block *score tiles*: np-score start /
    continuation / SAT / LB planes for every period n with full-k coverage
    (ops/pallas_dp.KMAXN), already gathered into each block's
    lane-aligned layout so the DP kernel only DMAs them (no in-kernel
    gathers or rolls).

np_info runs as segmented scans (ops/npinfo_device.py); moving all of
this onto the device keeps per-group H2D under ~1MB across the
~25ms-latency tunnel.
"""
from __future__ import annotations

import numpy as np

from ..ops.pallas_dp import BLK, KMAXN, LANES


def ct_layout(max_n: int, kmaxn=KMAXN):
    """Per-(side, n) plane offsets in the score tiles; QF total planes.

    Pair-major: both sides of one period sit adjacent, so the prepass
    emits each period's planes with a single table matmul."""
    offs = [[0] * max_n, [0] * max_n]
    q = 0
    for ni in range(max_n):
        for side in range(2):
            offs[side][ni] = q
            q += kmaxn[ni] + 2          # k=1..K, SAT, LB
    return offs, q


def make_prepass(r_pad: int, G: int, W: int, max_n: int, max_l: int,
                 cont_cols, kmaxn=KMAXN, sub_scores=None, stop_after=None):
    """cont_cols: build_cont_cols() output (numpy; embedded as constants).
    sub_scores: (5,5) float32; when given, 5 extra ref-bound planes
    ``sub_scores[s, ref[pos]]`` are appended to the score tiles so the DP
    kernel selects the substitution penalty with a 5-way select on the
    seq base instead of a 25-way select on (seq, ref) pairs.
    stop_after: benchmarking hook (scripts/bench_dp_kernel.py --ppcum);
    one of "npinfo"/"tables"/"gather"/"matmul"/"relayout" truncates the traced
    graph after that stage so cumulative in-fusion stage costs can be
    timed. Production passes None."""
    import jax
    import jax.numpy as jnp
    from ..ops.npinfo_device import np_info_device

    P2 = r_pad + 512
    PADL = 128
    A_OFF = r_pad + 128
    NL = 1 + 2 * max_n
    nblk = r_pad // BLK
    B = G * W
    offs, QF = ct_layout(max_n, kmaxn)

    assert max_n <= 6, "seq-plane bit packing holds at most 6 periods"

    def prepass(ref8, seq8, sd8, p0):
        # ref8/seq8: (B, r_pad) int8 zero-padded windows
        # sd8: (G, W, r_pad) int8 dels-steps; p0: (B, nblk) int32 block
        # coverage starts (ref positions, may be negative)
        ref = ref8.astype(jnp.int32)
        seq = seq8.astype(jnp.int32)

        # one np_info pass over ref+seq stacked on the batch axis: the
        # scanner is row-independent, so both sides share every scan
        # chain instead of compiling/running two copies
        Lb, LZb = np_info_device(
            jnp.concatenate([ref, seq], axis=0), max_n, max_l)
        if stop_after == "npinfo":
            return Lb, LZb

        def side(x, L, LZ):
            return jnp.concatenate(
                [x[:, None, :], jnp.minimum(L, 127), LZ], axis=1)

        pr = side(ref, Lb[:B], LZb[:B])
        # seq side: the DP advances its seq binding by one lane per row
        # (arow = t - acol), and a scratch-plane roll costs ~180ns/plane/
        # row on this backend (HW ablation: 13-plane advance = ~29% of the
        # composite). Pack base + L1..L6 + LZ1..LZ6 into TWO int32 planes
        # so the per-row advance is 2 rolls; readers unpack by shift+mask:
        #   plane0: base(3b) | L1<<3 | L2<<10 | L3<<17 | L4<<24
        #   plane1: L5 | L6<<7 | LZ1<<14 | .. | LZ6<<19
        psl = side(seq, Lb[B:], LZb[B:])
        pA = psl[:, 0, :]
        for ni in range(min(4, max_n)):
            pA = pA | (psl[:, 1 + ni, :] << (3 + 7 * ni))
        pB = jnp.zeros_like(pA)
        for ni in range(4, max_n):
            pB = pB | (psl[:, 1 + ni, :] << (7 * (ni - 4)))
        for ni in range(max_n):
            pB = pB | (psl[:, 1 + max_n + ni, :] << (14 + ni))
        ps = jnp.stack([pA, pB], axis=1)                 # (B, 2, r_pad)

        # pad to P2 columns with per-plane defaults by CONCAT (an
        # .at[].set into a zeros buffer lowers to full-tensor
        # dynamic-update-slices — two extra (B, NL, P2) copies)
        defr = np.zeros((NL, 1), np.int32)
        defr[1 + max_n:] = 1                             # LZ default 1
        linr_lin = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(defr), (B, NL, PADL)), pr,
             jnp.broadcast_to(jnp.asarray(defr),
                              (B, NL, P2 - PADL - r_pad))], axis=2)
        # packed defaults outside the window: L=0, LZ=1, base=0
        lz_def = sum(1 << (14 + ni) for ni in range(max_n))
        defs = np.zeros((2, 1), np.int32)
        defs[1] = lz_def
        lins_lin = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(defs), (B, 2, A_OFF + 1 - r_pad)),
             jnp.flip(ps, axis=2),
             jnp.broadcast_to(jnp.asarray(defs), (B, 2, P2 - A_OFF - 1))],
            axis=2)
        linr = linr_lin.reshape(B, NL, P2 // LANES, LANES)
        lins = lins_lin.reshape(B, 2, P2 // LANES, LANES)
        if stop_after == "tables":
            return linr, lins

        # ---- score tiles: lookup by l per (side, n), full-k columns ----
        # Gather order matters: first pull the (small) per-position l
        # planes into the per-block lane-aligned layout, then index the
        # tiny (101, K+2) tables. The reverse order (tables first) would
        # materialize a (B, P2, QF) intermediate and run the big gather
        # along a QF-wide axis — ~6x slower on the measured prepass.
        # Per-block lane-aligned layout WITHOUT a per-position gather
        # (measured 21.8 ms/group as take_along_axis over position): lane
        # j of block b is p(b, j) = p0 + ((j - p0) mod 128), which in
        # 128-lane tiles is exactly tile[c0][j] if j >= r0 else
        # tile[c0+1][j] with (c0, r0) = divmod(PADL + p0, 128) — a
        # 2-indices-per-block tile gather plus a lane select (the same
        # aligned-2-tile trick the DP kernel's DMA path uses).
        c0 = (PADL + p0) // LANES                         # (B, nblk)
        r0 = (PADL + p0) % LANES
        lint = linr_lin[:, 0:1 + max_n, :].reshape(
            B, 1 + max_n, P2 // LANES, LANES)
        tidx = jnp.stack([c0, c0 + 1], axis=2).reshape(B, 1, nblk * 2, 1)
        two = jnp.take_along_axis(
            lint, tidx, axis=2).reshape(B, 1 + max_n, nblk, 2, LANES)
        lane_i = jnp.arange(LANES, dtype=jnp.int32)
        lsel = lane_i[None, None, :] >= r0[:, :, None]    # (B, nblk, 128)
        blk_pl = jnp.where(lsel[:, None, :, :],
                           two[:, :, :, 0, :], two[:, :, :, 1, :])
        blk_pl = blk_pl.reshape(B, 1 + max_n, nblk * LANES)
        if stop_after == "gather":
            return linr, lins, blk_pl
        l_blk = blk_pl[:, 1:1 + max_n, :]                 # (B, max_n, nbl*128)
        # table lookup as a one-hot MXU matmul: rows of the one-hot are
        # exact unit vectors, so (with HIGHEST precision) the product
        # selects table rows bit-exactly — ~10x the throughput of an XLA
        # gather on this backend. Both sides of a period share one matmul
        # (ct_layout is pair-major).
        iota_l = jnp.arange(cont_cols[0][0].shape[0], dtype=jnp.int32)
        parts = []
        for ni in range(max_n):
            tab2 = jnp.asarray(np.concatenate(
                [np.asarray(cont_cols[0][ni]), np.asarray(cont_cols[1][ni])],
                axis=1))                                   # (101, 2K+4)
            oh = (l_blk[:, ni, :, None] == iota_l).astype(jnp.float32)
            parts.append(jax.lax.dot_general(
                oh, tab2, (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST))      # (B, npos, 2K+4)
        QT = QF
        if sub_scores is not None:
            # sub planes: plane s holds sub_scores[s, ref[pos]] in the same
            # lane-aligned layout (exact via the same one-hot matmul)
            r_blk = blk_pl[:, 0, :]                        # (B, nbl*128)
            oh_r = (r_blk[:, :, None] == jnp.arange(5, dtype=jnp.int32)
                    ).astype(jnp.float32)
            subT = jnp.asarray(np.ascontiguousarray(
                np.asarray(sub_scores, np.float32).T))      # [r, s]
            parts.append(jax.lax.dot_general(
                oh_r, subT, (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST))       # (B, npos, 5)
            QT = QF + 5
        g = jnp.concatenate(parts, axis=2)                # (B, nbl*128, QT)
        if stop_after == "matmul":
            return linr, lins, g
        # plane-major layout (G, nblk, QT, W, 128): the DP kernel reads
        # ct[plane] as a contiguous (W, 128) tile (a sublane-strided
        # (W, QT, 128) slice per read costs W strided micro-accesses) and
        # loads each block's tiles for ALL windows with ONE DMA
        cts = g.reshape(G, W, nblk, LANES, QT).transpose(0, 2, 4, 1, 3)
        if stop_after == "relayout":
            return linr, lins, cts

        # per-block steps tiles are CONTIGUOUS slices (blk*BLK + lane),
        # so a static stack replaces the jnp.take (measured 14.3 ms as a
        # gather — XLA gathers on this backend cost per-index)
        sd = jnp.concatenate(
            [sd8.astype(jnp.int32),
             jnp.zeros((G, W, 128), jnp.int32)], axis=2)
        steps = jnp.stack([sd[:, :, b * BLK:b * BLK + LANES]
                           for b in range(nblk)], axis=1)  # (G, nblk, W, 128)
        return linr, lins, steps, cts

    return jax.jit(prepass)
