"""XLA prepass: build the Pallas engine's linear tables and score tiles
on device.

From raw int8 window sequences this emits, all position-linear in
128-lane tiles (the DP kernel block-aligns everything itself with
aligned-2-tile DMAs + lane selects):
  * the (B, NL, P2/128, 128) lin tables (bases + n-polymer L/LZ planes;
    ref side position-linear, seq side reversed + bit-packed),
  * the (B, QC+5, P2/128, 128) COMMON score planes (np-score k<=KSHORT,
    SAT, LB per (side, period) + 5 substitution planes) and the
    (B, QR, P2/128, 128) RARE planes (k in (KSHORT, KMAXN]) the DP
    fetches on demand in its full-ladder tier, and
  * the (G, W, T, 128) position-linear steps tiles.

np_info runs as segmented scans (ops/npinfo_device.py); moving all of
this onto the device keeps per-group H2D under ~1MB across the
~25ms-latency tunnel.
"""
from __future__ import annotations

import os as _os

import numpy as np

from ..ops.pallas_dp import BLK, KMAXN, KSHORT, LANES


def ct_layouts(max_n: int, kmaxn=KMAXN, kshort: int = 8):
    """Split score-plane layouts, pair-major per period.

    COMMON planes (always DMA'd per DP block): k = 1..min(K, kshort),
    SAT, LB per (side, n) — everything the DP's common k-select tier
    reads (+5 substitution planes the prepass appends). RARE planes
    (fetched on demand inside the full-ladder cond): k in (kshort, K].
    Splitting cuts the DP's per-block score DMA ~3.2x at production
    KMAXN (r4 ppcum: the DP became DMA-stall bound once the prepass
    block expansion moved into the kernel).

    Returns (offc, QC, offr, QR, kcs): offsets into the common/rare
    arrays and per-period common ladder depths kcs[ni] = min(K, kshort).
    """
    offc = [[0] * max_n, [0] * max_n]
    offr = [[0] * max_n, [0] * max_n]
    kcs = []
    qc = qr = 0
    for ni in range(max_n):
        kc = min(kmaxn[ni], kshort)
        kcs.append(kc)
        for side in range(2):
            offc[side][ni] = qc
            qc += kc + 2                # k=1..kc, SAT, LB
            offr[side][ni] = qr
            qr += kmaxn[ni] - kc
    return offc, qc, offr, qr, tuple(kcs)


def _split3_bf16(tab: np.ndarray):
    """Exact 3-way bf16 mantissa split of an f32 table.

    Returns bf16 ``(p1, p2, p3)`` with ``p1 + p2 + p3 == tab`` bit-exact
    under f32 addition for every CONTIGUOUS-subset sum: the parts occupy
    disjoint descending <=8-bit mantissa segments, so {p1,p2}, {p2,p3}
    and the full sum (either association) are exactly representable in
    an f32 accumulator. That is sufficient because the caller stacks the
    parts in ascending K order on the contraction axis, and matmul
    K-accumulation (MXU systolic stream, blocked gemms, contiguous
    reduction trees) only ever combines contiguous K ranges — a
    {p1,p3}-without-p2 pairing (the one inexact combination: exponent
    promotion can exceed the 24-bit span) never occurs. One default-
    precision bf16 dot (K = 3*101) thus reconstructs the f32 one-hot
    lookup exactly — half the MXU work of HIGHEST's 6-pass f32
    emulation, with no extra materialized outputs. Returns None when any
    entry fails the round-trip (non-finite / subnormal edges); the
    caller then keeps the f32 HIGHEST-precision dot for that table."""
    import ml_dtypes
    x = np.ascontiguousarray(tab, np.float32)
    if not np.isfinite(x).all():
        return None
    p1 = x.astype(ml_dtypes.bfloat16)
    r1 = x - p1.astype(np.float32)
    p2 = r1.astype(ml_dtypes.bfloat16)
    r2 = r1 - p2.astype(np.float32)
    p3 = r2.astype(ml_dtypes.bfloat16)
    f = np.float32
    if ((p3.astype(f) == r2).all()
            and ((p1.astype(f) + p2.astype(f)) + p3.astype(f) == x).all()):
        return p1, p2, p3
    return None


def make_prepass(r_pad: int, G: int, W: int, max_n: int, max_l: int,
                 cont_cols, kmaxn=KMAXN, sub_scores=None, stop_after=None):
    """cont_cols: build_cont_cols() output (numpy; embedded as constants).
    sub_scores: (5,5) float32; when given, 5 extra ref-bound planes
    ``sub_scores[s, ref[pos]]`` are appended to the score tiles so the DP
    kernel selects the substitution penalty with a 5-way select on the
    seq base instead of a 25-way select on (seq, ref) pairs.
    stop_after: benchmarking hook (scripts/bench_dp_kernel.py --ppcum);
    one of "npinfo"/"tables"/"matmul" truncates the traced graph after
    that stage so cumulative in-fusion stage costs can be timed.
    Production passes None."""
    import jax
    import jax.numpy as jnp
    from ..ops.npinfo_device import np_info_device

    P2 = r_pad + 512
    PADL = 128
    A_OFF = r_pad + 128
    NL = 1 + 2 * max_n
    nblk = r_pad // BLK
    B = G * W
    offc, QC, offr, QR, kcs = ct_layouts(max_n, kmaxn, KSHORT)

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

        # ---- score planes: lookup by l per (side, n), full-k columns ----
        # The lookup runs on the LINEAR position axis (P2 per window), not
        # the per-block lane layout (nblk*128 = 2.67x the positions): the
        # DP kernel aligns score planes to each block with the same 2-tile
        # DMA + lane select it already uses for the lin planes, so the old
        # block gather and plane-major relayout transpose are gone
        # entirely (r4 ppcum on HW: gather 1.68 + matmul 15.14 + relayout
        # 6.77 ms of a 28.2 ms in-composite prepass).
        #
        # Lookup itself is a one-hot MXU matmul emitted PLANE-MAJOR: a
        # batched dot with the (broadcast) transposed table as LHS yields
        # (B, C, P2) directly — no output transpose. Rows of the one-hot
        # are exact unit vectors, so (with HIGHEST precision) the product
        # selects table rows bit-exactly — ~10x the throughput of an XLA
        # gather on this backend. Both sides of a period share one matmul
        # (ct_layout is pair-major).
        LV = cont_cols[0][0].shape[0]                      # 101 l values
        iota_l = jnp.arange(LV, dtype=jnp.int32)
        # default OFF — measured SLOWER on axon v5e despite halving MXU
        # passes: composite 33.0 vs 27.3 ms/group min-of-20 (the 3x bf16
        # one-hot materialization + (16,128)-tile relayouts outweigh the
        # matmul savings). Kept as an opt-in: it IS bit-exact (golden SAM
        # 10/10 on HW, full hermetic chain) and may win on backends where
        # the one-hot fuses into the dot operand.
        bf16_on = _os.environ.get("NPORE_PREPASS_BF16", "0") != "0"
        parts_c, parts_r = [], []
        for ni in range(max_n):
            T0 = np.asarray(cont_cols[0][ni])              # (101, K+2)
            T1 = np.asarray(cont_cols[1][ni])
            K = kmaxn[ni]
            kc = kcs[ni]
            # common: [k<=kc, SAT, LB] per side; rare: k in (kc, K]
            tabc = np.concatenate(
                [T0[:, :kc], T0[:, K:K + 2],
                 T1[:, :kc], T1[:, K:K + 2]], axis=1)
            tabr = np.concatenate([T0[:, kc:K], T1[:, kc:K]], axis=1)
            ohT = ohT3 = None
            for tab, parts in ((tabc, parts_c), (tabr, parts_r)):
                if tab.shape[1] == 0:
                    continue
                sp = _split3_bf16(tab) if bf16_on else None
                if sp is not None:
                    # exact bf16 reconstruction: the 3 mantissa parts ride
                    # the contraction axis (K = 3*LV) of one default-
                    # precision dot — see _split3_bf16's exactness note
                    if ohT3 is None:
                        iota3 = jnp.asarray(np.tile(
                            np.arange(LV, dtype=np.int32), 3))
                        ohT3 = (linr_lin[:, 1 + ni, None, :]
                                == iota3[None, :, None]
                                ).astype(jnp.bfloat16)     # (B, 3LV, P2)
                    tab3 = np.concatenate(sp, axis=0)      # (3LV, cols)
                    tabb = jnp.broadcast_to(jnp.asarray(tab3).T[None],
                                            (B, tab.shape[1], 3 * LV))
                    parts.append(jax.lax.dot_general(
                        tabb, ohT3, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32))
                    continue
                if ohT is None:
                    ohT = (linr_lin[:, 1 + ni, None, :]
                           == iota_l[None, :, None]
                           ).astype(jnp.float32)           # (B, LV, P2)
                tabb = jnp.broadcast_to(jnp.asarray(tab).T[None],
                                        (B, tab.shape[1], tab.shape[0]))
                parts.append(jax.lax.dot_general(
                    tabb, ohT, (((2,), (1,)), ((0,), (0,))),
                    precision=jax.lax.Precision.HIGHEST))  # (B, cols, P2)
        if sub_scores is not None:
            # sub planes: plane s holds sub_scores[s, ref[pos]], same
            # linear layout (exact via the same one-hot matmul)
            ohr = (linr_lin[:, 0, None, :]
                   == jnp.arange(5, dtype=jnp.int32)[None, :, None]
                   ).astype(jnp.float32)                   # (B, 5r, P2)
            subb = jnp.broadcast_to(jnp.asarray(
                np.asarray(sub_scores, np.float32))[None], (B, 5, 5))
            parts_c.append(jax.lax.dot_general(
                subb, ohr, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST))      # (B, 5s, P2)
        gc_ = jnp.concatenate(parts_c, axis=1)            # (B, QC+5, P2)
        ctc = gc_.reshape(B, gc_.shape[1], P2 // LANES, LANES)
        if parts_r:
            gr = jnp.concatenate(parts_r, axis=1) if len(parts_r) > 1 \
                else parts_r[0]                            # (B, QR, P2)
            ctr = gr.reshape(B, gr.shape[1], P2 // LANES, LANES)
        else:       # all K <= KSHORT: dummy plane, never DMA'd
            ctr = jnp.zeros((B, 1, P2 // LANES, LANES), jnp.float32)
        if stop_after == "matmul":
            return linr, lins, ctc, ctr

        # steps stay POSITION-LINEAR: the old per-block tile stack was
        # overlapping slices (stride BLK=48, length 128 — a 2.67x
        # expansion copy, +2.97 ms in-composite); the DP kernel instead
        # does one aligned 2-tile DMA per block + a dynamic roll
        steps = jnp.concatenate(
            [sd8.astype(jnp.int32),
             jnp.zeros((G, W, 256), jnp.int32)],
            axis=2).reshape(G, W, (r_pad + 256) // LANES, LANES)
        return linr, ctc, ctr, lins, steps

    return jax.jit(prepass)
