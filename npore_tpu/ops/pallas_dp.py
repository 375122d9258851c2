"""Fused Pallas TPU engine: banded n-polymer DP + on-device traceback.

Replaces the XLA-scan engine (ops/band_dp.py) with a Mosaic kernel pair
designed around measured axon-v5e characteristics: vector ops ~1.3ns per
(32,128) tile, static lane rolls ~free, lane-gathers / dynamic rolls
~0.4us, no sublane gathers beyond (8,128), no scalar indexed VMEM loads,
no in-kernel transposes, and host<->device transfers with ~25ms latency.

Reference semantics: src/aln.pyx:379-787 via the bit-exact re-derivation in
ops/band_dp.py (golden-parity tested). Reformulations:

* Lane binding ``lane = acol mod 128`` turns every DP dependency into a
  static lane roll: INS (arow-1,acol) same lane @t-1; DEL (arow,acol-1)
  roll 1 @t-1; MAT diag roll 1 @t-2; LEN (arow-n,acol) same lane @t-n;
  SHR (arow,acol-n) roll n @t-n. History planes ride the fori_loop carry.
* W (=DEFAULT_W) windows per grid program stacked on sublanes; rows advance in a
  fori_loop with a ~30-plane carry (the reference's LEN/SHR anchor
  coordinates are carried as value+run only — the coordinate validity
  checks of src/aln.pyx:622-633 reduce to run>0 plus an acol==n test for
  SHR's first-column case); per-window scalars (dels[t]) are carried and
  advanced from a rolling steps tile.
* Ref-bound tables (bases, L, L_IDX==0 bits, np-score start/continuation
  values for k in [1, k_cont+1]) are DMA'd per 48-row block from linear
  HBM tables and aligned to the lane binding with one dynamic roll per
  window per block; continuation scores are selected by k with unrolled
  lane-wise selects. Runs needing k beyond the covered ladder set a
  per-window bail flag; the engine first re-runs bailed windows through
  an extended-coverage composite (full-saturation k-ladder at
  8 windows/program — engine/pallas_engine.py rescue pass), and only
  still-bailed alignments fall back to the exact C++ golden engine.
* Traceback is a backward lockstep sweep over the packed (typ | run<<3)
  MAT planes, emitting (op | count<<2) slots into 128-row lane tiles; the
  host decodes slots ascending-row = forward CIGAR. Only ~4B/row/window
  crosses the tunnel.

R_pad must be a multiple of 384 (= lcm(BLK=48, slot tile 128)).
"""
from __future__ import annotations

import functools
import numpy as np

MAT, INS, LEN, DEL, SHR = 0, 1, 2, 3, 4
LANES = 128
BLK = 48          # DP rows per block (coverage span 47+2r+14 <= 127)
UNROLL = 1        # default DP rows per loop body (must divide BLK);
                  # override per-process with NPORE_DP_UNROLL (6 = lcm of
                  # every carried history period — turns the tuple
                  # rotations into SSA renames inside the unrolled body)
TBLK = 64         # traceback rows per block (2 blocks per 128-row tile)
PAD0 = 48         # leading pad columns of linear tables
DEFAULT_W = 32    # windows per grid program (W=24 measured 145.6 vs
                  # 120.5 us/window at r_pad=1536: per-program block cost
                  # is op-issue bound, so fewer windows/program wastes
                  # lane capacity — keep 32 and pay VMEM elsewhere)
W = DEFAULT_W
RQ = 384          # R_pad quantum
MAXB_Q = 192      # runtime row-count quantum: lcm(BLK, TBLK), so the
                  # dynamic block loops in both kernels divide evenly

OP_EQ, OP_X, OP_I, OP_D = 0, 1, 2, 3

# per-n continuation coverage: k = run//n + 1 is bounded by band residence
# (run <= 2r+1 + n + slack; the r4 full bound was (70,37,25,20,17,15)),
# but k beyond the ladder is still exact: the LB plane prunes can't-win
# gap candidates, and the rare can-win remainder gap-bails into the
# on-device EXTENDED rescue composite (full-saturation ladder). Round 5
# trimmed the ladder to fit the prefetch ring + rare planes + Mosaic's
# ~5MB kernel stack inside the 16MB scoped-VMEM limit at W=32; fuzz and
# the fixture measure bails=0 at this depth (PERF.md round-5).
KMAXN = (48, 27, 19, 15, 13, 11)
KSHORT = 8        # common-path ladder depth of the two-tier k-select


def build_cont_cols(np_scores: np.ndarray, max_n: int = 6,
                    max_l: int = 100, kmaxn=KMAXN):
    """Per-(side, n) lookup tables for the prepass: T[side][ni] has shape
    (101, KMAXN[ni]+2) with columns [np_score(n, l, +/-k) for k=1..KMAXN,
    SAT, LB]; row index = clamped ref n-polymer length l. Exact np_score
    semantics incl. the max_l-as-max_n clamp (src/aln.pyx:255-274)."""
    full = build_cont_lanes(np_scores, max_n, max_l, 126)  # k=1..127 exact
    out = []
    for side in range(2):
        row = []
        for ni in range(max_n):
            K = kmaxn[ni]
            t = np.empty((101, K + 2), np.float32)
            for k in range(1, K + 1):
                t[:, k - 1] = full[side, ni, k - 1, :101]
            # SAT: saturated value (ins: call clamps; del: invalid 100)
            t[:, K] = full[side, ni, 127, :101]
            # LB: min over the gap (KMAXN+1 .. saturation)
            ls = np.arange(101)
            lb = np.full(101, 100.0, np.float32)
            for l in range(101):
                sat_k = max(99 - l, 0) if side == 0 else min(l, 127)
                gap = [full[side, ni, k - 1, l]
                       for k in range(K + 1, sat_k + 1)]
                lb[l] = np.float32(min(gap)) if gap else np.float32(100)
            t[:, K + 1] = lb
            row.append(t)
        out.append(row)
    return out


def build_cont_lanes(np_scores: np.ndarray, max_n: int = 6, max_l: int = 100,
                     k_cont: int = 8) -> np.ndarray:
    """cont[side, ni, kk, l] = np_score(n, l, +/-(kk+1)), lane dim = l.
    kk=0 is the run-start score (k=1). Exact np_score semantics incl. the
    max_l-as-max_n clamp (reference: src/aln.pyx:255-274).

    Two extra slots follow the k planes:
      kk = k_cont+1 (SAT): the saturated score -- exact for every
        k >= 99-l on the insertion side (call length clamps at max_l-1)
        and for k > l on the deletion side (invalid -> 100).
      kk = k_cont+2 (LB): min over the uncovered gap
        k in [k_cont+2, saturation); used to prune can't-win candidates
        exactly (if anchor+LB >= current best, skipping is bit-exact).
    """
    out = np.full((2, max_n, k_cont + 3, LANES), 100.0, dtype=np.float32)
    ls = np.arange(LANES)
    for n in range(1, max_n + 1):
        tab = np_scores[n - 1]
        ref_c = np.minimum(ls, max_l - 1)
        for kk in range(k_cont + 1):
            k = kk + 1
            call_c = np.minimum(ls + k, max_l - 1)
            ins = tab[ref_c, call_c].astype(np.float32)
            out[0, n - 1, kk] = np.where((ls <= 0) | (ls > 100),
                                         np.float32(100), ins)
            call_d = ls - k
            ok = (ls > 0) & (ls <= 100) & (call_d >= 0)
            dele = tab[ref_c, np.clip(call_d, 0, max_l - 1)].astype(np.float32)
            out[1, n - 1, kk] = np.where(ok, dele, np.float32(100))
        # SAT
        ins_sat = tab[ref_c, max_l - 1].astype(np.float32)
        out[0, n - 1, k_cont + 1] = np.where((ls <= 0) | (ls > 100),
                                             np.float32(100), ins_sat)
        out[1, n - 1, k_cont + 1] = np.float32(100)
        # LB over the gap
        for l in range(1, 101):
            gi = [tab[min(l, max_l - 1), min(l + k, max_l - 1)]
                  for k in range(k_cont + 2, max(k_cont + 2, 99 - l))]
            out[0, n - 1, k_cont + 2, l] = (np.float32(min(gi))
                                            if gi else np.float32(100))
            gd = [tab[min(l, max_l - 1), l - k]
                  for k in range(k_cont + 2, min(l, 127) + 1)]
            out[1, n - 1, k_cont + 2, l] = (np.float32(min(gd))
                                            if gd else np.float32(100))
    return out


@functools.lru_cache(maxsize=None)
def get_dp_call(R_pad: int, G: int, r: int, indel_start: float,
                indel_extend: float, inf: float, max_n: int,
                interpret: bool, kmaxn=KMAXN, unroll: int = 0,
                w_win: int = 0):
    """Build the jittable DP pallas_call for (R_pad, G)-shaped batches.
    ``unroll=0`` means the module default; callers resolve any env
    override BEFORE calling (this function is lru_cached on its args).
    ``w_win`` overrides windows-per-program (default DEFAULT_W); the
    extended-coverage rescue composite uses 8 so its ~1100 rare score
    planes fit the 16MB scoped-VMEM limit."""
    W = w_win or DEFAULT_W
    if unroll == 0:
        unroll = UNROLL
    if unroll < 1 or BLK % unroll != 0:     # not assert: env-driven value,
        raise ValueError(                   # must fail under python -O too
            f"NPORE_DP_UNROLL/unroll={unroll} must divide BLK={BLK}")
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..engine.prepass import ct_layouts

    # EXPERIMENTAL cost-model ablations (NPORE_DP_ABLATE, comma list).
    # These deliberately produce WRONG alignments (except 'notier') and
    # exist only to measure where the per-row vector-op budget goes on
    # real hardware; never set in production.
    import os as _os
    ablate = frozenset(
        x for x in _os.environ.get("NPORE_DP_ABLATE", "").split(",") if x)

    assert R_pad % RQ == 0
    INF = np.float32(inf)
    istart = np.float32(indel_start)
    iext = np.float32(indel_extend)
    nblk = R_pad // BLK
    NL = 1 + 2 * max_n
    OFFC, QC, OFFR, QR, KCS = ct_layouts(max_n, kmaxn, KSHORT)
    QT = QC + 5       # common planes + ref-bound substitution planes
    QRT = max(QR, 1)  # rare planes (k > KSHORT; dummy plane when none)
    F32, I32 = jnp.float32, jnp.int32
    big = np.float32(np.inf)

    def roll(v, s):
        s = s % LANES
        return v if s == 0 else pltpu.roll(v, shift=s, axis=1)

    # rare-plane staging stays chunked (it loads on demand mid-block);
    # the common planes ride the parity rings below instead. 256KB cap:
    # the full-size ct ring + Mosaic's ~3.5MB kernel stack leave <1MB of
    # the 16MB scoped-VMEM limit (a 1MB cap overflowed by 44KB on HW)
    CHR = max(1, min(max(QR, 1), (1 << 18) // (W * 2 * LANES * 4)))
    NRCH = (QR + CHR - 1) // CHR

    def dp_kernel(p0c, p0r, s0c, s0r, maxb_s, sub_s,
                  scal_v, steps, linr, cts, ctr, lins,
                  bail_o, packed_o,
                  linri, ctri, seqri, lin_b, ct_b, rare_b, seq_b,
                  stri, rare2_b, packed_b, zbuf, rflag, sems):
        g = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(I32, (W, LANES), 1)
        b_rows = scal_v[:, 0:1]
        n_ins = scal_v[:, 1:2]
        n_del = scal_v[:, 2:3]
        ref_guard = scal_v[:, 3:4]
        seq_guard = scal_v[:, 4:5]
        maxb = maxb_s[g, 0]

        lane1 = jax.lax.broadcasted_iota(I32, (1, LANES), 1)

        # --- parity-ring block staging with cross-block prefetch --------
        # Each ring position j holds the 128-lane tile with index == j
        # (mod 2); a block's lane selects need tiles {t, t+1} resident.
        # Ref-bound offsets (p0c, steps' sc) are non-decreasing and seq
        # offsets (s0c) non-increasing, each by at most one tile per
        # block (BLK=48 < 128), so ONE single-tile DMA per window per
        # kind — issued during the PREVIOUS block and riding under its
        # row compute — maintains residency. This replaces the round-4
        # synchronous 2-tile staging DMAs (the ~36us serialized stall of
        # an ~83us block at r_pad=1536 — PERF.md round-4): block b+1's
        # tiles now land while block b's rows run. The re-copy is issued
        # unconditionally (same data when the tile index didn't advance)
        # so the semaphore counts stay uniform; waits reconstruct a
        # same-shaped descriptor, which Mosaic and interpret both treat
        # as a pure (semaphore, size) wait.
        def _start(src_sl, dst_sl, sem, tix):
            # two static-position branches: a dynamic parity slice on the
            # dst measured +0.75MB of Mosaic stack vs this form (scoped-
            # VMEM OOM on HW); exactly one branch fires, so semaphore
            # counts stay uniform
            @pl.when(tix % 2 == 0)
            def _():
                pltpu.make_async_copy(src_sl(tix), dst_sl(0), sem).start()

            @pl.when(tix % 2 == 1)
            def _():
                pltpu.make_async_copy(src_sl(tix), dst_sl(1), sem).start()

        def _wait(src_sl, dst_sl, sem):
            pltpu.make_async_copy(src_sl(0), dst_sl(0), sem).wait()

        def _kinds(w):
            # (src-tile slicer, ring-slot slicer, semaphore) per ring.
            # The ref-side table is FUSED (lin planes + bitcast f32 score
            # planes share p0c/p0r — engine/prepass.py), so one offset
            # stream drives both the lin and the ct ring.
            return (
                (lambda tix: linr.at[g * W + w, :, pl.ds(tix, 1), :],
                 lambda pos: linri.at[:, w, pl.ds(pos, 1), :], sems.at[0]),
                (lambda tix: lins.at[g * W + w, :, pl.ds(tix, 1), :],
                 lambda pos: seqri.at[:, w, pl.ds(pos, 1), :], sems.at[1]),
                (lambda tix: cts.at[g * W + w, :, pl.ds(tix, 1), :],
                 lambda pos: ctri.at[:, w, pl.ds(pos, 1), :], sems.at[4]),
            )

        _steps_kind = (
            lambda tix: steps.at[g, :, pl.ds(tix, 1), :],
            lambda pos: stri.at[:, pl.ds(pos, 1), :], sems.at[2])

        def pref_start(b):
            # the potentially-new tile for block b: hi tile for the
            # non-decreasing ref-side streams, lo tile for the
            # non-increasing seq stream
            for w in range(W):
                tixs = (p0c[w, b] + 1, s0c[w, b], p0c[w, b] + 1)
                for (src_sl, dst_sl, sem), tix in zip(_kinds(w), tixs):
                    _start(src_sl, dst_sl, sem, tix)
            src_sl, dst_sl, sem = _steps_kind
            _start(src_sl, dst_sl, sem, (b * BLK) // LANES + 1)

        def pref_wait():
            for w in range(W):
                for src_sl, dst_sl, sem in _kinds(w):
                    _wait(src_sl, dst_sl, sem)
            src_sl, dst_sl, sem = _steps_kind
            _wait(src_sl, dst_sl, sem)

        def align_block(b):
            # parity-XOR lane selects into the plane-major working
            # buffers: the 128-wide window at offset p0 in "lane = index
            # mod 128" binding is P[j] = tile_t[j] if j >= p0%128 else
            # tile_{t+1}[j]; with tile t at ring pos t%2 that becomes
            # where((j >= p0%128) ^ (t odd), pos0, pos1)
            for w in range(W):
                codd = (p0c[w, b] % 2) == 1
                cnd = (lane1 >= p0r[w, b]) ^ codd
                lin_b[:, w, :] = jnp.where(cnd, linri[:, w, 0, :],
                                           linri[:, w, 1, :])
                ct_b[:, w, :] = jnp.where(cnd, ctri[:, w, 0, :],
                                          ctri[:, w, 1, :])
                sodd = (s0c[w, b] % 2) == 1
                cnds = (lane1 >= s0r[w, b]) ^ sodd
                seq_b[:, w, :] = jnp.where(cnds, seqri[:, w, 0, :],
                                           seqri[:, w, 1, :])
            # seq planes: re-bind from (-a mod 128) to (T0 - a mod 128)
            seq_b[:] = pltpu.roll(seq_b[:], shift=(b * BLK) % LANES, axis=2)

        def CT(q):
            return ct_b[q]

        def CVAL(side, ni, kk):
            # continuation plane for k = kk: common tier holds
            # k <= KCS[ni]; deeper k live in the on-demand rare array
            kc = KCS[ni]
            if kk <= kc:
                return ct_b[OFFC[side][ni] + kk - 1]
            return rare_b[OFFR[side][ni] + kk - 1 - kc]

        def CSAT(side, ni):
            return ct_b[OFFC[side][ni] + KCS[ni]]

        def CLB(side, ni):
            return ct_b[OFFC[side][ni] + KCS[ni] + 1]

        def load_rare(b):
            # fetch the rare continuation planes for the CURRENT block
            # (cached per block via the SMEM flag at the call site); the
            # full-ladder tier is data-rare, so these 2-tile DMAs are
            # off the steady-state path entirely
            for c in range(NRCH):
                lo = c * CHR
                n_pl = min(QR, lo + CHR) - lo
                ds_ = []
                for w in range(W):
                    d = pltpu.make_async_copy(
                        ctr.at[g * W + w, pl.ds(lo, n_pl),
                               pl.ds(p0c[w, b], 2), :],
                        rare2_b.at[pl.ds(0, n_pl), w], sems.at[3])
                    d.start()
                    ds_.append(d)
                for d in ds_:
                    d.wait()
                for w in range(W):
                    rare_b[pl.ds(lo, n_pl), w, :] = jnp.where(
                        lane1 >= p0r[w, b],
                        rare2_b[pl.ds(0, n_pl), w, 0, :],
                        rare2_b[pl.ds(0, n_pl), w, 1, :])

        def row_step(t, i, carry, n_hi=max_n):
            # LEN/SHR carry only (value, run, anchor-value): the anchor
            # COORDINATE planes of the scalar reference (aln.pyx:622-633
            # validity checks) are provably redundant here — every stored
            # anchor already satisfies them (writes are gated by src_ok,
            # dead lanes store 0), except SHR continuation from a
            # first-column-initialized cell, which the consumer recomputes
            # as acol == n (the source at acol-n was first_col)
            (mv, mt, mr, lr, lav, sr, sav,
             p_insv, p_insr, p_delv, p_delr, dels_now, dh, bail,
             steps_rot) = carry

            # lane 0 of the rolling steps tile holds this row's step: a
            # static slice + static roll per row instead of a cross-lane
            # one-hot reduction (~0.4us/row on this backend)
            step = steps_rot[:, 0:1]
            dels_now = dels_now + step

            acol_base = dels_now - 64
            acol = acol_base + ((lane - acol_base) % LANES)
            arow = t - acol
            bcol = acol - dels_now + r
            in_range = ((arow >= 0) & (acol >= 0) & (arow <= n_ins)
                        & (acol <= n_del) & (t <= b_rows - 1))
            wall = (bcol == 0) | (bcol == 2 * r)
            first_row = arow == 0
            first_col = acol == 0
            ref_zero = acol >= ref_guard

            def SEQ(d):
                return roll(seq_b[0], d - 1) & 7

            def REF(d):
                return roll(lin_b[0], 1 - d)

            def LREF(dd, ni):
                return roll(lin_b[1 + ni], -dd)

            def LZREF(dd, ni):
                return roll(lin_b[1 + max_n + ni], -dd)

            # seq planes are bit-packed (see engine/prepass.py): plane0 =
            # base | L1..L4, plane1 = L5 | L6 | LZ bits — so the per-row
            # advance is 2 scratch rolls instead of 13 (HW ablation: the
            # 13-plane advance was ~29% of the composite)
            def LSEQ(dd, ni):
                if ni < 4:
                    return (roll(seq_b[0], dd) >> (3 + 7 * ni)) & 127
                return (roll(seq_b[1], dd) >> (7 * (ni - 4))) & 127

            def LZSEQ(dd, ni):
                return (roll(seq_b[1], dd) >> (14 + ni)) & 1

            zi = lane * 0                      # lane-anchored {0,0} zeros
            zf = zi.astype(F32)
            bigf = zf + big

            # --- INS (src/aln.pyx:524-543) ---
            v1 = mv[0] + istart
            v2 = p_insv + iext
            use2 = v2 < v1
            run2 = jnp.where(arow == 1, 1, p_insr + 1)
            ins_v = jnp.where(use2, v2, v1)
            ins_r = jnp.where(use2, run2, 1)
            ins_v = jnp.where(first_row, (acol + 1).astype(F32) * INF, ins_v)
            ins_r = jnp.where(first_row, acol, ins_r)

            # --- DEL (src/aln.pyx:546-565) ---
            v1 = roll(mv[0], 1) + istart
            v2 = roll(p_delv, 1) + iext
            use2 = v2 < v1
            run2 = jnp.where(acol == 1, 1, roll(p_delr, 1) + 1)
            del_v = jnp.where(use2, v2, v1)
            del_r = jnp.where(use2, run2, 1)
            del_v = jnp.where(first_col, (arow + 1).astype(F32) * INF, del_v)
            del_r = jnp.where(first_col, arow, del_r)

            # --- LEN / SHR (gather form of src/aln.pyx:601-667) ---
            # Two-tier k-select: the continuation score lookup is a select
            # ladder over k = run//n + 1. Ladders to full KMAXN (k<=70) are
            # bail-free but cost ~370 select pairs per row; runs needing
            # k > KSHORT are rare (they require a long repeat actually being
            # followed), so rows are routed by a scalar lax.cond: the common
            # path unrolls only k<=KSHORT, and only rows whose carried runs
            # prove a k in (KSHORT, KMAXN] pay the full ladder. Lanes with
            # k > KMAXN take the SAT/LB path in either tier, so tier choice
            # never changes results (src/aln.pyx:622-633, 656-667).
            def lenshr(kuse):
                len_v = (arow + acol).astype(F32) * INF
                len_r, len_av = zi, zf
                shr_v = (arow + acol).astype(F32) * INF
                shr_r, shr_av = zi, zf
                bail_add = zi          # full-width: reduced once at the end

                for n in range(n_hi, 0, -1):
                    ni = n - 1
                    KU = kuse[ni]           # ladder depth for this tier
                    dels_n = dh[n - 1]
                    # ---- LEN source (arow-n, acol): same lane, row t-n ----
                    matv_src = mv[n - 1]
                    lenr_src = lr[n - 1]
                    lenav_src = lav[n - 1]
                    src_bcol = acol - dels_n + r
                    src_ok = ((arow - n >= 0) & (src_bcol >= 1)
                              & (src_bcol <= 2 * r - 1) & (t >= n))

                    l_n = jnp.where(ref_zero, 0, LREF(0, ni))
                    lz_n = jnp.where(ref_zero, 1, LZREF(0, ni))
                    sg = arow - n >= seq_guard
                    lseq_src = jnp.where(sg, 0, LSEQ(-n, ni))
                    lzseq_src = jnp.where(sg, 1, LZSEQ(-n, ni))

                    lenA = jnp.clip(n_ins + 1 - (arow - n), 0, n)
                    lenB = jnp.clip(n_del + 1 - acol, 0, n)
                    mok = lenA == lenB
                    if "nomatch" not in ablate:
                        for k in range(n):
                            mok = mok & ((k >= lenA)
                                         | (SEQ(1 - n + k) == REF(1 + k)))

                    valid = (src_ok & (l_n > 0) & (lseq_src > 0) & (lz_n == 1)
                             & mok & (bcol > 0))

                    start_case = lzseq_src == 1
                    cand_s = matv_src + CVAL(0, ni, 1)
                    k_c = lenr_src // n + 1
                    cont_val = bigf
                    for kk in range(1, KU + 1):
                        cont_val = jnp.where(k_c == kk,
                                             CVAL(0, ni, kk),
                                             cont_val)
                    cont_ok = lenr_src > 0
                    sat = CSAT(0, ni)
                    lbv = CLB(0, ni)
                    is_sat = k_c >= 99 - l_n
                    gap = (k_c > KU) & ~is_sat
                    cont_val = jnp.where(k_c > KU,
                                         jnp.where(is_sat, sat, bigf), cont_val)
                    cand = jnp.where(start_case, cand_s,
                                     jnp.where(cont_ok, cont_val + lenav_src,
                                               bigf))
                    if "noovf" not in ablate:
                        ovf = ((~start_case) & cont_ok & valid & in_range
                               & gap & (lenav_src + lbv < len_v))
                        bail_add = bail_add | ovf.astype(I32)
                    new_r = jnp.where(start_case, n, lenr_src + n)
                    new_av = jnp.where(start_case, matv_src, lenav_src)

                    upd = valid & (cand < len_v)
                    len_v = jnp.where(upd, cand, len_v)
                    len_r = jnp.where(upd, new_r, len_r)
                    len_av = jnp.where(upd, new_av, len_av)

                    # ---- SHR source (arow, acol-n): lane j-n, row t-n ----
                    matv_src2 = roll(mv[n - 1], n)
                    shrr_src = roll(sr[n - 1], n)
                    shrav_src = roll(sav[n - 1], n)
                    src_bcol2 = (acol - n) - dels_n + r
                    src_ok2 = ((acol - n >= 0) & (src_bcol2 >= 1)
                               & (src_bcol2 <= 2 * r - 1) & (t >= n))
                    rz2 = (acol - n) >= ref_guard
                    l_n2 = jnp.where(rz2, 0, LREF(-n, ni))
                    lz_n2 = jnp.where(rz2, 1, LZREF(-n, ni))
                    valid2 = src_ok2 & (l_n2 > 0) & (bcol < 2 * r)

                    start2 = lz_n2 == 1
                    cand_s2 = matv_src2 + roll(CVAL(1, ni, 1), n)
                    k_c2 = shrr_src // n + 1
                    cont_val2 = bigf
                    for kk in range(1, KU + 1):
                        cont_val2 = jnp.where(
                            k_c2 == kk, roll(CVAL(1, ni, kk), n),
                            cont_val2)
                    # anchorless first_col cells carry run=arow with no
                    # real anchor value; their lane is exactly acol == n
                    cont_ok2 = (shrr_src > 0) & (acol != n)
                    sat2 = roll(CSAT(1, ni), n)
                    lbv2 = roll(CLB(1, ni), n)
                    is_sat2 = k_c2 > l_n2
                    gap2 = (k_c2 > KU) & ~is_sat2
                    cont_val2 = jnp.where(k_c2 > KU,
                                          jnp.where(is_sat2, sat2, bigf),
                                          cont_val2)
                    cand2 = jnp.where(start2, cand_s2,
                                      jnp.where(cont_ok2,
                                                cont_val2 + shrav_src,
                                                bigf))
                    if "noovf" not in ablate:
                        ovf2 = ((~start2) & cont_ok2 & valid2 & in_range
                                & gap2 & (shrav_src + lbv2 < shr_v))
                        bail_add = bail_add | ovf2.astype(I32)
                    new_r2 = jnp.where(start2, n, shrr_src + n)
                    new_av2 = jnp.where(start2, matv_src2, shrav_src)

                    upd2 = valid2 & (cand2 < shr_v)
                    shr_v = jnp.where(upd2, cand2, shr_v)
                    shr_r = jnp.where(upd2, new_r2, shr_r)
                    shr_av = jnp.where(upd2, new_av2, shr_av)

                return (len_v, len_r, len_av,
                        shr_v, shr_r, shr_av, bail_add)

            klo = tuple(min(KSHORT, kmaxn[ni]) for ni in range(max_n))
            if "nolenshr" in ablate:
                iv = (arow + acol).astype(F32) * INF
                res = (iv, zi, zf, iv, zi, zf, zi)
            elif "notier" in ablate:
                res = lenshr(klo)
            elif klo != tuple(kmaxn):
                # a lane needs the full ladder iff some carried run implies
                # k = run//n + 1 in (KSHORT, KMAXN]; k > KMAXN lanes use the
                # SAT/LB path in both tiers
                need = zi == 1
                for n in range(1, n_hi + 1):
                    ni = n - 1
                    if kmaxn[ni] > klo[ni]:
                        for runp in (lr[ni], sr[ni]):
                            need = need | ((runp >= klo[ni] * n)
                                           & (runp < kmaxn[ni] * n))
                need_any = jnp.any(need)

                # rare continuation planes load lazily, once per block:
                # the SMEM flag is reset at block start, so the DMA runs
                # only on the first full-ladder row of a block (the
                # branches themselves stay pure — only this pl.when has
                # memory effects)
                @pl.when(need_any & (rflag[0] == 0))
                def _():
                    load_rare(t // BLK)
                    rflag[0] = 1

                res = jax.lax.cond(need_any,
                                   lambda: lenshr(kmaxn),
                                   lambda: lenshr(klo))
            else:
                res = lenshr(kmaxn)
            (len_v, len_r, len_av,
             shr_v, shr_r, shr_av, bail_add) = res
            bail = bail | bail_add

            # --- MAT (src/aln.pyx:568-592) ---
            matv_diag = roll(mv[1], 1)
            matt_diag = roll(mt[1], 1)
            matr_diag = roll(mr[1], 1)
            sv = SEQ(0)
            # substitution penalty: the prepass baked sub_scores[s, ref[p]]
            # into 5 ref-bound ct planes, so a 5-way select on the seq base
            # replaces the 25-way (seq, ref) select (same 0.0 default for
            # out-of-alphabet values)
            sub = zf
            for s in range(5):
                # roll +1: MAT consumes ref[acol-1]; ct planes bind at acol
                sub = jnp.where(sv == s, roll(CT(QC + s), 1), sub)
            can_diag = (arow > 0) & (acol > 0)
            run_diag = jnp.where(matt_diag == MAT, matr_diag + 1, 1)
            v1 = jnp.where(can_diag, matv_diag + sub, del_v + INF)
            mat_v = jnp.where(can_diag, matv_diag + sub, 0.0)
            mat_t = zi + MAT
            mat_r = jnp.where(can_diag, run_diag, 0)
            for ti, tv, tr in ((INS, ins_v, ins_r), (LEN, len_v, len_r),
                               (DEL, del_v, del_r), (SHR, shr_v, shr_r)):
                updm = tv < v1
                v1 = jnp.where(updm, tv, v1)
                mat_v = jnp.where(updm, tv, mat_v)
                mat_t = jnp.where(updm, ti, mat_t)
                mat_r = jnp.where(updm, tr, mat_r)

            # --- post overwrites: first-row LEN / first-col SHR
            #     (src/aln.pyx:596-599, 637-640; applied AFTER the reduce) ---
            len_v = jnp.where(first_row, acol.astype(F32) * INF, len_v)
            len_r = jnp.where(first_row, acol, len_r)
            shr_v = jnp.where(first_col, arow.astype(F32) * INF, shr_v)
            shr_r = jnp.where(first_col, arow, shr_r)

            # --- walls + out-of-range (src/aln.pyx:497-507) ---
            wall_v = jnp.float32(t + 1) * INF

            def fin_v(v):
                return jnp.where(in_range, jnp.where(wall, wall_v, v), 0.0)

            def fin_r(rr):
                return jnp.where(in_range & ~wall, rr, 0)

            mat_v = fin_v(mat_v)
            mat_t = jnp.where(in_range & ~wall, mat_t, MAT)
            mat_r = fin_r(mat_r)
            ins_v = fin_v(ins_v)
            ins_r = fin_r(ins_r)
            del_v = fin_v(del_v)
            del_r = fin_r(del_r)
            len_v = fin_v(len_v)
            len_r = fin_r(len_r)
            shr_v = fin_v(shr_v)
            shr_r = fin_r(shr_r)
            dead = ~(in_range & ~wall)
            len_av = jnp.where(dead, 0.0, len_av)
            shr_av = jnp.where(dead, 0.0, shr_av)

            packed_b[pl.ds(i, 1)] = (mat_t + (mat_r << 3))[None]

            # advance only the planes this block variant reads; stale
            # planes are reloaded fresh at the next block boundary
            adv = [0] if "noadv" in ablate else [0, 1]
            for q in adv:
                seq_b[q] = roll(seq_b[q], 1)

            return ((mat_v,) + mv[:max_n - 1],
                    (mat_t, mt[0]), (mat_r, mr[0]),
                    (len_r,) + lr[:max_n - 1], (len_av,) + lav[:max_n - 1],
                    (shr_r,) + sr[:max_n - 1], (shr_av,) + sav[:max_n - 1],
                    ins_v, ins_r, del_v, del_r,
                    dels_now, (dels_now,) + dh[:max_n - 1], bail,
                    roll(steps_rot, -1))

        def blk_body(b, carry):
            T0 = b * BLK
            if "nopref" not in ablate:
                pref_wait()       # this block's tiles (prefetched at b-1)
            align_block(b)
            # rolling steps tile: lane i = row T0+i, assembled from the
            # parity ring by XOR-select + one dynamic roll
            off = (b * BLK) % LANES
            stodd = (((b * BLK) // LANES) % 2) == 1
            w0 = jnp.where((lane1 >= off) ^ stodd,
                           stri[:, 0, :], stri[:, 1, :])
            carry = carry[:-1] + (
                pltpu.roll(w0, shift=(LANES - off) % LANES, axis=1),)
            # issue block b+1's tile DMAs: they ride under this block's
            # rows (the selects above already consumed every ring slot
            # the writes may touch; the clamp keeps the final iteration
            # re-copying resident data instead of indexing past nblk).
            # 'nopref' ablation: skip cross-block DMAs entirely (stale
            # ring data -> WRONG results) to time the DMA machinery.
            if "nopref" not in ablate:
                pref_start(jnp.minimum(b + 1, nblk - 1))
            rflag[0] = 0          # rare planes not loaded for this block

            # manual 6-row unroll (= lcm of every carried history period:
            # the 6-deep mv/lr/sav/... rotations and the 2-deep mt/mr):
            # within the unrolled body the tuple rotations become SSA
            # renames, so Mosaic stops copying ~40 carried (W,128) tiles
            # through their loop slots every row
            def run_rows(c, n_hi):
                def inner(j, cc):
                    i0 = j * unroll
                    for k in range(unroll):
                        cc = row_step(T0 + i0 + k, i0 + k, cc, n_hi)
                    return cc
                return jax.lax.fori_loop(0, BLK // unroll, inner, c)

            if "nhi1" in ablate:
                carry = run_rows(carry, 1)
            elif max_n > 1:
                # Per-period block routing: period-n candidates require
                # l_n > 0 at the candidate cell (LEN: ref+seq planes; SHR:
                # ref plane), so a block whose loaded windows show no
                # period-n repeat provably generates none. Route each
                # block to the cheapest row body covering the max period
                # actually present (HW ablation: LEN/SHR n>=2 is ~36% of
                # the composite; most genomic blocks carry only short
                # periods). Exact by construction for every level.
                levels = sorted({1, 2, 3, max_n})
                pres = []
                for ni in range(1, max_n):
                    if ni < 4:
                        sl = (seq_b[0] >> (3 + 7 * ni)) & 127
                    else:
                        sl = (seq_b[1] >> (7 * (ni - 4))) & 127
                    pres.append(jnp.any((lin_b[1 + ni] > 0)
                                        | (sl > 0)))
                lvl = jnp.int32(0)
                for li, nh in enumerate(levels[1:], start=1):
                    lo_n = levels[li - 1]     # periods in (lo_n, nh]
                    need = pres[lo_n - 1]
                    for nn in range(lo_n + 1, nh):
                        need = need | pres[nn - 1]
                    lvl = jnp.where(need, jnp.int32(li), lvl)
                carry = jax.lax.switch(
                    lvl,
                    [(lambda c, nh=nh: run_rows(c, nh)) for nh in levels],
                    carry)
            else:
                carry = run_rows(carry, max_n)

            cp = pltpu.make_async_copy(
                packed_b, packed_o.at[g, pl.ds(T0, BLK)], sems.at[3])
            cp.start()
            cp.wait()
            return carry

        # carry zeros must come from memory loads: constant (or folded)
        # inits get a fully-replicated Mosaic layout that cannot be joined
        # with the loop body's standard tiles ("Invalid relayout").
        zbuf[:] = jnp.zeros((W, LANES), I32)
        zi0 = zbuf[:]
        zf0 = zi0.astype(F32)
        zc0 = zbuf[:, 0:1]
        htup = lambda dt, k: tuple((zf0 if dt is F32 else zi0)
                                   for _ in range(k))
        init = (htup(F32, max_n), htup(I32, 2), htup(I32, 2),
                htup(I32, max_n), htup(F32, max_n),
                htup(I32, max_n), htup(F32, max_n),
                zf0, zi0, zf0, zi0,
                zc0,
                tuple(zc0 for _ in range(max_n)),
                zi0,          # bail: full-width lane accumulator
                zi0)          # rolling steps tile (re-seeded per block)
        # prologue: synchronously land block 0's base tiles (the ones
        # pref_start(0) does NOT fetch), then issue block 0's prefetch in
        # steady-state shape — the loop body's pref_wait always drains
        # exactly one single-tile copy per window per kind
        for w in range(W):
            base = (p0c[w, 0], s0c[w, 0] + 1, p0c[w, 0])
            for (src_sl, dst_sl, sem), tix in zip(_kinds(w), base):
                _start(src_sl, dst_sl, sem, tix)
        src_sl, dst_sl, sem = _steps_kind
        _start(src_sl, dst_sl, sem, 0)
        pref_wait()
        if "nopref" not in ablate:
            pref_start(0)

        nblk_eff = maxb // BLK + 1
        final = jax.lax.fori_loop(0, nblk_eff, blk_body, init)
        if "nopref" not in ablate:
            pref_wait()     # drain the final iteration's prefetch
        bail_o[:, :] = jnp.broadcast_to(
            jnp.max(final[13], axis=1, keepdims=True), (W, 8))

    call = pl.pallas_call(
        dp_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((None, W, nblk), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),   # p0c
            pl.BlockSpec((None, W, nblk), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),   # p0r
            pl.BlockSpec((None, W, nblk), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),   # s0c
            pl.BlockSpec((None, W, nblk), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),   # s0r
            pl.BlockSpec(memory_space=pltpu.SMEM),   # maxb (G, 1)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sub (1, 32)
            pl.BlockSpec((None, W, 8), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.VMEM),   # scal
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # steps
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # linr
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # cts
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # ctr
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # lins
        ],
        out_specs=[
            pl.BlockSpec((None, W, 8), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_shape=[
            __import__("jax").ShapeDtypeStruct((G, W, 8), np.int32),
            __import__("jax").ShapeDtypeStruct((G, R_pad, W, LANES),
                                               np.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NL, W, 2, LANES), np.int32),     # linri (ring)
            pltpu.VMEM((QT, W, 2, LANES), np.float32),   # ctri (ring)
            pltpu.VMEM((2, W, 2, LANES), np.int32),      # seqri (ring)
            pltpu.VMEM((NL, W, LANES), np.int32),        # lin_b
            pltpu.VMEM((QT, W, LANES), np.float32),      # ct_b (common)
            pltpu.VMEM((QRT, W, LANES), np.float32),     # rare_b
            pltpu.VMEM((2, W, LANES), np.int32),         # seq_b
            pltpu.VMEM((W, 2, LANES), np.int32),         # stri (ring)
            pltpu.VMEM((CHR, W, 2, LANES), np.float32),  # rare2_b staging
            pltpu.VMEM((BLK, W, LANES), np.int32),       # packed_b
            pltpu.VMEM((W, LANES), np.int32),            # zbuf
            pltpu.SMEM((1,), np.int32),                  # rflag
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
    )
    return call


@functools.lru_cache(maxsize=None)
def get_tb_call(R_pad: int, G: int, interpret: bool, w_win: int = 0):
    """Backward traceback over the packed MAT planes -> (op|count<<2) slots."""
    W = w_win or DEFAULT_W
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert R_pad % RQ == 0
    ntb = R_pad // TBLK
    # 4-bit slot tiles: row t lives at tile t//1024, nibble (t//128)%8,
    # lane t%128 — an 8x smaller D2H than one int32 per row (slots ride
    # the ~20-27 MB/s device->host tunnel). Runs longer than 3 are
    # chunked across the traceback rows the run skips (see row_step).
    NT4 = (R_pad + 1023) // 1024
    I32 = jnp.int32

    def tb_kernel(p1c, p1r, s1c, s1r, maxb_s,
                  scal_v, linr, lins, packed,
                  bail_o, slots_o,
                  ref2_b, seq2_b, ref_b, seq_b, pk_b, sl_b, zbuf, sems):
        g = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(I32, (W, LANES), 1)
        n_ins = scal_v[:, 1:2]
        n_del = scal_v[:, 2:3]
        maxb = maxb_s[g, 0]
        zbuf[:] = jnp.zeros((W, LANES), I32)
        sl_b[:] = zbuf[:]

        lane1 = jax.lax.broadcasted_iota(I32, (1, LANES), 1)

        def load_block(b):
            d0 = pltpu.make_async_copy(
                packed.at[g, pl.ds(b * TBLK, TBLK)], pk_b, sems.at[0])
            d0.start()
            dmas = []
            for w in range(W):
                d1 = pltpu.make_async_copy(
                    linr.at[g * W + w, 0:1, pl.ds(p1c[w, b], 2), :],
                    ref2_b.at[w], sems.at[1])
                d2 = pltpu.make_async_copy(
                    lins.at[g * W + w, 0:1, pl.ds(s1c[w, b], 2), :],
                    seq2_b.at[w], sems.at[2])
                d1.start()
                d2.start()
                dmas.append((d1, d2))
            d0.wait()
            for d1, d2 in dmas:
                d1.wait()
                d2.wait()
            for w in range(W):
                ref_b[pl.ds(w, 1)] = jnp.where(
                    lane1 >= p1r[w, b],
                    ref2_b[w, :, 0, :], ref2_b[w, :, 1, :])
                seq_b[pl.ds(w, 1)] = jnp.where(
                    lane1 >= s1r[w, b],
                    seq2_b[w, :, 0, :], seq2_b[w, :, 1, :])
            # re-bind both planes to lane acol%LANES (ref: pos -> pos+1;
            # seq: one lane earlier than the old acol+1 binding) so the
            # row step needs a single fused one-hot reduce
            ref_b[:] = pltpu.roll(ref_b[:], shift=1, axis=1)
            seq_b[:] = pltpu.roll(seq_b[:],
                                  shift=(b * TBLK + TBLK - 2) % LANES, axis=1)

        def row_step(t, carry):
            # erem/eop: pending 4-bit chunk emission of a long I/D run
            # (runs > 3 spill onto the rows the run skips — the next
            # active row is t - run, so rows t-1 .. t-run+1 are free and
            # ceil(run/3) chunks always fit strictly above it)
            arow, acol, pend, done, bail, erem, eop = carry
            active = (done == 0) & (arow + acol == t)

            # fused one-hot: ref[acol-1], seq base, and the packed MAT
            # plane all bind lane acol%LANES (see load_block re-binds),
            # so ONE cross-lane reduce per row replaces the previous
            # three (~0.4us each on this backend). Bit budget: ref 3b |
            # seq 3b | typ 3b | run<<9 (run <= rows < 2^22).
            oh = lane == (acol % LANES)
            pk_row = pk_b[pl.ds(t % TBLK, 1)][0]
            cmb = ref_b[:] | ((seq_b[:] & 7) << 3) | (pk_row << 6)
            cv = jnp.sum(jnp.where(oh, cmb, 0), axis=1, keepdims=True)
            typ = (cv >> 6) & 7
            run = cv >> 9
            sv = (cv >> 3) & 7
            rv = cv & 7

            fresh = active & (pend == 0)
            bad = fresh & (run < 1)
            is_i = fresh & ((typ == INS) | (typ == LEN)) & ~bad
            is_d = fresh & ((typ == DEL) | (typ == SHR)) & ~bad
            is_m = fresh & (typ == MAT) & ~bad
            pend = jnp.where(is_m, run, pend)
            in_m = active & (pend > 0)

            cmp_op = jnp.where(sv == rv, OP_EQ, OP_X)

            is_run = is_i | is_d
            cur_op = jnp.where(is_run,
                               jnp.where(is_i, OP_I, OP_D), eop)
            cur_rem = jnp.where(is_run, run, erem)
            emit_n = jnp.minimum(cur_rem, 3)
            has = is_run | (erem > 0)
            slot = jnp.where(in_m, cmp_op + (1 << 2), 0)
            slot = jnp.where(has, cur_op + (emit_n << 2), slot)
            erem = jnp.where(has, cur_rem - emit_n, erem)
            eop = cur_op

            arow = jnp.where(in_m, arow - 1,
                             jnp.where(is_i, arow - run, arow))
            acol = jnp.where(in_m, acol - 1,
                             jnp.where(is_d, acol - run, acol))
            pend = jnp.where(in_m, pend - 1, pend)
            bail = jnp.where(bad | (active & ((arow < 0) | (acol < 0))),
                             1, bail)
            done = jnp.where(((arow <= 0) & (acol <= 0)) | (bail > 0),
                             1, done)

            sl_b[:] = sl_b[:] | jnp.where(
                (lane == (t % LANES)) & (slot != 0),
                slot << (4 * ((t // LANES) % 8)), 0)

            seq_b[:] = pltpu.roll(seq_b[:], shift=LANES - 1, axis=1)
            return (arow, acol, pend, done, bail, erem, eop)

        def blk_body(bb, carry):
            ntb_eff = maxb // TBLK + 1
            b = ntb_eff - 1 - bb
            T0 = b * TBLK
            load_block(b)

            def inner(j, c):
                return row_step(T0 + TBLK - 1 - j, c)
            carry = jax.lax.fori_loop(0, TBLK, inner, carry)

            @pl.when(b % 16 == 0)
            def _():
                cp = pltpu.make_async_copy(
                    sl_b, slots_o.at[g, T0 // 1024], sems.at[3])
                cp.start()
                cp.wait()
                sl_b[:] = zbuf[:]
            return carry

        zc0 = zbuf[:, 0:1]
        init = (n_ins, n_del, zc0, zc0, zc0, zc0, zc0)
        final = jax.lax.fori_loop(0, maxb // TBLK + 1, blk_body, init)
        bail_o[:, :] = jnp.broadcast_to(
            final[4] | (1 - final[3]), (W, 8))

    call = pl.pallas_call(
        tb_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((None, W, ntb), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, W, ntb), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, W, ntb), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, W, ntb), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, W, 8), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((None, W, 8), lambda gg: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            __import__("jax").ShapeDtypeStruct((G, W, 8), np.int32),
            __import__("jax").ShapeDtypeStruct((G, NT4, W, LANES), np.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, 1, 2, LANES), np.int32),
            pltpu.VMEM((W, 1, 2, LANES), np.int32),
            pltpu.VMEM((W, LANES), np.int32),
            pltpu.VMEM((W, LANES), np.int32),
            pltpu.VMEM((TBLK, W, LANES), np.int32),
            pltpu.VMEM((W, LANES), np.int32),
            pltpu.VMEM((W, LANES), np.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )
    return call
