#!/usr/bin/env python3
"""Device-side composite microbenchmark: min-of-N timing of one group's
prepass+DP+TB chain with device-resident inputs, isolating kernel cost
from host pipeline + tunnel noise (engine-level reads/s varies ~15%
between runs on the shared axon pool; min-of-N device exec does not).

    [NPORE_DP_ABLATE=...] python scripts/bench_dp_kernel.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    from npore_tpu.config import AlignConfig
    from npore_tpu.constants import bases_to_int
    from npore_tpu.engine.pallas_engine import PallasEngine, W
    from npore_tpu.engine.realigner import AlignItem
    from npore_tpu.engine.windows import build_windows
    from npore_tpu.io.bam import BamReader
    from npore_tpu.io.cigar import expand_cigar
    from npore_tpu.model.scores import (calc_score_matrices,
                                        load_confusion_matrices)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subs, nps, inss, dels = load_confusion_matrices(
        os.path.join(repo, "guppy5_stats"))
    ss, ns, _, _ = calc_score_matrices(subs, nps, inss, dels)
    cfg = AlignConfig()
    eng = PallasEngine(ss, ns, cfg)

    reads = [r for r in BamReader(os.path.join(repo, "tests/data/reads.bam"))
             if not (r.is_secondary or r.is_supplementary or r.is_unmapped)]
    items = []
    while len(items) < eng.g_call * W:
        for r in reads:
            cig = expand_cigar(r.cigar).replace("S", "").replace("H", "")
            items.append(AlignItem(
                bases_to_int(r.get_reference_sequence().upper()),
                bases_to_int(r.query_alignment_sequence.upper()), cig))
    windows = []
    for i, it in enumerate(items):
        windows.extend(build_windows(it.ref, it.seq, it.cigar, cfg,
                                     aln_idx=i))
    group = windows[:eng.g_call * W]
    r_pad = 1536
    # one real submit to compile + pack; then re-run the composite on the
    # same device-resident inputs
    handles = eng._submit_group(group, r_pad)
    jax.block_until_ready(handles[:1])

    run = eng._composites[r_pad]
    # rebuild the packed host arrays once more, keep them on device
    import npore_tpu.engine.pallas_engine as pe
    buf, pk8, idx32 = _pack_like_submit(eng, group, r_pad)
    dev = eng.devices[0]
    buf_d = jax.device_put(buf, dev)
    pk8_d = jax.device_put(pk8, dev)
    idx32_d = jax.device_put(idx32, dev)
    sub_d = jax.device_put(eng._sub, dev)

    # block_until_ready does NOT synchronize on the tunneled axon backend;
    # a (small) device_get is the only true sync. Its ~25 ms latency is a
    # constant additive term: report both raw and latency-corrected times.
    outs = run(buf_d, sub_d)
    _ = jax.device_get(outs[:1, :1])
    # estimate the fetch-only latency on an already-computed buffer
    lat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(outs[:1, :1])
        lat = min(lat, time.perf_counter() - t0)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        o = run(buf_d, sub_d)
        jax.device_get(o[:1, :1])
        best = min(best, time.perf_counter() - t0)
    nwin = len(group)
    net = best - lat
    print(f"composite: {net*1000:.2f} ms min-of-{reps} "
          f"(raw {best*1000:.2f}, fetch-lat {lat*1000:.2f}; "
          f"{nwin} windows, r_pad {r_pad}, "
          f"ablate='{os.environ.get('NPORE_DP_ABLATE', '')}') "
          f"-> {net*1e6/nwin:.1f} us/window")

    if "--split" in sys.argv:
        _split_stages(eng, pk8_d, idx32_d, sub_d, r_pad, reps)
    if "--ppsplit" in sys.argv:
        _pp_split(eng, pk8_d, idx32_d, r_pad, reps)
    if "--ppcum" in sys.argv:
        _pp_cum(eng, pk8_d, idx32_d, r_pad, reps)
    return 0


def _pp_cum(eng, pk8_d, idx32_d, r_pad, reps):
    """Cumulative prepass timing: each variant is ONE jit running the
    real prepass truncated after a stage, so fusion/layout behavior
    matches the composite (unlike _pp_split's isolated stage jits, whose
    numbers diverge wildly — e.g. the matmul+transpose stage measures
    seconds isolated but milliseconds fused). Successive deltas are the
    true in-composite stage costs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from npore_tpu.engine.prepass import make_prepass
    from npore_tpu.ops.pallas_dp import BLK

    cfg = eng.cfg
    gc = eng.g_call_for(r_pad)
    G = eng.n_shards * gc
    W = 32
    nblk = r_pad // BLK

    idx32 = np.asarray(jax.device_get(idx32_d))
    pk8 = np.asarray(jax.device_get(pk8_d))
    ref8 = jnp.asarray(pk8 & 7)
    seq8 = jnp.asarray((pk8 >> 3) & 7)
    sd8 = jnp.asarray((pk8 >> 6).reshape(-1, W, pk8.shape[1]))
    p0 = np.asarray(idx32[:, :, 0:nblk].reshape(-1, nblk))

    def timeit(f):
        outs = f(ref8, seq8, sd8, p0)
        jax.device_get(jax.tree_util.tree_leaves(outs)[0][:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = f(ref8, seq8, sd8, p0)
            jax.device_get(jax.tree_util.tree_leaves(o)[0][:1])
            best = min(best, time.perf_counter() - t0)
        return best

    def make(stop):
        return make_prepass(r_pad, G, W, cfg.max_n, cfg.max_l,
                            eng.cont_cols, eng.kmaxn,
                            sub_scores=eng.sub_scores, stop_after=stop)

    floor = timeit(jax.jit(
        lambda a, b, c, d: jnp.sum(a[:1, :8].astype(jnp.int32),
                                   keepdims=True)))
    stages = ["npinfo", "tables", "gather", "matmul", "relayout", None]
    prev, out = floor, []
    for s in stages:
        t = timeit(make(s))
        out.append(f"{s or 'full'} +{(t - prev) * 1000:.2f}")
        prev = t
    print(f"ppcum (floor {floor * 1000:.2f} ms): " + ", ".join(out)
          + f"; full total {(prev - floor) * 1000:.2f} ms")


def _pp_split(eng, pk8_d, idx32_d, r_pad, reps):
    """Time the prepass sub-stages as separate jits (npinfo ref/seq+pack,
    table assembly, block gathers, one-hot matmuls, steps) and report each
    net of the measured dispatch+fetch floor."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from npore_tpu.engine.pallas_engine import _idx_layout
    from npore_tpu.engine.prepass import ct_layout
    from npore_tpu.ops.npinfo_device import np_info_device
    from npore_tpu.ops.pallas_dp import BLK, LANES, TBLK

    cfg = eng.cfg
    max_n, max_l = cfg.max_n, cfg.max_l
    gc = eng.g_call_for(r_pad)
    G = eng.n_shards * gc
    W = 32
    B = G * W
    P2 = r_pad + 512
    PADL = 128
    A_OFF = r_pad + 128
    NL = 1 + 2 * max_n
    nblk = r_pad // BLK
    ntb = r_pad // TBLK
    offs, QF = ct_layout(max_n, eng.kmaxn)

    idx32 = np.asarray(jax.device_get(idx32_d))
    pk8 = np.asarray(jax.device_get(pk8_d))
    ref8 = jnp.asarray(pk8 & 7)
    seq8 = jnp.asarray((pk8 >> 3) & 7)
    sd8 = jnp.asarray((pk8 >> 6).reshape(-1, W, pk8.shape[1]))
    p0 = np.asarray(idx32[:, :, 0:nblk].reshape(-1, nblk))

    def timeit(fn, *args):
        f = jax.jit(fn)
        outs = f(*args)
        jax.device_get(jax.tree_util.tree_leaves(outs)[0][:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = f(*args)
            jax.device_get(jax.tree_util.tree_leaves(o)[0][:1])
            best = min(best, time.perf_counter() - t0)
        return outs, best

    _, floor = timeit(lambda x: x + 1, jnp.zeros((8, 128), jnp.int32))

    def side(x8):
        x = x8.astype(jnp.int32)
        L, LZ = np_info_device(x, max_n, max_l)
        return jnp.concatenate(
            [x[:, None, :], jnp.minimum(L, 127), LZ], axis=1)

    pr, t_ref = timeit(side, ref8)

    def seq_pack(x8):
        psl = side(x8)
        pA = psl[:, 0, :]
        for ni in range(min(4, max_n)):
            pA = pA | (psl[:, 1 + ni, :] << (3 + 7 * ni))
        pB = jnp.zeros_like(pA)
        for ni in range(4, max_n):
            pB = pB | (psl[:, 1 + ni, :] << (7 * (ni - 4)))
        for ni in range(max_n):
            pB = pB | (psl[:, 1 + max_n + ni, :] << (14 + ni))
        return jnp.stack([pA, pB], axis=1)

    ps, t_seq = timeit(seq_pack, seq8)

    def assemble(pr, ps):
        defr = np.zeros((NL, 1), np.int32)
        defr[1 + max_n:] = 1
        linr_lin = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(defr), (B, NL, PADL)), pr,
             jnp.broadcast_to(jnp.asarray(defr),
                              (B, NL, P2 - PADL - r_pad))], axis=2)
        lz_def = sum(1 << (14 + ni) for ni in range(max_n))
        defs = np.zeros((2, 1), np.int32)
        defs[1] = lz_def
        lins_lin = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(defs),
                              (B, 2, A_OFF + 1 - r_pad)),
             jnp.flip(ps, axis=2),
             jnp.broadcast_to(jnp.asarray(defs), (B, 2, P2 - A_OFF - 1))],
            axis=2)
        return (linr_lin.reshape(B, NL, P2 // LANES, LANES),
                lins_lin.reshape(B, 2, P2 // LANES, LANES), linr_lin)

    (linr, lins, linr_lin), t_asm = timeit(assemble, pr, ps)

    c0 = (PADL + p0) // LANES
    r0 = (PADL + p0) % LANES
    tidx = jnp.asarray(np.stack([c0, c0 + 1], axis=2).reshape(
        B, 1, nblk * 2, 1))
    lsel = jnp.asarray(np.arange(LANES, dtype=np.int32)[None, None, :]
                       >= r0[:, :, None])

    def gathers(linr_lin):
        lint = linr_lin[:, 0:1 + max_n, :].reshape(
            B, 1 + max_n, P2 // LANES, LANES)
        two = jnp.take_along_axis(
            lint, tidx, axis=2).reshape(B, 1 + max_n, nblk, 2, LANES)
        blk_pl = jnp.where(lsel[:, None, :, :],
                           two[:, :, :, 0, :], two[:, :, :, 1, :])
        blk_pl = blk_pl.reshape(B, 1 + max_n, nblk * LANES)
        return blk_pl[:, 1:, :], blk_pl[:, 0, :]

    (l_blk, r_blk), t_gat = timeit(gathers, linr_lin)

    iota_l = jnp.arange(np.asarray(eng.cont_cols[0][0]).shape[0],
                        dtype=jnp.int32)

    def matmuls(l_blk, r_blk):
        parts = []
        for ni in range(max_n):
            tab2 = jnp.asarray(np.concatenate(
                [np.asarray(eng.cont_cols[0][ni]),
                 np.asarray(eng.cont_cols[1][ni])], axis=1))
            oh = (l_blk[:, ni, :, None] == iota_l).astype(jnp.float32)
            parts.append(jax.lax.dot_general(
                oh, tab2, (((2,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST))
        oh_r = (r_blk[:, :, None] == jnp.arange(5, dtype=jnp.int32)
                ).astype(jnp.float32)
        subT = jnp.asarray(np.ascontiguousarray(
            np.asarray(eng.sub_scores, np.float32).T))
        parts.append(jax.lax.dot_general(
            oh_r, subT, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST))
        g = jnp.concatenate(parts, axis=2)
        QT = g.shape[2]
        return g.reshape(G, W, nblk, LANES, QT).transpose(0, 2, 4, 1, 3)

    _, t_mm = timeit(matmuls, l_blk, r_blk)

    def steps_fn(sd8):
        sd = jnp.concatenate(
            [sd8.astype(jnp.int32), jnp.zeros((G, W, 128), jnp.int32)],
            axis=2)
        return jnp.stack([sd[:, :, b * BLK:b * BLK + LANES]
                          for b in range(nblk)], axis=1)

    _, t_st = timeit(steps_fn, sd8)

    f = floor * 1000
    print(f"ppsplit (net of {f:.2f} ms floor): "
          f"npinfo_ref {t_ref*1000-f:.2f}, npinfo_seq+pack {t_seq*1000-f:.2f}, "
          f"assemble {t_asm*1000-f:.2f}, gathers {t_gat*1000-f:.2f}, "
          f"matmuls {t_mm*1000-f:.2f}, steps {t_st*1000-f:.2f} ms")


def _split_stages(eng, pk8_d, idx32_d, sub_d, r_pad, reps):
    """Time prepass / DP / TB as separate jits (same inputs the composite
    unpacks), min-of-N with a device_get sync on a small output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from npore_tpu.engine.pallas_engine import _idx_layout
    from npore_tpu.engine.prepass import make_prepass
    from npore_tpu.ops.pallas_dp import BLK, TBLK, get_dp_call, get_tb_call

    cfg = eng.cfg
    gc = eng.g_call_for(r_pad)
    G = eng.n_shards * gc
    nblk = r_pad // BLK
    ntb = r_pad // TBLK
    W = 32
    prepass = make_prepass(r_pad, G, W, cfg.max_n, cfg.max_l,
                           eng.cont_cols, eng.kmaxn,
                           sub_scores=eng.sub_scores)
    dp = get_dp_call(r_pad, G, cfg.r, cfg.indel_start, cfg.indel_extend,
                     cfg.inf, cfg.max_n, eng.interpret, eng.kmaxn, 1)
    tb = get_tb_call(r_pad, G, eng.interpret)

    idx32 = np.asarray(jax.device_get(idx32_d))
    planes = {}
    o = 0
    for name, width in _idx_layout(nblk, ntb):
        planes[name] = jnp.asarray(idx32[:, :, o:o + width])
        o += width
    pk8 = np.asarray(jax.device_get(pk8_d))
    ref8 = jnp.asarray(pk8 & 7)
    seq8 = jnp.asarray((pk8 >> 3) & 7)
    sd8 = jnp.asarray((pk8 >> 6).reshape(-1, W, pk8.shape[1]))
    p0 = jnp.asarray(idx32[:, :, 0:nblk].reshape(-1, nblk))
    maxb = planes["maxb"][:, 0]
    scal = planes["scal"]
    # derive the DMA tile/lane planes host-side (mirrors composite run())
    a_off = r_pad + 128
    t0 = planes["p0blk"] + 128
    planes["p0c"], planes["p0r"] = t0 // 128, t0 % 128
    t0 = a_off - (planes["i0blk"] - cfg.r - 7 + 127)
    planes["s0c"], planes["s0r"] = t0 // 128, t0 % 128
    t0 = planes["p1blk"] - cfg.r - 1 + 128
    planes["p1c"], planes["p1r"] = t0 // 128, t0 % 128
    t0 = a_off - (planes["i1blk"] + cfg.r + 2)
    planes["s1c"], planes["s1r"] = t0 // 128, t0 % 128

    pp = jax.jit(prepass)
    dpj = jax.jit(dp)
    tbj = jax.jit(tb)

    def timeit(fn, args, sync_idx):
        outs = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(outs)[sync_idx][:1])
        best = float("inf")
        for _ in range(reps):
            t0 = __import__("time").perf_counter()
            o_ = fn(*args)
            jax.device_get(jax.tree_util.tree_leaves(o_)[sync_idx][:1])
            best = min(best, __import__("time").perf_counter() - t0)
        return outs, best

    outs, t_pp = timeit(pp, (ref8, seq8, sd8, p0), 0)
    linr, lins, steps, cts = outs
    dpo, t_dp = timeit(
        dpj, (planes["p0c"], planes["p0r"], planes["s0c"], planes["s0r"],
              maxb, sub_d, scal, steps, linr, lins, cts), 0)
    dp_bail, packed = dpo
    _, t_tb = timeit(
        tbj, (planes["p1c"], planes["p1r"], planes["s1c"], planes["s1r"],
              maxb, scal, linr, lins, packed), 0)
    print(f"split: prepass {t_pp*1000:.2f} ms, dp {t_dp*1000:.2f} ms, "
          f"tb {t_tb*1000:.2f} ms (min-of-{reps}, incl ~dispatch latency)")


def _pack_like_submit(eng, group, r_pad):
    """Re-pack the group exactly as _submit_group does, host-side only."""
    import npore_tpu.engine.pallas_engine as pe
    import jax

    captured = {}
    orig_put = jax.device_put

    def fake_put(a, dev=None):
        arr = np.asarray(a)
        captured.setdefault("arrays", []).append(arr)
        return orig_put(arr, dev)

    # simplest faithful route: call _submit_group again but snapshot its
    # two packed host arrays via the device_put hook
    jax.device_put = fake_put
    try:
        eng._submit_group(group, r_pad)
    finally:
        jax.device_put = orig_put
    arrays = [a for a in captured["arrays"]]
    buf = next(a for a in arrays if a.dtype == np.int32 and a.ndim == 2
               and a.shape[1] > 64)
    pkw = r_pad // 4
    pk8 = np.ascontiguousarray(buf[:, :pkw]).view(np.uint8).reshape(
        buf.shape[0], r_pad)
    from npore_tpu.engine.pallas_engine import W as W_
    from npore_tpu.engine.pallas_engine import _idx_layout
    from npore_tpu.ops.pallas_dp import BLK as BLK_, TBLK as TBLK_
    ni = sum(w for _, w in _idx_layout(r_pad // BLK_, r_pad // TBLK_))
    idx32 = np.ascontiguousarray(buf[:, pkw:]).reshape(-1, W_, ni)
    return buf, pk8, idx32


if __name__ == "__main__":
    sys.exit(main())
