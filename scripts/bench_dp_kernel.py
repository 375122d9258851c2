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
    r_pad = int(os.environ.get("NPORE_BDK_RPAD", "1536"))
    gsz = eng.g_call_for(r_pad) * W
    items = []
    while len(items) < gsz:
        for r in reads:
            cig = expand_cigar(r.cigar).replace("S", "").replace("H", "")
            items.append(AlignItem(
                bases_to_int(r.get_reference_sequence().upper()),
                bases_to_int(r.query_alignment_sequence.upper()), cig))
    windows = []
    for i, it in enumerate(items):
        windows.extend(build_windows(it.ref, it.seq, it.cigar, cfg,
                                     aln_idx=i))
    group = windows[:gsz]
    # one real submit to compile + pack; then re-run the composite on the
    # same device-resident inputs
    handles = eng._submit_group(group, r_pad)
    jax.block_until_ready(handles[:1])

    run = eng._composites[(r_pad, False)]
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
    from npore_tpu.ops.pallas_dp import DEFAULT_W as W
    nblk = r_pad // BLK

    idx32 = np.asarray(jax.device_get(idx32_d))
    pk8 = np.asarray(jax.device_get(pk8_d))
    ref8 = jnp.asarray(pk8 & 7)
    seq8 = jnp.asarray((pk8 >> 3) & 7)
    sd8 = jnp.asarray((pk8 >> 6).reshape(-1, W, pk8.shape[1]))
    p0 = np.asarray(idx32[:, :, 0:nblk].reshape(-1, nblk))

    def one(o):
        # sync on a SINGLE element: stage outputs differ in shape, and a
        # [:1] leading-slice of a wide leaf drags MBs over the ~25MB/s
        # D2H tunnel, polluting the deltas
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jax.device_get(leaf[tuple(slice(0, 1) for _ in leaf.shape)])

    def timeit(f):
        outs = f(ref8, seq8, sd8, p0)
        one(outs)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            o = f(ref8, seq8, sd8, p0)
            one(o)
            best = min(best, time.perf_counter() - t0)
        return best

    def make(stop):
        return make_prepass(r_pad, G, W, cfg.max_n, cfg.max_l,
                            eng.cont_cols, eng.kmaxn,
                            sub_scores=eng.sub_scores, stop_after=stop)

    floor = timeit(jax.jit(
        lambda a, b, c, d: jnp.sum(a[:1, :8].astype(jnp.int32),
                                   keepdims=True)))
    stages = ["npinfo", "tables", "matmul", None]
    prev, out = floor, []
    for s in stages:
        t = timeit(make(s))
        out.append(f"{s or 'full'} +{(t - prev) * 1000:.2f}")
        prev = t
    print(f"ppcum (floor {floor * 1000:.2f} ms): " + ", ".join(out)
          + f"; full total {(prev - floor) * 1000:.2f} ms")


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
    from npore_tpu.ops.pallas_dp import DEFAULT_W as W
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
    linr, ctc, ctr, lins, steps = outs
    dpo, t_dp = timeit(
        dpj, (planes["p0c"], planes["p0r"], planes["s0c"], planes["s0r"],
              maxb, sub_d, scal, steps, linr, ctc, ctr, lins), 0)
    dp_bail, packed = dpo
    _, t_tb = timeit(
        tbj, (planes["p1c"], planes["p1r"], planes["s1c"], planes["s1r"],
              maxb, scal, linr, lins, packed), 0)
    print(f"split: prepass {t_pp*1000:.2f} ms, dp {t_dp*1000:.2f} ms, "
          f"tb {t_tb*1000:.2f} ms (min-of-{reps}, incl ~dispatch latency)")


def _pack_like_submit(eng, group, r_pad):
    """Re-pack the group exactly as _submit_group does, host-side only
    (the engine stashes its last packed buffer for this tool)."""
    import numpy as np
    from npore_tpu.engine.pallas_engine import W as W_
    from npore_tpu.engine.pallas_engine import _idx_layout
    from npore_tpu.ops.pallas_dp import BLK as BLK_, TBLK as TBLK_

    eng._submit_group(group, r_pad)
    buf = np.asarray(eng._dbg_last_buf)
    pkw = r_pad // 4
    pk8 = np.ascontiguousarray(buf[:, :pkw]).view(np.uint8).reshape(
        buf.shape[0], r_pad)
    ni = sum(w for _, w in _idx_layout(r_pad // BLK_, r_pad // TBLK_))
    idx32 = np.ascontiguousarray(buf[:, pkw:]).reshape(-1, W_, ni)
    return buf, pk8, idx32


if __name__ == "__main__":
    sys.exit(main())
