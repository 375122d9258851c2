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
    jax.block_until_ready(handles[:3])

    run, packed16 = eng._composites[r_pad]
    # rebuild the packed host arrays once more, keep them on device
    import npore_tpu.engine.pallas_engine as pe
    big8, idx32 = _pack_like_submit(eng, group, r_pad)
    dev = eng.devices[0]
    big8_d = jax.device_put(big8, dev)
    idx32_d = jax.device_put(idx32, dev)
    sub_d = jax.device_put(eng._sub, dev)

    outs = run(big8_d, idx32_d, sub_d)
    jax.block_until_ready(outs)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = run(big8_d, idx32_d, sub_d)
        jax.block_until_ready(outs)
        best = min(best, time.perf_counter() - t0)
    nwin = len(group)
    print(f"composite: {best*1000:.2f} ms min-of-{reps} "
          f"({nwin} windows, r_pad {r_pad}, "
          f"ablate='{os.environ.get('NPORE_DP_ABLATE', '')}') "
          f"-> {best*1e6/nwin:.1f} us/window")
    return 0


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
    big8 = next(a for a in arrays if a.dtype == np.int8)
    idx32 = next(a for a in arrays if a.dtype == np.int32 and a.ndim == 3)
    return big8, idx32


if __name__ == "__main__":
    sys.exit(main())
