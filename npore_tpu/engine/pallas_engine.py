"""Host orchestration for the Pallas DP engine.

Packs windows into the lane-bound layout of ops/pallas_dp.py, runs the DP
and traceback kernels, decodes emission slots into extended CIGARs, and
redoes bailed alignments (k-continuation overflow or traceback error) with
the exact golden engine.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import AlignConfig
from ..native import fill_group_native
from ..ops.pallas_dp import (BLK, KMAXN, LANES, MAXB_Q, RQ, TBLK, W,
                             build_cont_cols, get_dp_call, get_tb_call)

# interpret mode (CPU tests) uses modest k coverage: the unrolled selects
# dominate interpreter time and the bail fallback keeps outputs exact
KMAXN_INTERPRET = (10, 8, 6, 5, 4, 3)
from .windows import Window, build_windows

import os as _os

# programs per device call (G_CALL*W windows). The tunnel charges ~25ms
# latency per RPC and appears to serialize them, so bigger groups
# amortize per-group latency against HBM headroom (g_call_for scales
# down for big r_pad buckets); env knob for HW sweeps.
G_CALL = int(_os.environ.get("NPORE_G_CALL", "8"))
W_EXT = 8       # windows/program in the extended-coverage rescue
                # composite (its ~1100 rare planes fit VMEM at 8)
_OPCH = np.frombuffer(b"=XID", dtype=np.uint8)


def _idx_layout(nblk: int, ntb: int):
    """Single source of truth for the packed idx32 plane order: the host
    packer (_submit_group) and the traced unpacker (run) both iterate
    this, so the layouts can never diverge. Only the 4 base planes ride
    the tunnel; the 8 tile/lane (div/mod 128) planes the kernels consume
    are derived on device in run() — half the idx32 H2D bytes."""
    return (("p0blk", nblk), ("i0blk", nblk),
            ("p1blk", ntb), ("i1blk", ntb),
            ("scal", 8), ("maxb", 1))
def _make_composite(r_pad: int, G: int, r: int, indel_start: float,
                    indel_extend: float, inf: float, max_n: int, max_l: int,
                    interpret: bool, cont_cols, kmaxn, mesh=None,
                    sub_scores=None, w_win: int = W):
    """One jitted prepass+DP+TB chain: a single dispatch per group keeps
    the ~25ms-latency tunnel from being paid three times.

    With ``mesh`` (a 1-D ``data`` mesh), the chain is shard_mapped over the
    mesh: every per-group array keeps ``G`` programs *per device* on its
    leading axis shard, so one dispatch drives all chips — the SPMD form
    of the reference's reader/worker pool over reads (src/realign.py:110-114).
    """
    import jax
    import jax.numpy as jnp

    from .prepass import make_prepass
    import os
    prepass = make_prepass(r_pad, G, w_win, max_n, max_l, cont_cols, kmaxn,
                           sub_scores=sub_scores)
    unroll = int(os.environ.get("NPORE_DP_UNROLL", "0"))
    dp = get_dp_call(r_pad, G, r, indel_start, indel_extend, inf, max_n,
                     interpret, kmaxn, unroll, w_win)
    tb = get_tb_call(r_pad, G, interpret, w_win)
    nblk = r_pad // BLK
    ntb = r_pad // TBLK

    # the host packs EVERYTHING into ONE int32 transfer per group (each
    # tunneled call pays ~25ms latency): per window, r_pad/4 words of
    # byte-packed ref | seq<<3 | step<<6 (little-endian bytes, unpacked
    # with shifts on device) followed by the idx planes. Outputs are
    # likewise concatenated so collection is ONE device_get.
    pkw = r_pad // 4

    def run(buf, sub):
        pk_w = buf[:, :pkw]
        bts = [(pk_w >> (8 * k)) & 255 for k in range(4)]
        pk8 = jnp.stack(bts, axis=2).reshape(-1, r_pad)
        idx32 = buf[:, pkw:].reshape(-1, w_win, buf.shape[1] - pkw)
        ref8 = pk8 & 7
        seq8 = (pk8 >> 3) & 7
        sd8 = (pk8 >> 6).reshape(-1, w_win, r_pad)
        planes = {}
        o = 0
        for name, width in _idx_layout(nblk, ntb):
            planes[name] = idx32[:, :, o:o + width]
            o += width
        p0 = planes["p0blk"].reshape(-1, nblk)
        # derive the DMA tile/lane planes on device (floor div/mod 128,
        # matching the host fallback's Python semantics for negatives)
        a_off = r_pad + 128
        t0 = planes["p0blk"] + 128
        p0c, p0r = t0 // 128, t0 % 128
        t0 = a_off - (planes["i0blk"] - r - 7 + 127)
        s0c, s0r = t0 // 128, t0 % 128
        t0 = planes["p1blk"] - r - 1 + 128
        p1c, p1r = t0 // 128, t0 % 128
        t0 = a_off - (planes["i1blk"] + r + 2)
        s1c, s1r = t0 // 128, t0 % 128
        scal = planes["scal"]
        maxb = planes["maxb"][:, 0]
        linr, ctc, ctr, lins, steps = prepass(ref8, seq8, sd8, p0)
        dp_bail, packed = dp(p0c, p0r, s0c, s0r, maxb, sub, scal,
                             steps, linr, ctc, ctr, lins)
        tb_bail, slots = tb(p1c, p1r, s1c, s1r, maxb, scal, linr, lins,
                            packed)
        # one D2H array: [dp_bail | tb_bail | slot tiles] per program
        g_ = dp_bail.shape[0]
        return jnp.concatenate(
            [dp_bail.reshape(g_, -1), tb_bail.reshape(g_, -1),
             slots.reshape(g_, -1)], axis=1)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        shard_map = jax.shard_map

        def spec(a_ndim):
            return P(*(("data",) + (None,) * (a_ndim - 1)))

        in_specs = (spec(2), P(None, None))
        out_specs = spec(2)
        run = shard_map(run, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)

    return jax.jit(run)


def _r_pad_for(b_rows: int, max_b_rows: int) -> int:
    """Geometric bucket ladder (x RQ) bounds compile count to ~7 shapes."""
    cap = ((max_b_rows + 2 + RQ - 1) // RQ) * RQ
    r = RQ
    while r < min(max(b_rows, 1), cap):
        r *= 2
    return min(r, cap)


class PallasEngine:
    """Batched Pallas realignment engine.

    Data parallelism across chips is group-round-robin: each submitted
    group's arrays are placed on the next local device, so the (async)
    DP/TB dispatches for different groups execute concurrently on
    different chips -- the single-controller analog of the 1-D data mesh
    in parallel/mesh.py (reads are embarrassingly parallel; score tables
    are tiny and re-materialized per device by jit).
    """

    def __init__(self, sub_scores: np.ndarray, np_scores: np.ndarray,
                 cfg: AlignConfig = AlignConfig(), k_cont: int = 14,
                 interpret: Optional[bool] = None,
                 devices: Optional[list] = None, g_call: int = G_CALL,
                 kmaxn: Optional[tuple] = None, mesh=None,
                 kext: Optional[tuple] = None):
        import jax
        self.cfg = cfg
        self.k_cont = k_cont
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        if interpret and g_call == G_CALL:
            g_call = 1          # interpret mode: small groups keep tests fast
        self.g_call = g_call
        # interpret mode runs the main composite at the extended tier's
        # production width (W=8): per-program trace/compile cost in the
        # discharge interpreter scales ~linearly with W, and the kernels
        # are W-generic (HW fuzz + golden SAM cover W=32; the hermetic
        # chain covers W=8 on both tiers). NPORE_INTERPRET_W=32 restores
        # full-width hermetic runs.
        self.w_main = (int(_os.environ.get("NPORE_INTERPRET_W", "8"))
                       if interpret else W)
        self.mesh = mesh        # 1-D "data" mesh: shard_map'd dispatch
        self.n_shards = mesh.size if mesh is not None else 1
        self.devices = devices if devices is not None else jax.local_devices()
        self._rr = 0
        self.sub_scores = sub_scores.astype(np.float32)
        self.np_scores = np_scores
        if kmaxn is None:
            kmaxn = KMAXN_INTERPRET if self.interpret else KMAXN
        self.kmaxn = tuple(kmaxn)
        # extended-coverage rescue tier: gap-overflow-bailed windows are
        # re-run through a SECOND composite whose k-ladder reaches full
        # saturation (k=100 >= every non-SAT continuation: ins saturates
        # at k >= 99-l, del is invalid past k > l <= 100), so it cannot
        # gap-bail — the device analog of the C++ golden fallback, built
        # lazily the first time a group bails (realistic data never
        # compiles it; repeat-saturated contigs measured 30% fallback at
        # ~60ms/alignment serial C++ before this). Interpret mode keeps
        # it OFF unless a kext is passed (a 100-deep interpret ladder
        # would dominate suite time).
        if kext is None and not self.interpret:
            kext = (cfg.max_l,) * cfg.max_n
        self.kext = tuple(kext) if kext else None
        self._cont_cols_ext = None      # built on first rescue
        self.cont_cols = tuple(tuple(t for t in row)
                               for row in build_cont_cols(
                                   np_scores, cfg.max_n, cfg.max_l,
                                   self.kmaxn))
        self.rescue_count = 0           # windows saved by the ext tier
        self._composites = {}
        sub_pad = np.zeros((1, 32), np.float32)
        sub_pad[0, :25] = self.sub_scores.reshape(-1)
        self._sub = sub_pad
        self._sub_on = {}               # device -> resident score table
        self.bail_count = 0
        import os
        # per-group phase timing (put/dispatch/async-copy/get) on stderr;
        # NPORE_TIMING_GROUPS=1 — the per-read NPORE_TIMING split can't
        # attribute time WITHIN the tunneled submit/collect path
        self._timing_groups = os.environ.get("NPORE_TIMING_GROUPS") == "1"
        import threading
        from concurrent.futures import ThreadPoolExecutor
        # two submitter threads: group i+1's batch packing overlaps group
        # i's (possibly blocking) tunneled dispatch. Groups are mutually
        # independent and futures are collected in submission order, so
        # results stay deterministic regardless of execution interleaving.
        # Interpret mode keeps one: its kernels execute as GIL-bound host
        # work, where a second thread only adds contention.
        self._pool = ThreadPoolExecutor(
            max_workers=1 if self.interpret else int(
                os.environ.get("NPORE_SUBMITTERS", "2")),
            thread_name_prefix="npore-submit")
        self._compile_lock = threading.Lock()
        self._state_lock = threading.Lock()   # guards _rr / _sub_on
        self._warm = set()      # (shape, device) whose first run completed

    # ------------------------------------------------------------------
    def g_call_for(self, r_pad: int, ext: bool = False) -> int:
        """Programs per device call, scaled down for big-row buckets: the
        prepass score tiles are ~1.6 GB per 8-program group at r_pad=1536
        and grow linearly with r_pad, so whole-contig buckets (r_pad up to
        ~20k, standardize path: reference src/bam.pyx:93-123) must shrink
        the group to stay inside HBM (v5e: 16 GB). Extended-coverage
        rescue groups carry ~3x the score planes, so they halve again."""
        # NPORE_G_CALL_THR=3072 was A/B'd at the 3072 bucket: 3161 vs
        # 3215 reads/s — no win from 256-window groups there; keep the
        # HBM-conservative 1536 threshold (knob stays for big-HBM boxes)
        thr = int(_os.environ.get("NPORE_G_CALL_THR", "1536"))
        gc = self.g_call if r_pad <= thr else max(
            1, (self.g_call * thr) // r_pad)
        return max(1, gc // 2) if ext else gc

    def align_batch(self, items) -> List[str]:
        """items: sequence with .ref/.seq int arrays and .cigar (expanded).
        Returns extended CIGARs over '=XID'."""
        return self.align_batch_async(items)()

    def align_batch_async(self, items):
        """Submit a batch; returns a zero-arg collector.

        Device work is dispatched asynchronously here, so the caller can
        submit batch i+1 before collecting batch i — the realigner uses
        this to overlap per-read host post-processing (slot decode,
        normalization, SAM assembly) with the next batch's device compute
        (the batched analog of the reference's pipelined pool workers,
        src/realign.py:110-114)."""
        cfg = self.cfg
        items = list(items)
        windows: List[Window] = []
        for i, it in enumerate(items):
            windows.extend(build_windows(it.ref, it.seq, it.cigar, cfg,
                                         aln_idx=i))

        # bucket by padded row count
        by_r: Dict[int, List[Window]] = {}
        for w in windows:
            by_r.setdefault(_r_pad_for(w.b_rows + 1, cfg.max_b_rows),
                            []).append(w)

        # merge tiny tail buckets upward: a bucket holding less than one
        # program's worth of windows whose composite is not yet built
        # would pay a whole per-shape compile/load (~35-70 s on this
        # tunneled backend, NPORE_TIMING_GROUPS on the standardize path)
        # for a single underfilled group. Padding those windows into an
        # already-needed larger bucket is exact: r_pad only sizes the
        # zero-padded tables, and the per-group maxb rules the DP/TB row
        # count (they ride free slots of the larger bucket's groups).
        for rp in sorted(by_r)[:-1]:
            if (len(by_r[rp]) >= self.w_main
                    or (rp, False) in self._composites):
                continue
            target = min((x for x in by_r if x > rp), default=None)
            if target is not None:
                by_r[target] = by_r.pop(rp) + by_r[target]

        # submit every group from a dedicated thread: the batch packing and
        # the tunneled dispatch (which can block while transfers/executions
        # drain, releasing the GIL) overlap the caller's host work — slot
        # decode, CIGAR finalization, SAM assembly of earlier batches
        pending = []
        for r_pad, wins in sorted(by_r.items()):
            wins.sort(key=lambda w: w.b_rows)
            bw = self.n_shards * self.g_call_for(r_pad) * self.w_main
            for lo in range(0, len(wins), bw):
                group = wins[lo:lo + bw]
                pending.append(
                    (group, self._pool.submit(self._submit_group, group,
                                              r_pad)))

        return lambda: self._finish_batch(items, pending)

    def _finish_batch(self, items, pending) -> List[str]:
        cfg = self.cfg
        chunk_cigars: Dict[Tuple[int, int], str] = {}
        bailed_alns = set()
        for group, fut in pending:
            out = self._collect_group(group, fut.result())
            for w, (cig, bail) in zip(group, out):
                if bail:
                    bailed_alns.add(w.key[0])
                chunk_cigars[w.key] = cig

        # extended-coverage rescue: re-run bailed windows through the
        # full-saturation composite (cannot gap-bail by construction);
        # only windows that STILL bail (e.g. traceback errors) fall
        # through to the exact C++ golden path below
        if bailed_alns and self.kext:
            by_r: Dict[int, List[Window]] = {}
            for group, _ in pending:
                for w in group:
                    if w.key[0] in bailed_alns:
                        by_r.setdefault(
                            _r_pad_for(w.b_rows + 1, cfg.max_b_rows),
                            []).append(w)
            pend2 = []
            for r_pad, wins in sorted(by_r.items()):
                wins.sort(key=lambda w: w.b_rows)
                bw = self.n_shards * self.g_call_for(r_pad, ext=True) * W_EXT
                for lo in range(0, len(wins), bw):
                    grp = wins[lo:lo + bw]
                    pend2.append((grp, self._pool.submit(
                        self._submit_group, grp, r_pad, True)))
            rescued = set(bailed_alns)
            for grp, fut in pend2:
                out = self._collect_group(grp, fut.result())
                for w, (cig, bail) in zip(grp, out):
                    if bail:
                        rescued.discard(w.key[0])
                    else:
                        chunk_cigars[w.key] = cig
            self.rescue_count += len(rescued)
            bailed_alns -= rescued

        # golden fallback for bailed alignments (rare: k overflow etc.);
        # prefers the native C++ port (bit-exact, ~14x the python spec)
        for i in sorted(bailed_alns):
            self.bail_count += 1
            it = items[i]
            from ..native import golden_align_native
            full = golden_align_native(it.ref, it.seq, it.cigar,
                                       self.sub_scores, self.np_scores, cfg)
            if full is None:
                from ..golden.align import align as golden_align
                full = golden_align(it.ref, it.seq, it.cigar,
                                    self.sub_scores, self.np_scores, cfg)
            # re-split into this alignment's chunk windows
            ws = build_windows(it.ref, it.seq, it.cigar, cfg, aln_idx=i)
            # golden returns the whole alignment; chunk boundaries are
            # deterministic, so just overwrite the concatenation
            for w in ws:
                chunk_cigars.pop(w.key, None)
            chunk_cigars[(i, 0)] = full

        out = []
        for i in range(len(items)):
            parts = []
            ci = 0
            while (i, ci) in chunk_cigars:
                parts.append(chunk_cigars[(i, ci)])
                ci += 1
            out.append("".join(parts))
        return out

    # ------------------------------------------------------------------
    def _aot_fingerprint(self, r_pad: int, gc: int, wv: int, ext: bool):
        """Cache key for a serialized composite executable: everything
        that shapes the traced graph or the backend binary. Kernel /
        prepass / engine SOURCE bytes are hashed so stale executables
        can never survive a code change; score matrices are baked into
        the trace as constants, so they are part of the key too."""
        import hashlib
        import jax
        h = hashlib.sha256()
        dev = self.devices[0]
        parts = [
            "v1", jax.__version__,
            getattr(dev.client, "platform_version", "?"),
            str((r_pad, gc, wv, ext, self.kmaxn, self.kext, self.cfg)),
            _os.environ.get("NPORE_DP_UNROLL", "0"),
            _os.environ.get("NPORE_PREPASS_BF16", "0"),
        ]
        for p in parts:
            h.update(str(p).encode())
        h.update(self.sub_scores.tobytes())
        h.update(np.ascontiguousarray(self.np_scores).tobytes())
        pkg = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        for src in ("ops/pallas_dp.py", "engine/prepass.py",
                    "engine/pallas_engine.py", "ops/npinfo_device.py"):
            with open(_os.path.join(pkg, src), "rb") as fh:
                h.update(fh.read())
        return h.hexdigest()[:32]

    def _aot_or_jit(self, run, r_pad: int, gc: int, wv: int, ext: bool,
                    B: int, ni: int):
        """Executable-cache wrapper (VERDICT r4 #3: per-shape cold
        compile is 1-3 min and in-process load ~15-20 s even with the
        warm remote-compile cache — the reference pays zero, Cython AOT).
        jax.experimental.serialize_executable round-trips the compiled
        TPU executable through disk. MEASURED NEGATIVE on the axon
        tunnel, hence opt-in (NPORE_AOT_CACHE=1): a fresh process loads
        a tiny probe executable in ~1 s, but the real ~65 MB composite
        trickles through the RPC tunnel in ~260 s — 3x SLOWER than the
        87.8 s warm remote-compile-cache path (PERF.md round-5). On a
        directly-attached TPU the ~1 s load stands, so the path ships
        for real deployments. Single-chip, mesh-less engines only — a
        serialized executable pins its device assignment. Any cache
        failure falls back to the lazy jit path silently."""
        if self.interpret or self.mesh is not None or len(self.devices) != 1:
            return run
        if _os.environ.get("NPORE_AOT_CACHE", "0") != "1":
            return run
        import pickle
        try:
            import jax
            import jax.numpy as jnp
            from jax.experimental import serialize_executable as se
            cache_dir = _os.path.join(_os.path.expanduser(
                _os.environ.get("NPORE_AOT_DIR", "~/.cache/npore_jax/aot")))
            _os.makedirs(cache_dir, exist_ok=True)
            path = _os.path.join(
                cache_dir, self._aot_fingerprint(r_pad, gc, wv, ext) + ".pkl")
            if _os.path.exists(path):
                with open(path, "rb") as fh:
                    payload, in_tree, out_tree = pickle.load(fh)
                return se.deserialize_and_load(payload, in_tree, out_tree)
            pkw = r_pad // 4
            compiled = run.lower(
                jax.ShapeDtypeStruct((B, pkw + ni), jnp.int32),
                jax.ShapeDtypeStruct((1, 32), jnp.float32)).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            tmp = path + f".tmp{_os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree), fh)
            _os.replace(tmp, path)
            return compiled
        except Exception as e:       # cache is an optimization, never a wall
            print(f"    [aot-cache] disabled for r_pad={r_pad}: "
                  f"{type(e).__name__}: {e}", flush=True)
            return run

    # ------------------------------------------------------------------
    def _submit_group(self, group: Sequence[Window], r_pad: int,
                      ext: bool = False):
        import jax
        import jax.numpy as jnp

        if self.mesh is not None:
            dev = None
            put = lambda a: np.asarray(a)   # jit/shard_map places shards
            sub_dev = self._sub
        elif len(self.devices) == 1:
            # single chip: hand the numpy buffer straight to the jitted
            # composite — the transfer rides the execute dispatch instead
            # of a separate device_put RPC (each tunneled RPC costs ~25ms
            # latency; NPORE_TIMING_GROUPS measured put 45-65ms/group)
            dev = self.devices[0]
            with self._state_lock:
                sub_dev = self._sub_on.get(dev)
                if sub_dev is None:
                    sub_dev = jax.device_put(self._sub, dev)
                    self._sub_on[dev] = sub_dev
            put = lambda a: a
        else:
            with self._state_lock:          # submitter threads share _rr
                dev = self.devices[self._rr % len(self.devices)]
                self._rr += 1
                sub_dev = self._sub_on.get(dev)
                if sub_dev is None:         # static table: transfer once
                    sub_dev = jax.device_put(self._sub, dev)
                    self._sub_on[dev] = sub_dev
            put = lambda a: jax.device_put(np.asarray(a), dev)

        cfg = self.cfg
        max_n = cfg.max_n
        r = cfg.r
        gc = self.g_call_for(r_pad, ext)
        wv = W_EXT if ext else self.w_main
        G = self.n_shards * gc              # global programs per dispatch
        B = G * wv
        nblk = r_pad // BLK
        ntb = r_pad // TBLK

        # ONE int32 H2D per group: per window r_pad/4 words of byte-packed
        # ref | seq<<3 | step<<6 followed by the idx planes (the tunnel
        # charges ~25ms latency per call — see _make_composite.run)
        layout = _idx_layout(nblk, ntb)
        ni = sum(w_ for _, w_ in layout)
        pk8 = np.zeros((B, r_pad), np.uint8)
        idx32 = np.zeros((G, wv, ni), np.int32)
        max_rows = fill_group_native(group, r_pad, r, BLK, TBLK, nblk, ntb,
                                     pk8, idx32.reshape(B, -1))
        if max_rows is None:            # no compiler: numpy fallback
            max_rows = self._fill_group_py(group, pk8, idx32, r_pad, wv)
        mb = ((max_rows + MAXB_Q - 1) // MAXB_Q) * MAXB_Q - 1
        mb = min(mb, r_pad - 1)
        idx32[:, :, -1] = mb            # group-wide maxb plane
        buf = np.concatenate(
            [pk8.view(np.int32), idx32.reshape(B, ni)], axis=1)
        self._dbg_last_buf = buf    # scripts/bench_dp_kernel re-packing

        key = (r_pad, ext)
        if key not in self._composites:
            with self._compile_lock:    # compile each shape exactly once
                if key not in self._composites:
                    if ext and self._cont_cols_ext is None:
                        self._cont_cols_ext = tuple(
                            tuple(t for t in row) for row in build_cont_cols(
                                self.np_scores, max_n, cfg.max_l, self.kext))
                    run = _make_composite(
                        r_pad, gc, r, cfg.indel_start,
                        cfg.indel_extend, cfg.inf, max_n, cfg.max_l,
                        self.interpret,
                        self._cont_cols_ext if ext else self.cont_cols,
                        self.kext if ext else self.kmaxn,
                        mesh=self.mesh, sub_scores=self.sub_scores,
                        w_win=wv)
                    self._composites[key] = self._aot_or_jit(
                        run, r_pad, gc, wv, ext, B, ni)
        run = self._composites[key]
        from time import perf_counter as _pc
        t0 = _pc()
        if (key, dev) not in self._warm:
            # serialize the first (compiling) execution of each
            # (shape, device) so concurrent submitters never duplicate a
            # multi-minute compile
            with self._compile_lock:
                buf_d = put(buf)
                t1 = _pc()
                out = run(buf_d, sub_dev)
                self._warm.add((key, dev))
        else:
            buf_d = put(buf)
            t1 = _pc()
            out = run(buf_d, sub_dev)
        t2 = _pc()
        # queue the D2H at submit time: the packed result (~280KB/group)
        # rides the ~20-27MB/s tunnel while LATER groups compute, instead
        # of being paid synchronously inside _collect_group's device_get
        # (round-3 NPORE_TIMING: collect-wait was the largest host stage)
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        if self._timing_groups:
            print(f"    [group r_pad={r_pad} n={len(group)}] "
                  f"put {(t1 - t0) * 1e3:.1f}ms "
                  f"dispatch {(t2 - t1) * 1e3:.1f}ms "
                  f"async-copy {(_pc() - t2) * 1e3:.1f}ms", flush=True)
        return (out, mb, wv)

    def _fill_group_py(self, group: Sequence[Window], pk8: np.ndarray,
                       idx32: np.ndarray, r_pad: int, wv: int = W) -> int:
        """numpy fallback of native.fill_group (and its equality oracle —
        tests/test_groupfill.py pins the two bit-identical)."""
        r = self.cfg.r
        nblk = r_pad // BLK
        ntb = r_pad // TBLK
        planes = {}
        o = 0
        for name, width in _idx_layout(nblk, ntb):
            planes[name] = idx32[:, :, o:o + width]
            o += width
        p0blk, i0blk = planes["p0blk"], planes["i0blk"]
        p1blk, i1blk = planes["p1blk"], planes["i1blk"]
        scal = planes["scal"]

        blk_T0 = np.arange(nblk, dtype=np.int64) * BLK
        tb_T0 = np.arange(ntb, dtype=np.int64) * TBLK
        tb_T1 = tb_T0 + TBLK - 1

        max_rows = 1
        for j, w in enumerate(group):
            g, wl = divmod(j, wv)
            max_rows = max(max_rows, w.b_rows)
            pk8[j, :len(w.ref)] = np.asarray(w.ref).astype(np.uint8) & 7
            pk8[j, :len(w.seq)] |= (np.asarray(w.seq).astype(np.uint8)
                                    & 7) << 3

            R_w = w.b_rows
            inss = w.inss_local.astype(np.int64)
            dels = np.arange(R_w) - inss
            pk8[j, 1:R_w] |= (np.diff(dels).astype(np.uint8)) << 6
            scal[g, wl] = (R_w, w.n_ins, w.n_del, w.ref_guard, w.seq_guard,
                           0, 0, 0)

            last = R_w - 1
            T0s = np.minimum(blk_T0, last)
            p0blk[g, wl] = dels[T0s] - r - 7
            i0blk[g, wl] = inss[T0s]
            p1blk[g, wl] = dels[np.minimum(tb_T0, last)]
            i1blk[g, wl] = inss[np.minimum(tb_T1, last)]
        return max_rows

    def _collect_group(self, group: Sequence[Window], handles):
        import jax
        out_h, maxb, wv = handles
        # ONE device_get: [dp_bail | tb_bail | slot tiles] per program
        if self._timing_groups:
            from time import perf_counter as _pc
            t0 = _pc()
            out = np.asarray(jax.device_get(out_h))
            print(f"    [group n={len(group)}] get {(_pc() - t0) * 1e3:.1f}ms",
                  flush=True)
        else:
            out = np.asarray(jax.device_get(out_h))
        G = out.shape[0]
        w8 = wv * 8
        dp_bail = out[:, :w8].reshape(G, wv, 8)[:, :, 0]
        tb_bail = out[:, w8:2 * w8].reshape(G, wv, 8)[:, :, 0]
        slots = out[:, 2 * w8:].reshape(G, -1, wv, LANES)

        # decode all windows of the group in one vectorized pass: slots
        # are 4-bit packed (row t at tile t//1024, nibble (t//128)%8,
        # lane t%128; long runs chunked across skipped rows — see
        # ops/pallas_dp.get_tb_call), slot tiles beyond the processed
        # rows are never written, so unpack nibbles, truncate at maxb,
        # then expand every (op|count<<2) slot with a single np.repeat
        # and split by per-window char counts (chunks of one run merge
        # by concatenation)
        shifts = (np.arange(8, dtype=np.int32) * 4)[None, :, None, None]
        cigs: List[str] = []
        for g in range(G):
            nib = (slots[g][:, None, :, :] >> shifts) & 15
            vec = np.ascontiguousarray(
                nib.transpose(2, 0, 1, 3)).reshape(wv, -1)[:, :maxb + 1]
            mask = vec != 0
            flat = vec[mask]
            counts = flat >> 2
            chars = np.repeat(_OPCH[flat & 3], counts)
            wid = np.repeat(np.arange(wv), mask.sum(axis=1))
            per_w = np.bincount(wid, weights=counts,
                                minlength=wv).astype(np.int64)
            bounds = np.zeros(wv + 1, np.int64)
            np.cumsum(per_w, out=bounds[1:])
            cb = chars.tobytes()
            cigs.extend(cb[bounds[k]:bounds[k + 1]].decode("ascii")
                        for k in range(wv))
        out = []
        for j, w in enumerate(group):
            g, wl = divmod(j, wv)
            bail = bool(dp_bail[g, wl] or tb_bail[g, wl])
            out.append((cigs[g * wv + wl], bail))
        return out
