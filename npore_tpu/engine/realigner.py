"""Batched realignment orchestration.

Replaces the reference's per-read multiprocessing worker model
(reference: src/realign.py:110-114, src/bam.pyx:51-89) with a batched
device pipeline:

    reads -> windows (host) -> R-bucketed batches -> device DP (XLA/Pallas)
          -> host traceback -> per-read CIGAR reassembly -> normalize -> SAM

Every chunk of every read is an independent work item (chunks re-anchor on
the original path), so windows from different reads mix freely in a batch.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..config import AlignConfig
from ..constants import bases_to_int
from ..io.cigar import expand_cigar, finalize_cigar
from ..io.sam import SamRecord
from .windows import Window, build_windows, pack_batch

# R-size buckets; windows run in the smallest bucket that fits
BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 20032)
CELL_BUDGET = 1 << 17   # B*R cells per batch keeps outputs ~40MB

_cache_enabled = False


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across processes; the scan graphs are large
    and their compile time dominates small runs otherwise."""
    global _cache_enabled
    if _cache_enabled:
        return
    import os
    import jax
    cache_dir = os.environ.get("NPORE_JAX_CACHE",
                               os.path.expanduser("~/.cache/npore_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _cache_enabled = True


def _bucket_for(b_rows: int) -> int:
    for b in BUCKETS:
        if b_rows <= b:
            return b
    raise ValueError(f"window of {b_rows} rows exceeds largest bucket")


@dataclasses.dataclass
class AlignItem:
    """One alignment job: int-encoded ref window, query, expanded CIGAR."""
    ref: np.ndarray
    seq: np.ndarray
    cigar: str


class Realigner:
    def __init__(self, sub_scores: np.ndarray, np_scores: np.ndarray,
                 cfg: AlignConfig = AlignConfig(), engine: str = "auto"):
        self.cfg = cfg
        if engine == "auto":
            engine = "pallas"
        self.engine = engine
        self.sub_scores = sub_scores
        self.np_scores = np_scores
        self.errors: List[str] = []
        self.skipped: List[str] = []
        self._pallas = None
        if engine == "pallas":
            _enable_compilation_cache()
            from .pallas_engine import PallasEngine
            self._pallas = PallasEngine(sub_scores, np_scores, cfg)
        elif engine == "xla":
            import jax
            import jax.numpy as jnp
            _enable_compilation_cache()
            from ..ops.band_dp import Tables, build_cont_tables
            self._cont = build_cont_tables(np_scores, cfg.max_n, cfg.max_l)
            self._tables = Tables(sub_flat=jnp.asarray(sub_scores.reshape(-1)),
                                  cont=jnp.asarray(self._cont.reshape(-1)))
            self._dp_cache: Dict[int, object] = {}

    @property
    def bail_count(self) -> int:
        return self._pallas.bail_count if self._pallas else 0

    # ------------------------------------------------------------------
    def _dp(self, r_max: int):
        fn = self._dp_cache.get(r_max)
        if fn is None:
            from ..ops.band_dp import make_window_dp
            fn = make_window_dp(r_max, self.cfg, self.cfg.max_n)
            self._dp_cache[r_max] = fn
        return fn

    def align_batch(self, items: Sequence[AlignItem]) -> List[str]:
        """Realign a batch of alignments; returns extended CIGARs ('=XID')."""
        if self.engine == "golden":
            from ..golden.align import align as golden_align
            return [golden_align(it.ref, it.seq, it.cigar, self.sub_scores,
                                 self.np_scores, self.cfg, self.errors)
                    for it in items]
        if self.engine == "pallas":
            return self._pallas.align_batch(items)
        return self._align_batch_device(items)

    def _align_batch_device(self, items: Sequence[AlignItem]) -> List[str]:
        import jax.numpy as jnp
        from ..ops.traceback import traceback_window

        windows: List[Window] = []
        for i, it in enumerate(items):
            windows.extend(build_windows(it.ref, it.seq, it.cigar,
                                         self.cfg, aln_idx=i))

        by_bucket: Dict[int, List[Window]] = {}
        for w in windows:
            by_bucket.setdefault(_bucket_for(w.b_rows), []).append(w)

        chunk_cigars: Dict[Tuple[int, int], str] = {}
        dummy = Window(key=(-1, -1), b_rows=1, n_ins=0, n_del=0,
                       seq=np.zeros(1, np.int8), ref=np.zeros(1, np.int8),
                       inss_local=np.zeros(1, np.int32),
                       ref_guard=0, seq_guard=0)
        for r_max, wins in sorted(by_bucket.items()):
            bsz = max(4, CELL_BUDGET // r_max)
            dp = self._dp(r_max)
            for lo in range(0, len(wins), bsz):
                group = wins[lo:lo + bsz]
                # pad the batch to a power of two with trivial windows so the
                # number of compiled shapes stays small
                nb = 4
                while nb < len(group):
                    nb *= 2
                pad = [dummy] * (nb - len(group))
                batch = pack_batch(group + pad, r_max, self._cont,
                                   self.cfg.max_n)
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                typs, runs = dp(batch, self._tables)
                typs = np.asarray(typs)
                runs = np.asarray(runs)
                for j, w in enumerate(group):
                    chunk_cigars[w.key] = traceback_window(
                        typs[j], runs[j], w.inss_local, w.seq, w.ref,
                        w.n_ins, w.n_del, self.cfg.r, self.errors)

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
    def realign_records(self, reads: Iterable[SamRecord],
                        batch_size: int = 128,
                        prefetch: int = 2) -> Iterable[SamRecord]:
        """Full read pipeline (reference: src/bam.pyx:51-89): strip clips,
        realign, left-normalize to fixpoint, emit the new SAM record with
        preserved identity fields and an HP tag.

        Read decode runs on a worker thread (the native BAM decoder
        releases the GIL), overlapping host decode with device compute —
        the batched analog of the reference's reader/worker pool split
        (src/realign.py:110-114).

        The pipeline is three host stages on dedicated threads, so the
        main thread only yields ready records (the round-2 e2e finding:
        per-read main-thread submit ~230us + finalize ~130us sat serially
        on top of the ~360us device wait):

            producer: stream/decode reads into batches
            stage A : prep + window building + async device dispatch
            stage B : device collect + CIGAR finalize + SAM assembly
        """
        import os
        import queue
        import threading
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        from time import perf_counter

        timing = os.environ.get("NPORE_TIMING") == "1"
        t_sub = [0.0]           # stage-A thread: prep + window build + submit
        t_coll = [0.0]          # stage-B thread: device-result wait
        t_emit = [0.0]          # stage-B thread: finalize + SAM assembly
        t_wait = t_main = 0.0   # main thread: decode wait / pipeline wait
        n_done = 0

        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))

        def producer():
            batch: List[SamRecord] = []
            try:
                for read in reads:
                    batch.append(read)
                    if len(batch) >= batch_size:
                        q.put(batch)
                        batch = []
                if batch:
                    q.put(batch)
                q.put(None)
            except BaseException as e:       # surface in the consumer
                q.put(e)

        def stage_a(batch):
            t0 = perf_counter()
            items, meta = self._prep_batch(batch)
            if self.engine == "pallas":
                collect = self._pallas.align_batch_async(items)
            else:
                collect = (lambda its: lambda: self.align_batch(its))(items)
            t_sub[0] += perf_counter() - t0
            return meta, collect

        def stage_b(fut_a):
            # collect + finalize + SAM assembly all on ONE worker thread:
            # moving finalize to the main thread was measured WORSE on HW
            # (3566 -> 2674 reads/s; collect-wait 86 -> 289us/read — the
            # main-thread finalize contends on the GIL with this thread's
            # slot decode), as was a 2-3 worker stage-B pool
            meta, collect = fut_a.result()
            c_acc = [0.0]

            def timed_collect():
                c0 = perf_counter()
                res = collect()
                c_acc[0] += perf_counter() - c0
                return res
            t0 = perf_counter()
            out = list(self._emit_batch(meta, timed_collect))
            t_coll[0] += c_acc[0]
            t_emit[0] += perf_counter() - t0 - c_acc[0]
            return out

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        ex_a = ThreadPoolExecutor(1)
        # stage-B workers: 1 by default — widening to 3 was measured WORSE
        # pre-fused-put on HW (2853 -> 1768 reads/s; GIL thrash on the
        # 4-core host); NPORE_STAGEB re-tests now that the submit path is
        # nearly free
        nb = int(os.environ.get("NPORE_STAGEB", "1"))
        ex_b = ThreadPoolExecutor(nb)
        inflight: deque = deque()
        try:
            while True:
                t0 = perf_counter()
                item = q.get()
                t_wait += perf_counter() - t0
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                inflight.append(ex_b.submit(stage_b,
                                            ex_a.submit(stage_a, item)))
                while len(inflight) > 2:
                    t0 = perf_counter()
                    out = inflight.popleft().result()
                    t_main += perf_counter() - t0
                    n_done += len(out)
                    yield from out
            while inflight:
                t0 = perf_counter()
                out = inflight.popleft().result()
                t_main += perf_counter() - t0
                n_done += len(out)
                yield from out
            t.join()
        finally:
            for f in inflight:
                f.cancel()
            # cancel_futures drops queued (not-yet-running) stage tasks so an
            # aborted run can't dispatch device work nobody will collect
            ex_a.shutdown(wait=False, cancel_futures=True)
            ex_b.shutdown(wait=False, cancel_futures=True)
            # drain already-running futures so concurrent failures surface
            # (logged, not raised — the primary error is already propagating)
            for f in inflight:
                if not f.cancelled():
                    exc = None
                    try:
                        exc = f.exception(timeout=60)
                    except Exception as e:
                        exc = e
                    if exc is not None:
                        self.errors.append(f"pipeline abort: {exc!r}")
        if timing and n_done:
            us = 1e6 / n_done
            print(f"    [timing] per read: submit {t_sub[0]*us:.0f}us, "
                  f"collect-wait {t_coll[0]*us:.0f}us, "
                  f"finalize+emit {t_emit[0]*us:.0f}us, "
                  f"decode-wait {t_wait*us:.0f}us, "
                  f"main-wait {t_main*us:.0f}us "
                  f"(submit/collect/finalize on worker threads)",
                  flush=True)

    def _do_batch(self, reads: List[SamRecord]) -> Iterable[SamRecord]:
        items, meta = self._prep_batch(reads)
        return self._emit_batch(
            meta, (lambda its: lambda: self.align_batch(its))(items))

    def _prep_batch(self, reads: List[SamRecord]):
        items = []
        meta = []
        for read in reads:
            aln = getattr(read, "aln", None)
            if aln is not None:              # native decoder prep fast path
                int_ref, int_seq, cig = aln
                items.append(AlignItem(int_ref, int_seq, cig))
                meta.append((read, int_ref, int_seq))
                continue
            try:
                cig = expand_cigar(read.cigar).replace("S", "").replace("H", "")
                int_ref = bases_to_int(read.get_reference_sequence().upper())
                int_seq = bases_to_int(read.query_alignment_sequence.upper())
            except (ValueError, KeyError, IndexError) as e:
                # tolerate malformed records (bad MD/CIGAR, unknown codes)
                # the way the reference's pysam path shrugs off oddities:
                # skip with a warning instead of aborting the run
                self.skipped.append(f"read {read.qname} skipped: {e}")
                continue
            items.append(AlignItem(int_ref, int_seq, cig))
            meta.append((read, int_ref, int_seq))
        return items, meta

    def _emit_batch(self, meta, collect) -> Iterable[SamRecord]:
        return self._finalize_records(meta, collect())

    def _finalize_records(self, meta, new_cigars) -> Iterable[SamRecord]:
        # batched C++ finalization: one FFI call for the whole batch
        # (the per-read ctypes glue cost 30-50us/read of GIL-bound
        # Python on this hot path); falls back per-read without a
        # compiler or on odd dtypes/errors
        from ..native import finalize_cigar_batch
        new_cigars = list(new_cigars)
        finals = finalize_cigar_batch(
            new_cigars, [m_[1] for m_ in meta], [m_[2] for m_ in meta])
        if finals is None:
            finals = [finalize_cigar(c, m_[1], m_[2])
                      for c, m_ in zip(new_cigars, meta)]
        for (read, int_ref, int_seq), norm in zip(meta, finals):
            hap = int(read.get_tag("HP")) if read.has_tag("HP") else 0
            # output line fields per reference (src/bam.pyx:83);
            # tlen = reference_end - pos = the aligned reference span,
            # which is exactly len(int_ref) (the MD-reconstructed window)
            yield SamRecord(
                qname=read.qname, flag=read.flag, rname=read.rname,
                pos=read.pos, mapq=read.mapq, cigar=norm,
                rnext="*", pnext=0, tlen=len(int_ref),
                seq=read.query_alignment_sequence.upper(),
                qual=read.query_alignment_qualities_str,
                tags={"HP": ("i", hap)})
