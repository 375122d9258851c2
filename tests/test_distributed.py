"""Multi-host scaffolding: region sharding, SAM merge, count reduction.

Single-process semantics are exercised directly; the mesh psum runs on the
8 virtual CPU devices (cross-host collectives share the same code path).
(Reference scope: single host mp.Pool, src/realign.py:110-114 — the
multi-host layer is new surface demanded by the multi-chip design.)
"""
import numpy as np

from npore_tpu.parallel.distributed import (host_out_path, init_distributed,
                                            merge_host_sams, shard_regions)


def test_init_single_host_noop():
    assert init_distributed(None, 1, None) == (0, 1)


def test_shard_regions_partition():
    regions = [("chr1", i * 100, (i + 1) * 100) for i in range(10)] + \
              [("chr2", 0, 50)]
    shards = [shard_regions(regions, 4, i) for i in range(4)]
    flat = sorted(r for s in shards for r in s)
    assert flat == sorted(regions)                 # exact partition
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1            # balanced


def test_merge_host_sams(tmp_path):
    pre = str(tmp_path / "out")
    hdr = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:c1\tLN:1000",
           "@SQ\tSN:c2\tLN:500"]
    recs = [
        ("c1", 5, "r2"), ("c1", 9, "r0"), ("c2", 1, "r3"), ("c1", 2, "r1"),
    ]
    # host 0 gets even, host 1 odd — merge must coordinate-sort
    for h in range(2):
        with open(host_out_path(pre, h, 2), "w") as fh:
            for line in hdr:
                fh.write(line + "\n")
            for i, (c, p, q) in enumerate(recs):
                if i % 2 == h:
                    fh.write(f"{q}\t0\t{c}\t{p}\t60\t4M\t*\t0\t0\tACGT\t"
                             f"IIII\n")
    out = merge_host_sams(pre, 2)
    lines = [l.rstrip("\n") for l in open(out)]
    assert lines[:3] == hdr
    body = [l.split("\t")[0] for l in lines[3:]]
    assert body == ["r1", "r2", "r0", "r3"]


def test_mesh_psum_confusion_counts():
    """reduce_confusion_matrices psums per-shard partials to the exact
    serial totals (the real-CM replacement for the op-count demo)."""
    import jax
    from npore_tpu.parallel.mesh import (make_data_mesh,
                                         reduce_confusion_matrices)
    devs = jax.devices("cpu")[:8]
    mesh = make_data_mesh(devs)
    rng = np.random.default_rng(0)
    subs = rng.integers(0, 100, (8, 5, 5)).astype(np.int64)
    nps = rng.integers(0, 100, (8, 2, 4, 4)).astype(np.int64)
    inss = rng.integers(0, 100, (8, 7)).astype(np.int64)
    dels = rng.integers(0, 100, (8, 7)).astype(np.int64)
    su, np_, in_, de = reduce_confusion_matrices(mesh, subs, nps, inss, dels)
    assert np.array_equal(su, subs.sum(0))
    assert np.array_equal(np_, nps.sum(0))
    assert np.array_equal(in_, inss.sum(0))
    assert np.array_equal(de, dels.sum(0))


def test_stats_parallel_matches_serial(data_dir, tmp_path):
    """Chunk-parallel confusion training equals the serial accumulation."""
    import os
    from npore_tpu.config import RealignConfig, AlignConfig
    from npore_tpu.engine.regions import get_bam_regions
    from npore_tpu.engine.stats import calc_confusion_matrices_bam
    from npore_tpu.io.fasta import FastaFile
    from npore_tpu.io.bam import open_alignment_file

    bam_path = os.path.join(data_dir, "reads.bam")
    ref_path = os.path.join(data_dir, "ref.fasta")
    cfg = RealignConfig(bam=bam_path, ref=ref_path,
                        align=AlignConfig(max_n=2, max_l=20),
                        chunk_width=300)
    ref_fa = FastaFile(ref_path)
    bam = open_alignment_file(bam_path)
    regions = get_bam_regions(cfg, ref_fa, bam)
    ser = calc_confusion_matrices_bam(bam_path, ref_fa, regions, cfg,
                                      processes=1)
    par = calc_confusion_matrices_bam(bam_path, ref_fa, regions, cfg,
                                      processes=3)
    for a, b in zip(ser, par):
        assert np.array_equal(a, b)
    assert ser[0].sum() > 0
