"""End-to-end CLI runs for the bed and purity tools on the checked-in
fixtures (reference drivers: src/bed.py:147-165, src/purity.py:174-212;
their goldens are visual/absent, so these assert structural invariants:
file inventory, BED merge/complement algebra, n=1 homopolymer ground
truth, purity score domain and cache round-trip)."""
import os

import numpy as np

from npore_tpu.cli.bed import main as bed_main
from npore_tpu.cli.purity import main as purity_main


def _read_bed(path):
    out = []
    with open(path) as fh:
        for line in fh:
            f = line.split("\t")
            out.append((f[0], int(f[1]), int(f[2])))
    return out


def test_cli_bed_e2e(tmp_path, data_dir):
    ref = os.path.join(data_dir, "ref.fasta")
    with open(ref) as fh:
        seq = "".join(l.strip() for l in fh if not l.startswith(">"))
    bed = tmp_path / "genome.bed"
    bed.write_text(f"ref\t0\t{len(seq)}\n")
    pre = str(tmp_path / "np")
    rc = bed_main(["--ref", ref, "--bed", str(bed), "--out_prefix", pre,
                   "--max_n", "3"])
    assert rc == 0
    for suffix in ["_1", "_2", "_3", "_all", "_0"]:
        assert os.path.isfile(pre + suffix + ".bed"), suffix

    # n=1 BED must cover exactly the >=3-long homopolymer runs (slop 1)
    runs = []
    i = 0
    while i < len(seq):
        j = i
        while j < len(seq) and seq[j] == seq[i]:
            j += 1
        if j - i >= 3:
            runs.append((max(0, i - 1), j + 1))
        i = j
    n1 = _read_bed(pre + "_1.bed")
    assert n1, "no homopolymer regions found in fixture ref"
    got = [(b, e) for _, b, e in n1]
    # every true run is covered by exactly one merged interval
    for b, e in runs:
        assert any(gb <= b and e <= ge for gb, ge in got), (b, e)

    # union + complement partition the genome: disjoint, sorted, covering
    allr = _read_bed(pre + "_all.bed")
    comp = _read_bed(pre + "_0.bed")
    ivals = sorted([(b, e) for _, b, e in allr] + [(b, e) for _, b, e in comp])
    assert ivals[0][0] == 0 and ivals[-1][1] == len(seq)
    for (b1, e1), (b2, e2) in zip(ivals, ivals[1:]):
        assert e1 == b2, "gap or overlap in _all + _0 partition"

    # chunk-parallel scan (multiple chunks over a process pool) must give
    # byte-identical BEDs to the serial single-chunk run
    pre2 = str(tmp_path / "np_par")
    rc = bed_main(["--ref", ref, "--bed", str(bed), "--out_prefix", pre2,
                   "--max_n", "3", "--chunk_width", "200",
                   "--processes", "3"])
    assert rc == 0
    for suffix in ["_1", "_2", "_3"]:
        par = _read_bed(pre2 + suffix + ".bed")
        ser = _read_bed(pre + suffix + ".bed")
        # chunking clips repeats at chunk boundaries (reference does the
        # same, src/bed.py:56-76), so compare coverage of interior runs
        for c, b, e in ser:
            assert any(pb <= b and e <= pe or  # fully covered, or split
                       (pb <= b < pe or pb < e <= pe)
                       for _, pb, pe in par), (suffix, b, e)


def test_purity_device_matches_host(data_dir):
    """The batched device Gini (integer moments, SURVEY §2.4 per-column
    row) must reproduce the host per-column formula, including the
    fixed-width fallback path and under a sharded mesh."""
    import jax
    from npore_tpu.cli.purity import (INS_SLOTS, bam_purity, column_counts,
                                      compute_purity, gini_moments_device,
                                      purity_from_moments)
    bam = os.path.join(data_dir, "reads.bam")
    host = bam_purity(bam, None, None, None, 13, processes=1)
    dev = bam_purity(bam, None, None, None, 13, processes=1, device=True)
    assert host.shape == dev.shape and len(host) > 0
    assert np.allclose(host, dev, rtol=0, atol=1e-12)

    from npore_tpu.parallel.mesh import make_data_mesh
    mesh = make_data_mesh(jax.devices("cpu")[:8])
    msh = bam_purity(bam, None, None, None, 13, processes=1, device=True,
                     mesh=mesh)
    assert np.array_equal(dev, msh)

    # deep-ins column exceeds INS_SLOTS -> host fallback, still scored
    col = "".join(f"A+{len(s)}{s}" for s in
                  ("T", "TT", "TTT", "GG", "GGG", "C", "CC", "CCC", "AAC"))
    assert column_counts(col) is None
    assert compute_purity(col) is not None

    # moment math equals the per-term formula on a crafted column
    b, iv = column_counts("^KA$AA+2TTC")
    n, ssb, ni, ssi = gini_moments_device(b[None], iv[None])
    got = purity_from_moments(n, ssb, ni, ssi)[0]
    want = compute_purity("^KA$AA+2TTC")
    assert np.allclose(got, want, atol=1e-15)


def test_cli_purity_e2e(tmp_path, data_dir):
    bam = os.path.join(data_dir, "reads.bam")
    pre = str(tmp_path / "pur")
    rc = purity_main(["--bams", f"{bam},{bam}", "--names", "a,b",
                      "--out_prefix", pre, "--plot"])
    assert rc == 0
    assert os.path.isfile(pre + "_purity.png")
    for name in ("a", "b"):
        scores = np.load(f"{pre}_{name}.npy")
        assert scores.ndim == 2 and scores.shape[1] == 2
        assert len(scores) > 0
        assert (scores >= 0).all() and (scores <= 1).all()
    a = np.load(f"{pre}_a.npy")
    b = np.load(f"{pre}_b.npy")
    assert np.array_equal(a, b)            # same BAM -> identical scores

    # cache round-trip: --plot_only must not touch the BAMs
    os.remove(pre + "_purity.png")
    rc = purity_main(["--bams", "missing1,missing2", "--names", "a,b",
                      "--out_prefix", pre, "--plot_only"])
    assert rc == 0
    assert os.path.isfile(pre + "_purity.png")
