"""Executed (not arg-checked) shell-pipeline coverage via mock tools.

tests/mock_tools/ stands in for minimap2/samtools/whatshap/tabix/clair3
(absent from this image), implementing the cheap behaviors functionally on
npore_tpu's own IO stack. These tests EXECUTE scripts/align.sh and a full
STAGE-complete scripts/realign_pipeline.sh iteration, so stage sequencing,
file naming, and flag plumbing run for real (reference structure:
scripts/realign_pipeline.sh:3-16 stage flags, :428-456 iterate loop).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MOCK = os.path.join(REPO, "tests", "mock_tools")


def _env(**extra):
    env = dict(os.environ)
    env["PATH"] = MOCK + os.pathsep + env["PATH"]
    env["NPORE_PLATFORM"] = "cpu"
    env.update(extra)
    return env


def test_align_sh_executes(data_dir, tmp_path):
    """align.sh fastq path: minimap2 (canned) -> sort -> calmd -> index."""
    out = str(tmp_path / "aln")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts/align.sh"),
         os.path.join(data_dir, "reads.fastq"),
         os.path.join(data_dir, "ref.fasta"), out],
        env=_env(MOCK_MINIMAP2_SAM=os.path.join(data_dir, "reads.sam")),
        cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert os.path.exists(out + ".bam") and os.path.exists(out + ".bam.bai")
    from npore_tpu.io.bam import BamReader
    from npore_tpu.io.fasta import FastaFile
    recs = list(BamReader(out + ".bam"))
    assert len(recs) == 10 and all(r_.has_tag("MD") for r_ in recs)
    ref = FastaFile(os.path.join(data_dir, "ref.fasta")).fetch("ref")
    for r_ in recs:   # mock calmd MD must reconstruct the FASTA slice
        assert (r_.get_reference_sequence().upper()
                == ref[r_.pos:r_.reference_end].upper())
    assert all(recs[i].pos <= recs[i + 1].pos for i in range(len(recs) - 1))


def _make_pipeline_fixtures(data_dir, wd):
    """Two-contig genome, 0_reads.bam over it, truth VCF + BED,
    and a calls VCF for the mock Clair3 to emit."""
    from npore_tpu.io.bam import BamReader
    from npore_tpu.io.bam_writer import write_bam
    from npore_tpu.io.fasta import FastaFile, write_fasta
    from npore_tpu.io.vcf import VcfRecord, write_vcf

    rng = np.random.default_rng(2)
    ref1 = FastaFile(os.path.join(data_dir, "ref.fasta")).fetch("ref")
    ref2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    genome = os.path.join(wd, "genome.fasta")
    write_fasta(genome, {"ref": ref1, "ref2": ref2})

    recs = list(BamReader(os.path.join(data_dir, "reads.bam")))
    write_bam(os.path.join(wd, "0_reads.bam"), ["ref", "ref2"],
              [len(ref1), len(ref2)], recs)

    header = ["##fileformat=VCFv4.2",
              f"##contig=<ID=ref,length={len(ref1)}>",
              f"##contig=<ID=ref2,length={len(ref2)}>",
              '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">',
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"]

    def snp(contig, seq, pos, gt):
        ref_b = seq[pos]
        alt = "ACGT"[("ACGT".index(ref_b) + 1) % 4]
        return VcfRecord(contig=contig, pos=pos, id=".",
                         alleles=(ref_b, alt), qual=30.0, filter="PASS",
                         info=".", fmt="GT", sample=gt)

    truth = [snp("ref", ref1, 120, "0|1"), snp("ref", ref1, 480, "1|1"),
             snp("ref", ref1, 702, "1|0"), snp("ref2", ref2, 60, "0|1")]
    write_vcf(os.path.join(wd, "truth.vcf.gz"), header, truth)
    calls = [snp("ref", ref1, 120, "0/1"), snp("ref", ref1, 480, "1/1"),
             snp("ref", ref1, 333, "0/0"),       # GT-filtered out
             snp("ref2", ref2, 60, "0/1")]
    calls_path = os.path.join(wd, "mock_calls.vcf")
    write_vcf(calls_path, header, calls)
    with open(os.path.join(wd, "truth.bed"), "w") as fh:
        fh.write(f"ref\t0\t{len(ref1)}\nref2\t0\t{len(ref2)}\n")
    return genome, calls_path


@pytest.mark.slow
def test_realign_pipeline_full_iteration(data_dir, tmp_path):
    """One full iteration (itr 0 std_ref/cand_call -> itr 1 rephase/
    std_ref/realign/cand_call -> terminal rephase/realign/var_call): every
    stage executes against the mock tools and the real npore_tpu CLIs."""
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    genome, calls_path = _make_pipeline_fixtures(data_dir, wd)

    env = _env(
        STAGE_REPHASE="1", STAGE_STD_REF="1", STAGE_REALIGN="1",
        STAGE_CAND_CALL="1", STAGE_VAR_CALL="1",
        START_ITR="0", STOP_ITR="1",
        TRAIN_CHRS="ref", TEST_CHRS="ref2",
        CLAIR3_DIR=os.path.join(MOCK, "clair3"),
        CLAIR3_MODEL="mock_model",
        MOCK_CLAIR3_VCF=calls_path,
    )
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts/realign_pipeline.sh"),
         wd, os.path.join(data_dir, "reads.fastq"), genome,
         os.path.join(wd, "truth.vcf.gz"), os.path.join(wd, "truth.bed"),
         os.path.join(REPO, "guppy5_stats")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-4000:]

    # stage artifacts, in pipeline order
    must_exist = [
        "ref/0_std.vcf.gz",            # itr0 std_ref (unphased truth)
        "1_candidates.vcf.gz",         # itr0 cand_call
        "1_allcalls.vcf.gz", "1_calls.vcf.gz",
        "1_phased.vcf.gz", "1_phased.bam", "1_phased_all.sam",  # rephase 1
        "ref/1_phased.vcf.gz", "ref/1_std.vcf.gz",              # std_ref 1
        "1_reads.bam", "1_reads.bam.bai",                       # realign 1
        "2_candidates.vcf.gz", "2_calls.vcf.gz",                # cand_call 1
        "2_phased.bam",                                         # rephase 2
        "2_reads.bam",                                          # realign 2
        "2_variant_cands.vcf.gz", "2_variants.vcf.gz",          # var_call
    ]
    for f in must_exist:
        assert os.path.exists(os.path.join(wd, f)), (f, r.stdout[-3000:])

    from npore_tpu.io.bam import BamReader
    from npore_tpu.io.vcf import VcfReader

    # GT=0/0 exclusion really filtered
    allcalls = list(VcfReader(os.path.join(wd, "1_allcalls.vcf.gz")))
    assert all(rec.gt != (0, 0) for rec in allcalls)
    assert len(allcalls) == 3

    # haplotag tagged every read; realign preserved read count + HP
    phased = list(BamReader(os.path.join(wd, "1_phased.bam")))
    assert len(phased) == 10 and all(p.has_tag("HP") for p in phased)
    realigned = list(BamReader(os.path.join(wd, "1_reads.bam")))
    assert len(realigned) == 10
    assert all(p.has_tag("MD") for p in realigned)

    # std_ref(1) produced a merged standardized VCF with records
    std = list(VcfReader(os.path.join(wd, "ref/1_std.vcf.gz")))
    assert len(std) >= 2


def test_happy_sh_executes(data_dir, tmp_path):
    """happy.sh full call x truth x stratum sweep EXECUTES via the hap.py
    mock (reference sweep: scripts/happy.sh:85-100), and its outputs feed
    scripts/plot_results.py end to end."""
    import subprocess
    from npore_tpu.io.vcf import VcfRecord, make_header, write_vcf

    wd = str(tmp_path)
    ref = os.path.join(data_dir, "ref.fasta")
    hdr = make_header([("ref", 1000)])

    def v(pos, ra, aa, qual):
        return VcfRecord(contig="ref", pos=pos, id=".", alleles=(ra, aa),
                         qual=qual, filter="PASS", info=".", fmt="GT",
                         sample="1/1")

    truth = [v(100, "A", "C", 50), v(220, "G", "T", 50),
             v(340, "C", "A", 50), v(700, "T", "G", 50),
             v(450, "A", "AT", 50), v(810, "GA", "G", 50)]
    # call1: misses the SNP at 700, adds a false SNP at 900 (low qual)
    call1 = [t for t in truth if t.pos != 700] + [v(900, "C", "G", 5)]
    # call2: perfect
    write_vcf(os.path.join(wd, "truth.vcf.gz"), hdr, truth)
    write_vcf(os.path.join(wd, "call1.vcf.gz"), hdr, sorted(
        call1, key=lambda r: r.pos))
    write_vcf(os.path.join(wd, "call2.vcf.gz"), hdr, truth)

    # stratum BEDs as the bed CLI names them: {prefix}_{n}.bed
    bedpre = os.path.join(wd, "np")
    with open(bedpre + "_1.bed", "w") as fh:
        fh.write("ref\t0\t500\n")           # first half only
    with open(bedpre + "_all.bed", "w") as fh:
        fh.write("ref\t0\t1000\n")

    outdir = os.path.join(wd, "happy")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts/happy.sh"), ref, bedpre,
         outdir, "--calls", "c1=" + os.path.join(wd, "call1.vcf.gz"),
         "c2=" + os.path.join(wd, "call2.vcf.gz"),
         "--truths", "tr=" + os.path.join(wd, "truth.vcf.gz"),
         "--jobs", "2"],
        env=_env(), cwd=REPO, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    # full sweep: 2 calls x 1 truth x 2 strata, gunzipped ROC csvs
    prefixes = [os.path.join(outdir, f"{c}-np_{b}-tr-evalall")
                for c in ("c1", "c2") for b in ("1", "all")]
    for p in prefixes:
        assert os.path.exists(p + ".summary.csv"), p
        for t in ("SNP", "INDEL"):
            assert os.path.exists(p + f".roc.Locations.{t}.PASS.csv"), p

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import plot_results

    # hand-checked P/R: c1 over np_all -> SNPs 3 TP, 1 FP, 1 FN
    s = plot_results.read_summary(os.path.join(
        outdir, "c1-np_all-tr-evalall"))
    assert s["SNP"] == (0.75, 0.75)
    assert s["INDEL"] == (1.0, 1.0)
    # c2 is perfect everywhere
    s2 = plot_results.read_summary(os.path.join(
        outdir, "c2-np_all-tr-evalall"))
    assert s2["SNP"] == (1.0, 1.0) and s2["INDEL"] == (1.0, 1.0)
    # np_1 stratum restricts to pos<500: truth has 3 SNPs there
    s3 = plot_results.read_summary(os.path.join(
        outdir, "c1-np_1-tr-evalall"))
    assert s3["SNP"] == (1.0, 1.0)
    # ROC sweep has a point per distinct QUAL, recall/precision parse
    pts = plot_results.read_roc_points(
        os.path.join(outdir, "c1-np_all-tr-evalall"), "SNP")
    assert len(pts) == 2 and (0.75, 0.75) in pts

    # outputs feed the P/R plotter end to end
    png = os.path.join(wd, "pr.png")
    rc = plot_results.main(plot_results.argparser().parse_args(
        [png] + prefixes))
    assert rc == 0 and os.path.getsize(png) > 0
