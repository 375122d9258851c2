"""standardize_vcf end-to-end on the reference's crafted fixture
(reference: test/test_std_vcf.sh; no golden output is checked in upstream,
so the assertions pin our own cross-engine-verified output)."""
import os

from npore_tpu.cli.standardize_vcf import main
from npore_tpu.io.vcf import VcfReader


def test_standardize_vcf_e2e(tmp_path, data_dir, stats_dir):
    pre = str(tmp_path / "std")
    rc = main(["--vcf", os.path.join(data_dir, "test_std_vcf.vcf"),
               "--ref", os.path.join(data_dir, "test_std_ref.fasta"),
               "--out_prefix", pre, "--stats_dir", stats_dir,
               "--engine", "golden"])
    assert rc == 0
    assert os.path.exists(pre + ".vcf.gz.tbi")
    recs = list(VcfReader(pre + ".vcf.gz"))
    assert len(recs) >= 4
    keyed = {(r.contig, r.pos + 1, r.alleles): r.sample for r in recs}
    # hom SNP on chr19 is preserved as 1|1
    assert keyed.get(("chr19", 15, ("C", "G"))) == "1|1"
    # the chr18 insertion is re-placed inside the CCCTA context (left-shift)
    chr18 = [r for r in recs if r.contig == "chr18"]
    assert any(len(r.alleles[1]) > len(r.alleles[0]) for r in chr18)
    # every output record carries a phased GT
    assert all(r.sample in ("1|0", "0|1", "1|1") for r in recs)
