"""Shared emitter for the mock Clair3 scripts: writes $MOCK_CLAIR3_VCF
(plain or bgzf VCF) to the requested output path as .vcf.gz + .tbi."""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
import _mock_common  # noqa: E402,F401


def emit(out_path):
    src = os.environ["MOCK_CLAIR3_VCF"]
    from npore_tpu.io.vcf import VcfReader, write_vcf
    v = VcfReader(src)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    write_vcf(out_path, v.header_lines, list(v))


if __name__ == "__main__":
    emit(sys.argv[1])
