"""BGZF writer + tabix index round-trips (reference parity for the
bgzip/tabix subprocess outputs at src/vcf.py:132-133, 422-424)."""
import gzip
import random
import struct

from npore_tpu.io.bgzf import (BGZF_EOF, BgzfWriter, bgzf_compress,
                               read_tabix, reg2bin, tabix_fetch_lines,
                               write_bgzip_vcf)
from npore_tpu.io.vcf import VcfRecord, VcfReader, make_header, write_vcf


def test_bgzf_blocks_roundtrip(tmp_path):
    p = str(tmp_path / "x.gz")
    rng = random.Random(0)
    payload = bytes(rng.randrange(65) for _ in range(200_000))
    with BgzfWriter(p) as w:
        for i in range(0, len(payload), 999):
            w.write(payload[i:i + 999])
    raw = open(p, "rb").read()
    assert raw.endswith(BGZF_EOF)
    # every block carries the BC extra field with a valid BSIZE
    off = 0
    nblocks = 0
    while off < len(raw):
        assert raw[off:off + 4] == b"\x1f\x8b\x08\x04"
        bsize = struct.unpack_from("<H", raw, off + 16)[0] + 1
        off += bsize
        nblocks += 1
    assert off == len(raw) and nblocks >= 4
    assert gzip.decompress(raw) == payload
    assert gzip.decompress(bgzf_compress(payload)) == payload


def _mkrecs():
    recs = []
    for i in range(400):
        pos = i * 37
        recs.append(VcfRecord(contig="chrA" if i < 300 else "chrB",
                              pos=pos if i < 300 else (i - 300) * 91,
                              id=".", alleles=("ACGT"[i % 4], "T" if i % 4 != 3
                                               else "G"),
                              qual=60, filter="PASS", info=".",
                              fmt="GT", sample="1|1"))
    return recs


def test_write_bgzip_vcf_and_reader(tmp_path):
    p = str(tmp_path / "t.vcf.gz")
    recs = _mkrecs()
    hdr = make_header([("chrA", 20000), ("chrB", 20000)])
    out = write_vcf(p, hdr, recs)
    assert out == p
    back = list(VcfReader(p))
    assert [(r.contig, r.pos, r.alleles) for r in back] == \
        [(r.contig, r.pos, r.alleles) for r in recs]


def test_tabix_index_query(tmp_path):
    p = str(tmp_path / "t.vcf.gz")
    recs = _mkrecs()
    write_bgzip_vcf(p, make_header([("chrA", 20000), ("chrB", 20000)]), recs)
    names, bins, linear = read_tabix(p + ".tbi")
    assert names == ["chrA", "chrB"]
    assert all(len(b) > 0 for b in bins)
    # indexed fetch returns exactly the in-range records
    want = [r for r in recs if r.contig == "chrA" and 1000 <= r.pos < 3000]
    got = list(tabix_fetch_lines(p, "chrA", 1000, 3000))
    assert len(got) == len(want)
    for line, r in zip(got, want):
        f = line.split("\t")
        assert (f[0], int(f[1]) - 1) == (r.contig, r.pos)
    # query past the end returns nothing
    assert list(tabix_fetch_lines(p, "chrB", 15000, 16000)) == []


def test_reg2bin_spec_values():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, 1 << 29) == 0
