"""VCF post-processing: sort/dedup, ploidy filter, tabix round-trip."""

import numpy as np

from manta_tpu.format.tabix import TabixReader, reg2bin, write_vcf_gz
from manta_tpu.workflow.postprocess import (
    extract_small_indel_lines, ploidy_filter_lines, sort_vcf_lines,
)

HDR = [
    "##fileformat=VCFv4.1\n",
    "##contig=<ID=chr2,length=1000000>\n",
    "##contig=<ID=chr1,length=1000000>\n",
    "##FILTER=<ID=MinQUAL,Description=\"x\">\n",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n",
]


def _rec(chrom, pos, vid, ref, alt, qual, filt, info, sample="0/1"):
    return (f"{chrom}\t{pos}\t{vid}\t{ref}\t{alt}\t{qual}\t{filt}\t"
            f"{info}\tGT\t{sample}\n")


def test_sort_contig_order_and_dedup():
    r1 = _rec("chr1", 100, "A1", "T", "<DEL>", 30, "PASS", "END=200;SVTYPE=DEL")
    r2 = _rec("chr2", 50, "B1", "G", "<DUP>", 10, "PASS", "END=90;SVTYPE=DUP")
    # duplicate of r1's site, lower qual, not PASS -> dropped
    r3 = _rec("chr1", 100, "A2", "T", "<DEL>", 5, "MinQUAL",
              "END=200;SVTYPE=DEL")
    out = sort_vcf_lines(HDR + [r1, r2, r3])
    recs = [l for l in out if not l.startswith("#")]
    # header contig order puts chr2 first
    assert recs[0].startswith("chr2")
    assert len(recs) == 2
    assert "A1" in recs[1]
    # print_all keeps duplicates
    out_all = sort_vcf_lines(HDR + [r1, r2, r3], print_all=True)
    assert len([l for l in out_all if not l.startswith("#")]) == 3


def test_sort_dedup_removes_bnd_mates():
    b1 = _rec("chr1", 100, "BND1", "T", "T[chr2:500[", 40, "PASS",
              "SVTYPE=BND;MATEID=BND2")
    b1dup = _rec("chr1", 100, "BND3", "T", "T[chr2:500[", 10, "PASS",
                 "SVTYPE=BND;MATEID=BND4")
    m1 = _rec("chr2", 500, "BND2", "A", "]chr1:100]A", 40, "PASS",
              "SVTYPE=BND;MATEID=BND1")
    m2 = _rec("chr2", 500, "BND4", "A", "]chr1:100]A", 10, "PASS",
              "SVTYPE=BND;MATEID=BND3")
    out = sort_vcf_lines(HDR + [b1, b1dup, m1, m2])
    recs = [l for l in out if not l.startswith("#")]
    ids = [l.split("\t")[2] for l in recs]
    # contig order puts chr2 first; the consistent BND pair survives
    assert ids == ["BND2", "BND1"]


def test_ploidy_filter_stacked_dels():
    # two similar-size overlapping PASS DELs, both het: ploidy sum 2 -> keep
    r1 = _rec("chr1", 100, "D1", "T", "<DEL>", 30, "PASS",
              "END=500;SVTYPE=DEL;SVLEN=-400")
    r2 = _rec("chr1", 150, "D2", "T", "<DEL>", 30, "PASS",
              "END=540;SVTYPE=DEL;SVLEN=-390")
    out = ploidy_filter_lines(HDR + [r1, r2])
    recs = [l for l in out if not l.startswith("#")]
    assert all("\tPASS\t" in l for l in recs)
    # hom + het stacked -> sum 3 -> both filtered
    r1h = _rec("chr1", 100, "D1", "T", "<DEL>", 30, "PASS",
               "END=500;SVTYPE=DEL;SVLEN=-400", sample="1/1")
    out = ploidy_filter_lines(HDR + [r1h, r2])
    recs = [l for l in out if not l.startswith("#")]
    assert all("\tPloidy\t" in l for l in recs)
    # Ploidy FILTER header inserted before first ##FILTER
    fi = [i for i, l in enumerate(out) if l.startswith("##FILTER")]
    assert "Ploidy" in out[fi[0]]


def test_extract_small_indels():
    keep = _rec("chr1", 10, "I1", "TAAAG", "T", 0, "PASS", "SVTYPE=DEL")
    sym = _rec("chr1", 20, "I2", "T", "<DEL>", 0, "PASS",
               "END=400;SVTYPE=DEL")
    bnd = _rec("chr1", 30, "I3", "T", "T[chr2:1[", 0, "PASS", "SVTYPE=BND")
    big = _rec("chr1", 40, "I4", "T" * 60, "T", 0, "PASS", "SVTYPE=DEL")
    out = extract_small_indel_lines(HDR + [keep, sym, bnd, big], 49)
    recs = [l for l in out if not l.startswith("#")]
    assert len(recs) == 1 and "I1" in recs[0]


def test_tabix_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    poss = np.sort(rng.integers(1, 500_000, 300))
    recs = [_rec("chr1", int(p), f"V{i}", "T", "<DEL>", 30, "PASS",
                 f"END={int(p) + 100};SVTYPE=DEL")
            for i, p in enumerate(poss)]
    path = str(tmp_path / "t.vcf.gz")
    write_vcf_gz(HDR + recs, path)
    rd = TabixReader(path)
    for beg, end in [(0, 1000), (100_000, 120_000), (499_000, 500_100),
                     (600_000, 700_000)]:
        got = {l.split("\t")[2] for l in rd.fetch("chr1", beg, end)}
        want = {f"V{i}" for i, p in enumerate(poss)
                if p - 1 < end and p + 100 > beg}
        assert got == want, (beg, end)
    assert rd.fetch("chrX", 0, 100) == []


def test_reg2bin_ranges():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(0, (1 << 14) + 1) == 585
    assert reg2bin(1 << 26, (1 << 26) + 1) == 4681 + (1 << 12)
