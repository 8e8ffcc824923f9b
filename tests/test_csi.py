"""CSI index support: parser, writer, bai→csi reader fallback, and the
demo pipeline driven end-to-end on CSI-only BAMs (reference:
bam_streamer.cpp:131 accepts .bai or .csi for BAM input; CSI is the
standard samtools output for >512 Mb chromosomes)."""

import gzip
import os

import numpy as np

from manta_tpu.io.bai import (
    BaiIndex, CsiIndex, csi_bin_interval, open_index, reg2bin_csi,
    reg2bins, reg2bins_csi,
)
from manta_tpu.io.bam import BamReader
from manta_tpu.io.bamwriter import BamWriter


def test_csi_binning_matches_bai_geometry():
    """With min_shift=14 depth=5 the CSI bin math IS the BAI bin math."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 1 << 20))
        assert sorted(reg2bins_csi(beg, end, 14, 5)) == sorted(
            reg2bins(beg, end))


def test_reg2bin_csi_containment():
    """reg2bin_csi returns a bin whose interval contains the region,
    and the bin is a member of the overlap set."""
    rng = np.random.default_rng(1)
    for min_shift, depth in ((14, 5), (12, 4), (14, 6)):
        for _ in range(100):
            beg = int(rng.integers(0, 1 << (min_shift + 3 * depth - 1)))
            end = beg + int(rng.integers(1, 1 << 16))
            b = reg2bin_csi(beg, end, min_shift, depth)
            s, e = csi_bin_interval(b, min_shift, depth)
            assert s <= beg and end <= e
            assert b in reg2bins_csi(beg, end, min_shift, depth)


def _rewrite_with_csi(src_path, out_path, min_shift=14, depth=5):
    src = BamReader(src_path)
    batch = src.read_all()
    w = BamWriter(out_path, src.header.text, src.header.ref_names,
                  src.header.ref_lengths, index="csi",
                  csi_min_shift=min_shift, csi_depth=depth)
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()
    return batch


def test_csi_roundtrip_region_queries(tmp_path, tumor_bam):
    """Write the demo tumor reads CSI-indexed (non-default geometry) and
    check region fetches against a full-scan filter."""
    out = str(tmp_path / "csi.bam")
    batch = _rewrite_with_csi(tumor_bam, out, min_shift=12, depth=6)
    assert os.path.exists(out + ".csi")
    assert not os.path.exists(out + ".bai")

    rd = BamReader(out)
    assert isinstance(rd.index, CsiIndex)
    assert rd.index.min_shift == 12 and rd.index.depth == 6

    allr = rd.read_all()
    for tid_name, beg, end in (("8", 107652000, 107655000),
                               ("11", 94974000, 94989000),
                               ("11", 94975000, 94975100)):
        tid = rd.header.name_to_tid[tid_name]
        got = rd.fetch(tid, beg, end)
        want = (allr.refid == tid) & (allr.pos < end) & \
            (allr.end_pos > beg)
        got_keys = sorted((int(got.pos[i]), got.name_str(i))
                          for i in range(got.n))
        want_idx = np.flatnonzero(want)
        want_keys = sorted((int(allr.pos[i]), allr.name_str(i))
                           for i in want_idx)
        assert got_keys == want_keys


def test_csi_bounds_helpers(tmp_path, normal_bam):
    out = str(tmp_path / "b.bam")
    batch = _rewrite_with_csi(normal_bam, out)
    rd = BamReader(out)
    for name in ("8", "11"):
        tid = rd.header.name_to_tid[name]
        on_tid = np.flatnonzero(batch.refid == tid)
        lo = int(batch.pos[on_tid].min())
        hi = int(batch.pos[on_tid].max())
        assert rd.index.first_indexed_pos(tid) <= lo
        assert rd.index.last_indexed_end(tid) > hi


def test_open_index_prefers_bai(tmp_path, tumor_bam):
    """When both indexes exist the reader prefers .bai; with only .csi
    it falls back; with neither it returns None."""
    out = str(tmp_path / "p.bam")
    src = BamReader(tumor_bam)
    batch = src.read_all()
    w = BamWriter(out, src.header.text, src.header.ref_names,
                  src.header.ref_lengths)
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()
    wc = BamWriter(str(tmp_path / "c.bam"), src.header.text,
                   src.header.ref_names, src.header.ref_lengths,
                   index="csi")
    for i in range(batch.n):
        wc.add_record(batch, i)
    wc.close()
    os.replace(str(tmp_path / "c.bam.csi"), out + ".csi")
    assert isinstance(open_index(out), BaiIndex)
    os.remove(out + ".bai")
    assert isinstance(open_index(out), CsiIndex)
    os.remove(out + ".csi")
    assert open_index(out) is None


def test_csi_container_is_bgzf(tmp_path, normal_bam):
    out = str(tmp_path / "z.bam")
    _rewrite_with_csi(normal_bam, out)
    raw = open(out + ".csi", "rb").read()
    assert raw[:2] == b"\x1f\x8b"               # gzip/BGZF container
    assert gzip.decompress(raw)[:4] == b"CSI\x01"


def test_demo_pipeline_on_csi_indexed_bams(tmp_path, demo_fasta,
                                           normal_bam, tumor_bam):
    """The full somatic demo workflow on BAMs carrying ONLY .csi
    indexes must still match the expected-results oracle."""
    from manta_tpu.workflow.run import run_workflow

    nb = str(tmp_path / "normal.bam")
    tb = str(tmp_path / "tumor.bam")
    _rewrite_with_csi(normal_bam, nb)
    _rewrite_with_csi(tumor_bam, tb)
    assert not os.path.exists(nb + ".bai")
    assert not os.path.exists(tb + ".bai")

    run_dir = str(tmp_path / "run")
    run_workflow([nb], [tb], demo_fasta, run_dir,
                 is_exome=True, verbose=False)

    import pathlib
    vexp = (pathlib.Path(__file__).resolve().parent / "data" / "demo"
            / "expectedResults" / "somaticSV.vcf.gz")
    got = gzip.open(
        os.path.join(run_dir, "results", "variants", "somaticSV.vcf.gz"),
        "rt").read()
    want = gzip.open(str(vexp), "rt").read()
    strip = lambda t: [l for l in t.splitlines() if not l.startswith("#")]
    assert strip(got) == strip(want)
