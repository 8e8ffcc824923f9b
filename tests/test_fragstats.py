"""Phase-0 stats tests: SizeDistribution semantics + demo-BAM estimation."""

import numpy as np
import pytest

from manta_tpu.core.fragstats import (
    ReadGroupStatsSet, extract_read_group_stats, simplified_frag_size,
)
from manta_tpu.core.sizedist import SizeDistribution


def test_sizedist_quantile_cdf():
    sd = SizeDistribution()
    for s in range(100, 200):
        sd.add_observation(s, 10)
    assert sd.total_observations == 1000
    # median of uniform[100,199]
    q50 = sd.quantile(0.5)
    assert 148 <= q50 <= 151
    assert sd.quantile(0.0) == 100
    assert sd.quantile(1.0) == 199
    assert abs(sd.cdf(199) - 1.0) < 1e-6
    assert abs(sd.cdf(149) - 0.5) < 0.01
    assert sd.cdf(99) == 0.0


def test_sizedist_pdf_smoothing():
    sd = SizeDistribution()
    sd.add_observation(100, 10)
    sd.add_observation(102, 10)
    sd.add_observation(104, 10)
    # pdf at 102 takes the 3 bins (only 3 available), span 100..104
    p = sd.pdf(102)
    assert abs(p - 30 / (30 * 5)) < 1e-6


def test_sizedist_filter_quantile():
    sd = SizeDistribution()
    for s in range(100, 200):
        sd.add_observation(s, 100)
    sd.add_observation(100000, 1)  # outlier: 1/10001 < 0.0005 tail
    sd.filter_observations_over_quantile(0.9995)
    assert sd.total_observations == 10000
    assert sd.quantile(1.0) == 199


def test_sizedist_roundtrip():
    sd = SizeDistribution()
    sd.add_observations(np.array([300, 300, 310, 320]))
    sd2 = SizeDistribution.from_dict(sd.to_dict())
    assert sd2.total_observations == 4
    assert sd2.quantile(0.5) == sd.quantile(0.5)


def test_simplified_frag_size():
    assert simplified_frag_size(999) == 999
    assert simplified_frag_size(1000) == 1000
    assert simplified_frag_size(1001) == 1000
    assert simplified_frag_size(12345) == 12300
    assert simplified_frag_size(123456) == 123000


@pytest.mark.parametrize("which", ["normal", "tumor"])
def test_demo_stats(which, normal_bam, tumor_bam):
    path = normal_bam if which == "normal" else tumor_bam
    stats = extract_read_group_stats(path)
    fs = stats.frag_stats
    # HCC1954 libraries: median fragment size should be in a plausible
    # short-insert range
    med = fs.quantile(0.5)
    assert 100 < med < 1000, med
    assert fs.total_observations >= 100
    q01, q99 = fs.quantile(0.01), fs.quantile(0.99)
    assert q01 < med < q99
    # roundtrip through the stats-set file
    ss = ReadGroupStatsSet()
    ss.set_stats(path, stats)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "stats.json")
        ss.save(p)
        ss2 = ReadGroupStatsSet.load(p)
        assert ss2.get_stats(path).frag_stats.quantile(0.5) == med
        assert ss2.get_stats(path).counter.total == stats.counter.total


def test_default_stats_fallback(tmp_path, tumor_bam):
    """--existingAlignStatsFile semantics: when a sample has too few
    high-confidence pairs, the provided stats substitute wholesale
    (reference: ReadGroupStatsUtil.cpp:429-450)."""
    from manta_tpu.core.fragstats import (
        ReadGroupStatsSet, extract_read_group_stats,
    )
    from manta_tpu.io.bam import BamReader
    from manta_tpu.io.bamwriter import BamWriter

    # full-sample stats act as the default file
    full = extract_read_group_stats(tumor_bam)
    ss = ReadGroupStatsSet()
    ss.set_stats("default", full)
    default_path = str(tmp_path / "default_stats.json")
    ss.save(default_path)

    # a BAM with only a handful of pairs cannot converge
    src = BamReader(tumor_bam)
    tid = src.header.name_to_tid["8"]
    batch = src.fetch(tid, 107652000, 107652300)
    tiny = str(tmp_path / "tiny.bam")
    w = BamWriter(tiny, src.header.text, src.header.ref_names,
                  src.header.ref_lengths)
    for i in range(min(40, batch.n)):
        w.add_record(batch, i)
    w.close()

    import pytest
    with pytest.raises(RuntimeError):
        extract_read_group_stats(tiny)
    sub = extract_read_group_stats(tiny, default_stats=default_path)
    assert sub.frag_stats.total_observations == \
        full.frag_stats.total_observations
    assert sub.counter.total == full.counter.total


def test_two_read_group_stats(tmp_path):
    """Per-(file, RG) estimation: a BAM mixing two libraries with
    distinct insert sizes yields one converged distribution per read
    group, keyed (path, RG) in the stats set, with the file's first
    group as its representative (reference: ReadGroupLabel.hpp:38,
    ReadGroupStatsUtil.cpp:751-946)."""
    from batchutil import encode_tag, make_batch
    from manta_tpu.core.fragstats import extract_read_group_stats_set
    from manta_tpu.io.bamwriter import BamWriter

    rlen = 100
    reads = []
    rng = np.random.default_rng(7)
    for k in range(260):
        # spread pairs out so the read-pair depth filter keeps them
        p = 1000 + k * 700
        for rg, base in (("A", 200), ("B", 400)):
            isize = base + int(rng.integers(-20, 21))
            mpos = p + isize - rlen
            tag = encode_tag(b"RG", "Z", rg)
            common = dict(refid=0, next_refid=0, cigar=f"{rlen}M",
                          seq="A" * rlen, qual=30, tags=tag, mapq=40)
            reads.append(dict(common, pos=p, next_pos=mpos, tlen=isize,
                              flag=0x1 | 0x40 | 0x20,
                              name=f"frag{k}{rg}"))
            reads.append(dict(common, pos=mpos, next_pos=p, tlen=-isize,
                              flag=0x1 | 0x80 | 0x10,
                              name=f"frag{k}{rg}"))
    reads.sort(key=lambda r: r["pos"])
    batch = make_batch(reads)
    path = str(tmp_path / "two_rg.bam")
    header = ("@HD\tVN:1.6\tSO:coordinate\n"
              "@SQ\tSN:chrT\tLN:1000000\n"
              "@RG\tID:A\tSM:S1\n"
              "@RG\tID:B\tSM:S1\n")
    w = BamWriter(path, header, ["chrT"], [1000000])
    for i in range(batch.n):
        w.add_record(batch, i)
    w.close()

    per_rg = extract_read_group_stats_set(path)
    assert sorted(per_rg) == ["A", "B"]
    med_a = per_rg["A"].frag_stats.quantile(0.5)
    med_b = per_rg["B"].frag_stats.quantile(0.5)
    assert 180 <= med_a <= 220, med_a
    assert 380 <= med_b <= 420, med_b
    assert per_rg["A"].counter.total == per_rg["B"].counter.total

    from manta_tpu.core.fragstats import ReadGroupStatsSet
    ss = ReadGroupStatsSet()
    ss.set_file_stats(path, per_rg)
    # representative = first group; per-group entries retrievable
    assert ss.get_stats(path) is per_rg["A"]
    assert dict(ss.file_groups(path)) == per_rg
    # save/load round-trip preserves the per-RG keying
    p2 = str(tmp_path / "stats.json")
    ss.save(p2)
    ss2 = ReadGroupStatsSet.load(p2)
    assert [rg for rg, _ in ss2.file_groups(path)] == ["A", "B"]
    got_b = ss2.file_groups(path)[1][1]
    assert got_b.frag_stats.quantile(0.5) == med_b


def test_rg_routed_pair_distro():
    """Pair-support likelihoods route each read through its own read
    group's fragment-size distribution when the file has several."""
    from batchutil import encode_tag, make_batch
    from manta_tpu.scoring.pairscore import read_rg_distro

    sd_a = SizeDistribution()
    sd_b = SizeDistribution()
    for s in range(180, 220):
        sd_a.add_observation(s, 10)
    for s in range(380, 420):
        sd_b.add_observation(s, 10)
    batch = make_batch([
        dict(refid=0, pos=100, cigar="50M", seq="A" * 50, qual=30,
             name="x", tags=encode_tag(b"RG", "Z", "B"), mapq=40,
             flag=0x1, next_refid=0, next_pos=300, tlen=250),
    ])
    rg_map = {"A": sd_a, "B": sd_b}
    assert read_rg_distro(rg_map, sd_a, batch, 0) is sd_b
    assert read_rg_distro(None, sd_a, batch, 0) is sd_a
