"""User utilities: convertInversion, denovo scoring, graph CLI."""

import io
import subprocess
import sys

from manta_tpu.tools.convert_inversion import convert_inversions
from manta_tpu.tools.denovo_scoring import check_genotype, process_vcf


def test_convert_inversion_inv3_pair(demo_fasta):
    # self-contained same-chromosome INV3 BND pair
    hdr = ("##fileformat=VCFv4.1\n"
           "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"x\">\n"
           "##ALT=<ID=DEL,Description=\"Deletion\">\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    b1 = ("11\t1000\tMantaBND:0:1:2:0:0:0:0\tT\tT]11:2000]\t30\tPASS\t"
          "SVTYPE=BND;MATEID=MantaBND:0:1:2:0:0:0:1;CIPOS=0,2;HOMLEN=2;"
          "HOMSEQ=AT;BND_DEPTH=5\tGT\t0/1\n")
    b2 = ("11\t2000\tMantaBND:0:1:2:0:0:0:1\tA\tA]11:1000]\t30\tPASS\t"
          "SVTYPE=BND;MATEID=MantaBND:0:1:2:0:0:0:0;CIPOS=0,2;HOMLEN=2;"
          "HOMSEQ=GC;BND_DEPTH=5\tGT\t0/1\n")
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        vcf = os.path.join(d, "t.vcf")
        with open(vcf, "w") as f:
            f.write(hdr + b1 + b2)
        out = io.StringIO()
        convert_inversions(demo_fasta, vcf, out=out)
    lines = out.getvalue().splitlines()
    recs = [l for l in lines if not l.startswith("#")]
    assert len(recs) == 1
    w = recs[0].split("\t")
    assert w[2] == "MantaINV:0:1:2:0:0:0"
    assert w[4] == "<INV>"
    assert "END=2000" in w[7] and "SVTYPE=INV" in w[7]
    assert "SVLEN=1000" in w[7] and "INV3" in w[7]
    assert "CIEND=-2,0" in w[7]
    assert "MATEID" not in w[7] and "BND_DEPTH" not in w[7]
    # INV3/INV5 header lines added before ##ALT / after ##FORMAT
    assert any(l.startswith("##INFO=<ID=INV3") for l in lines)
    assert any(l.startswith("##ALT=<ID=INV") for l in lines)


def test_check_genotype():
    assert check_genotype("0/1", "0/0", "1/1")
    assert check_genotype("0/1", "0/1", "0/0")
    assert not check_genotype("1/1", "0/0", "0/0")
    assert not check_genotype("0/1", "0/0", "0/0")


def test_denovo_scoring(tmp_path):
    hdr = ("##fileformat=VCFv4.1\n"
           "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"x\">\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
           "KID\tDAD\tMOM\n")
    ok = "1\t100\tV1\tT\t<DEL>\t30\tPASS\tSVTYPE=DEL\tGT\t0/1\t0/1\t0/0\n"
    dn = "1\t200\tV2\tT\t<DEL>\t30\tPASS\tSVTYPE=DEL\tGT\t0/1\t0/0\t0/0\n"
    vcf = tmp_path / "trio.vcf"
    vcf.write_text(hdr + ok + dn)
    out_path, stats_path = process_vcf(str(vcf), "KID", "DAD", "MOM")
    recs = [l for l in open(out_path) if not l.startswith("#")]
    assert recs[0].split("\t")[9] == "0/1:0"
    assert recs[0].rstrip("\n").split("\t")[10] == "0/1:."
    assert recs[1].split("\t")[9] == "0/1:60"
    stats = open(stats_path).read()
    assert "# of passed SVs: 1" in stats
    assert "0/1-0/0-0/0\t1" in stats


def test_svloci_cli_roundtrip(tmp_path, demo_fasta, tumor_bam, normal_bam):
    # reuse any existing demo graph if present; otherwise skip cheaply
    import os
    graph = "/tmp/demo_run/workspace/svLocusGraph.npz"
    if not os.path.exists(graph):
        import pytest
        pytest.skip("demo graph not available")
    r = subprocess.run(
        [sys.executable, "-m", "manta_tpu.tools.svloci", "check",
         "--graph-file", graph], capture_output=True, text=True)
    assert r.returncode == 0 and "graph OK" in r.stdout
