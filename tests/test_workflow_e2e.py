"""End-to-end demo workflow: bit-identical somatic VCF vs the bundled
expected results (reference: src/demo/runMantaWorkflowDemo.py oracle)."""

import gzip

import pytest

from manta_tpu.workflow.run import run_workflow

EXPECTED = ("/root/reference/src/demo/expectedResults/somaticSV.vcf.gz")


@pytest.fixture(scope="module")
def demo_run(tmp_path_factory, demo_fasta, normal_bam, tumor_bam):
    run_dir = str(tmp_path_factory.mktemp("demo_run"))
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, generate_evidence_bam=True, verbose=False)
    return run_dir


def _records(path):
    with gzip.open(path, "rt") as f:
        return [l for l in f if not l.startswith("#")]


def test_somatic_vcf_matches_oracle(demo_run):
    got = _records(f"{demo_run}/results/variants/somaticSV.vcf.gz")
    want = _records(EXPECTED)
    assert got == want


def test_outputs_exist(demo_run):
    import os
    for name in ("candidateSV.vcf.gz", "candidateSmallIndels.vcf.gz",
                 "diploidSV.vcf.gz", "somaticSV.vcf.gz"):
        assert os.path.exists(f"{demo_run}/results/variants/{name}")
        assert os.path.exists(f"{demo_run}/results/variants/{name}.tbi")
    for name in ("alignmentStatsSummary.txt", "svLocusGraphStats.tsv",
                 "svCandidateGenerationStats.tsv"):
        assert os.path.exists(f"{demo_run}/results/stats/{name}")


def test_parallel_matches_serial(tmp_path_factory, demo_fasta, normal_bam,
                                 tumor_bam, demo_run):
    """Fork-parallel phase execution must be bit-identical to serial.

    Runs in a subprocess so the fork-based workers never fork a
    JAX-initialized (multithreaded) test process."""
    import subprocess
    import sys
    run_dir = str(tmp_path_factory.mktemp("par_run"))
    subprocess.run(
        [sys.executable, "-m", "manta_tpu.workflow.run",
         "--normal-bam", normal_bam, "--tumor-bam", tumor_bam,
         "--reference", demo_fasta, "--run-dir", run_dir,
         "--exome", "-j", "2", "--generate-evidence-bam"],
        check=True, capture_output=True)
    for name in ("candidateSV.vcf.gz", "somaticSV.vcf.gz",
                 "diploidSV.vcf.gz"):
        got = _records(f"{run_dir}/results/variants/{name}")
        want = _records(f"{demo_run}/results/variants/{name}")
        assert got == want, name
    # evidence BAM record content must also be identical across modes
    import glob
    import os

    import numpy as np

    from manta_tpu.io.bam import BamReader
    ser = sorted(glob.glob(f"{demo_run}/results/evidence/evidence_*.bam"))
    par = sorted(glob.glob(f"{run_dir}/results/evidence/evidence_*.bam"))
    assert [os.path.basename(p) for p in ser] == \
        [os.path.basename(p) for p in par] and len(ser) == 2
    for s, p in zip(ser, par):
        a, b = BamReader(s).read_all(), BamReader(p).read_all()
        assert a.n == b.n
        for k in vars(a):
            va = getattr(a, k)
            if isinstance(va, np.ndarray):
                assert np.array_equal(va, getattr(b, k)), (s, k)


def test_rna_mode_smoke(tmp_path_factory, demo_fasta, tumor_bam):
    """RNA fusion mode end-to-end on the demo data (DNA reads, but the
    full splice-aware path executes)."""
    run_dir = str(tmp_path_factory.mktemp("rna_run"))
    run_workflow([tumor_bam], [], demo_fasta, run_dir, is_rna=True,
                 verbose=False)
    recs = _records(f"{run_dir}/results/variants/rnaSV.vcf.gz")
    assert len(recs) >= 4
    assert any("RNA_CONTIG=" in r for r in recs)
    assert any("RNA_FIRST" in r for r in recs)
