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
                 is_exome=True, verbose=False)
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
