"""Interrupted-run resume: completed tasks are skipped on re-execution
(reference: pyflow completed-task records / "Continue workflows which
have partially completed"; docs/userGuide/README.md:631-633)."""

import json
import os

import pytest

from manta_tpu.workflow.run import run_workflow
from manta_tpu.workflow.tasks import TaskTracker


def _mtime(path):
    return os.stat(path).st_mtime_ns


def test_tracker_roundtrip(tmp_path):
    ws = str(tmp_path)
    t = TaskTracker(ws, {"a": 1})
    assert not t.is_done("x")
    art = os.path.join(ws, "artifact.txt")
    open(art, "w").close()
    t.mark_done("x", [art])
    # reload with same signature: still done
    t2 = TaskTracker(ws, {"a": 1})
    assert t2.is_done("x")
    # missing artifact invalidates the record
    os.remove(art)
    assert not TaskTracker(ws, {"a": 1}).is_done("x")
    # changed signature invalidates everything
    open(art, "w").close()
    assert not TaskTracker(ws, {"a": 2}).is_done("x")


def test_tracker_clear_prefix(tmp_path):
    t = TaskTracker(str(tmp_path), {})
    t.mark_done("hygen", [])
    t.mark_done("hygen.bin.0000.abc", [])
    t.mark_done("graph", [])
    t.clear("hygen")
    assert not t.is_done("hygen")
    assert not t.is_done("hygen.bin.0000.abc")
    assert t.is_done("graph")


@pytest.fixture(scope="module")
def resume_run(tmp_path_factory, demo_fasta, normal_bam, tumor_bam):
    run_dir = str(tmp_path_factory.mktemp("resume_run"))
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, verbose=False)
    return run_dir, (normal_bam, tumor_bam, demo_fasta)


def test_rerun_skips_completed_phases(resume_run):
    run_dir, (normal_bam, tumor_bam, demo_fasta) = resume_run
    ws = os.path.join(run_dir, "workspace")
    stats = os.path.join(ws, "alignmentStats.json")
    graph = os.path.join(ws, "svLocusGraph.npz")
    cand = os.path.join(ws, "candidateSV.vcf")
    before = (_mtime(stats), _mtime(graph), _mtime(cand))

    # re-execute the identical run: every phase resumes from its record
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, verbose=False)
    assert (_mtime(stats), _mtime(graph), _mtime(cand)) == before

    with open(os.path.join(ws, "taskState.json")) as f:
        state = json.load(f)
    for name in ("alignmentStats", "graph", "hygen"):
        assert name in state["tasks"]


def test_rerun_after_artifact_loss_rebuilds(resume_run):
    run_dir, (normal_bam, tumor_bam, demo_fasta) = resume_run
    ws = os.path.join(run_dir, "workspace")
    graph = os.path.join(ws, "svLocusGraph.npz")
    stats = os.path.join(ws, "alignmentStats.json")
    stats_before = _mtime(stats)
    os.remove(graph)
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, verbose=False)
    # graph rebuilt, upstream stats still reused
    assert os.path.exists(graph)
    assert _mtime(stats) == stats_before


def test_changed_parameters_invalidate_state(resume_run, tmp_path):
    run_dir, (normal_bam, tumor_bam, demo_fasta) = resume_run
    ws = os.path.join(run_dir, "workspace")
    graph = os.path.join(ws, "svLocusGraph.npz")
    graph_before = _mtime(graph)
    # different calling parameters -> signature change -> full re-run
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, min_candidate_variant_size=10,
                 verbose=False)
    assert _mtime(graph) != graph_before


def test_rescore_reruns_phase2_only(resume_run):
    run_dir, (normal_bam, tumor_bam, demo_fasta) = resume_run
    ws = os.path.join(run_dir, "workspace")
    # restore the original-parameter artifacts state
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, verbose=False)
    graph = os.path.join(ws, "svLocusGraph.npz")
    cand = os.path.join(ws, "candidateSV.vcf")
    graph_before, cand_before = _mtime(graph), _mtime(cand)
    run_workflow([normal_bam], [tumor_bam], demo_fasta, run_dir,
                 is_exome=True, is_rescore=True, verbose=False)
    assert _mtime(graph) == graph_before
    assert _mtime(cand) != cand_before


def test_use_existing_chrom_depths(tmp_path, demo_fasta, tumor_bam):
    """--useExistingChromDepths: depth estimation is skipped and the
    pre-placed workspace/chromDepth.txt is used; missing file errors."""
    import os

    import pytest

    from manta_tpu.workflow.run import run_workflow

    run_dir = str(tmp_path / "run")
    with pytest.raises(FileNotFoundError):
        run_workflow([], [tumor_bam], demo_fasta, run_dir,
                     use_existing_chrom_depths=True, verbose=False)
    os.makedirs(os.path.join(run_dir, "workspace"), exist_ok=True)
    with open(os.path.join(run_dir, "workspace", "chromDepth.txt"),
              "w") as f:
        f.write("8\t30.0\n11\t30.0\n")
    run_workflow([], [tumor_bam], demo_fasta, run_dir,
                 use_existing_chrom_depths=True, verbose=False)
    recs = [l for l in __import__("gzip").open(
        f"{run_dir}/results/variants/tumorSV.vcf.gz", "rt")
        if not l.startswith("#")]
    assert len(recs) >= 4
