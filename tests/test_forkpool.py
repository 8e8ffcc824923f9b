"""Fork-pool drain helper: receives results without is_alive() races
and raises (instead of hanging) when a worker dies unreported.

The workers here do no JAX work, so forking the JAX-initialized test
process is safe; the RuntimeWarning about it is suppressed."""

import multiprocessing as mp

import pytest

pytestmark = [
    pytest.mark.filterwarnings(
        'ignore:os.fork\\(\\) was called:RuntimeWarning'),
    pytest.mark.filterwarnings(
        'ignore:This process.*is multi-threaded:DeprecationWarning'),
]

from manta_tpu.parallel.forkpool import drain_fork_result


def _ok_worker(queue, i):
    queue.put(i)


def _crash_worker(queue):
    import os
    os._exit(3)  # die without reporting


def test_drain_receives_all_results():
    ctx = mp.get_context("fork")
    queue = ctx.SimpleQueue()
    procs = []
    for i in range(8):
        pr = ctx.Process(target=_ok_worker, args=(queue, i))
        pr.start()
        procs.append(pr)
    got = sorted(drain_fork_result(queue, procs) for _ in range(8))
    assert got == list(range(8))
    for pr in procs:
        pr.join()


def test_drain_raises_on_dead_worker(monkeypatch):
    # shorten the poll so the failure path is fast
    import manta_tpu.parallel.forkpool as fp
    src = fp.drain_fork_result.__code__
    ctx = mp.get_context("fork")
    queue = ctx.SimpleQueue()
    pr = ctx.Process(target=_crash_worker, args=(queue,))
    pr.start()
    pr.join()

    # patch the poll timeout by monkeypatching Connection.poll wait
    orig_poll = type(queue._reader).poll

    def fast_poll(self, timeout=None):
        return orig_poll(self, 0.05)

    monkeypatch.setattr(type(queue._reader), "poll", fast_poll)
    with pytest.raises(RuntimeError, match="exited with code 3"):
        drain_fork_result(queue, [pr])


def test_drain_raises_when_all_workers_exit_without_result(monkeypatch):
    ctx = mp.get_context("fork")
    queue = ctx.SimpleQueue()

    def silent(q):
        pass  # exit 0 without putting

    pr = ctx.Process(target=silent, args=(queue,))
    pr.start()
    pr.join()
    orig_poll = type(queue._reader).poll

    def fast_poll(self, timeout=None):
        return orig_poll(self, 0.05)

    monkeypatch.setattr(type(queue._reader), "poll", fast_poll)
    with pytest.raises(RuntimeError, match="result is missing"):
        drain_fork_result(queue, [pr])


def test_phase2_bin_retry(tmp_path):
    """A phase-2 bin worker that dies without reporting is retried once
    (reference: pyflow per-task retry); persistent state marks the
    first attempt so the retry succeeds, and every bin's artifacts
    exist afterwards."""
    import os

    from manta_tpu.graph.locusgraph import SVLocusSet, SVLocusSetOptions
    from manta_tpu.workflow.run import _run_edges_parallel

    unsorted = tmp_path / "ws"
    unsorted.mkdir()
    marker = tmp_path / "crashed_once"

    locus_set = SVLocusSet(SVLocusSetOptions(observation_weight=3),
                           ["c1"], [1000], 1)
    edges = [(0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0)]

    class _W:
        def __init__(self, path):
            self.stream = open(path, "w")

    def build_components(suffix):
        from manta_tpu.workflow.stats import EdgeStatsTracker
        return {"writers": [_W(str(unsorted / f"candidateSV.vcf{suffix}"))],
                "evidence_writer": None, "tracker": EdgeStatsTracker()}

    def run_edges(comps, bin_edges):
        if bin_edges[0][0] == 2 and not marker.exists():
            marker.write_text("x")
            os._exit(1)  # die without reporting
        comps["writers"][0].stream.write(f"bin{bin_edges[0][0]}\n")
        return [f"log{bin_edges[0][0]}\n"]

    # weights are per-edge lookups into the locus graph; fake loci
    class _FakeLoci(list):
        def __getitem__(self, i):
            class _N:
                edges = {0: 1}
            class _L:
                nodes = [_N()]
            return _L()

    locus_set.loci = _FakeLoci()
    msgs = []
    tracker, log_lines = _run_edges_parallel(
        edges, locus_set, build_components, run_edges,
        ["candidateSV.vcf"], str(unsorted), 2, False, str(tmp_path), [],
        n_bins=4, log=msgs.append)
    assert marker.exists()
    assert any("retrying" in m for m in msgs), msgs
    assert sorted(log_lines) == ["log0\n", "log1\n", "log2\n", "log3\n"]
    assert (unsorted / "candidateSV.vcf").exists()
