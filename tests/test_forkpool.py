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
