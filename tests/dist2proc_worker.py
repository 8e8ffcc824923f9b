"""Worker for the genuinely-concurrent 2-process jax.distributed test
(test_distributed.py::test_two_concurrent_coordinated_processes).

Each process: joins the jax.distributed runtime over a localhost
coordinator on the CPU backend, proves cross-process collectives work
(pmap psum over the 2-process global device set), then drives its
host-sharded share of phase 1 (graph build) and phase 2 (edge-bin
candidate generation/scoring) against shared directories — running
CONCURRENTLY with its peer, synchronized only by jax.distributed and
the file-sentinel barriers (reference semantics being replaced: the
pyflow task DAG, mantaWorkflow.py:832-849).
"""

import json
import os
import sys


def main():
    host_id = int(sys.argv[1])
    port = sys.argv[2]
    work = sys.argv[3]
    fasta, normal_bam, tumor_bam, stats_path = sys.argv[4:8]

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    os.environ.pop("XLA_FLAGS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import manta_tpu.parallel.distributed as dist

    dist.init_runtime(coordinator_address=f"127.0.0.1:{port}",
                      num_processes=2, process_id=host_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() >= 2  # global devices span both processes

    # cross-process collective: psum over the global pmap axis
    import jax.numpy as jnp
    import numpy as np
    n_local = jax.local_device_count()
    vals = jnp.full((n_local,), float(host_id + 1))
    total = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(vals)
    got = float(np.asarray(total)[0])
    # sum over ALL global devices: proc0 contributes n_local*1, proc1
    # n_local*2 (equal local device counts)
    want = float(n_local * 1 + n_local * 2)
    assert got == want, (got, want)
    with open(os.path.join(work, f"psum.host{host_id}.json"), "w") as f:
        json.dump({"psum": got, "processes": jax.process_count(),
                   "global_devices": jax.device_count()}, f)

    bams = [normal_bam, tumor_bam]
    is_tumor = [False, True]

    # --- phase 1, host-sharded, concurrent
    p1 = os.path.join(work, "phase1")
    dist.run_host_phase1(host_id, 2, p1, bams, is_tumor, fasta, stats_path)
    dist.barrier(p1, "phase1", host_id, 2, timeout_s=600)
    if host_id == 0:
        groups = dist.plan_phase1(bams, fasta)
        merged = dist.finalize_phase1(p1, len(groups))
        merged.save(os.path.join(work, "merged_graph.npz"))

    # --- phase 2 against the pre-bootstrapped shared run, concurrent
    shared_run = os.path.join(work, "shared_run")
    kw = dict(is_exome=True, verbose=False)
    dist.run_host_phase2(host_id, 2, [normal_bam], [tumor_bam], fasta,
                         shared_run, **kw)
    dist.barrier(shared_run, "phase2", host_id, 2, timeout_s=600)
    if host_id == 0:
        dist.finalize_phase2(2, [normal_bam], [tumor_bam], fasta,
                             shared_run, **kw)
    print(f"worker {host_id} done")


if __name__ == "__main__":
    main()
