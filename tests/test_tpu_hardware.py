"""Repeatable hardware oracle: the demo workflow on the REAL TPU chip.

The normal suite forces the CPU backend (conftest.py) because the TPU
tunnel plugin misbehaves under virtual-device flags, so
test_device_scoring_matches_oracle exercises device *routing*, not
hardware. This module makes the on-chip check executable on demand
(VERDICT round-2 item 4): it runs the full tumor/normal demo workflow
with `--device-scoring exact` in a fresh subprocess (no CPU forcing, so
the real TPU backend registers) and asserts the somatic VCF is
bit-identical to the reference's bundled expected results
(reference: src/demo/runMantaWorkflowDemo.py:142-166).

Opt-in (the run costs ~2-4 min, mostly XLA compiles through the
tunnel):

    MANTA_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -v

Skipped by default so CI and the stock suite stay hermetic and fast.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
_VEXP = REPO / "tests" / "data" / "demo" / "expectedResults" / "somaticSV.vcf.gz"
EXPECTED = (str(_VEXP) if _VEXP.exists() else
            "/root/reference/src/demo/expectedResults/somaticSV.vcf.gz")

pytestmark = pytest.mark.skipif(
    os.environ.get("MANTA_TPU_TESTS") != "1",
    reason="TPU hardware test: set MANTA_TPU_TESTS=1 to run on a chip")

_DRIVER = r"""
import json, sys
repo, normal, tumor, fasta, run_dir = sys.argv[1:6]
import jax
plat = jax.devices()[0].platform
if plat not in ("tpu", "axon"):
    print(json.dumps({"skip": "no TPU (platform=%s)" % plat}))
    sys.exit(0)
sys.path.insert(0, repo)
from manta_tpu.workflow.run import run_workflow
run_workflow([normal], [tumor], fasta, run_dir,
             is_exome=True, verbose=False, use_device_scoring="exact")
print(json.dumps({"ok": True, "platform": plat}))
"""


def _records(path):
    import gzip
    with gzip.open(path, "rt") as f:
        return [ln for ln in f if not ln.startswith("#")]


def test_demo_oracle_on_tpu_chip(tmp_path, demo_fasta, normal_bam,
                                 tumor_bam):
    run_dir = str(tmp_path / "tpu_run")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(REPO), normal_bam,
         tumor_bam, demo_fasta, run_dir],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(REPO))
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
        else ""
    assert proc.returncode == 0, \
        f"driver failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    import json
    res = json.loads(tail)
    if "skip" in res:
        pytest.skip(res["skip"])
    got = _records(f"{run_dir}/results/variants/somaticSV.vcf.gz")
    want = _records(EXPECTED)
    assert got == want, "on-chip somatic VCF differs from oracle"
