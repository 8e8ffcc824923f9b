"""Scaled-down graph soak in CI: build/denoise/merge/serialize a
synthetic multi-chromosome graph through the native engine and check
determinism + memory (full 1e6-scale run: benchmarks/soak_graph.py;
reference scale claim: methods.tex:113 <2 GB whole-genome graph)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graph_soak_small():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "soak_graph.py"),
         "--loci", "60000", "--chroms", "6"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["build_deterministic"]
    assert rec["serialize_roundtrip"]
    assert rec["rss_under_2gb"]
    assert rec["nodes"] > 50000
