"""Advanced-options ini tier (reference: configManta.py.ini +
configureUtil.py getConfigWithPrimaryIniSection)."""

import json
import os

import pytest

from manta_tpu.workflow.config import load_ini, main as config_main
from manta_tpu.workflow.run import ADVANCED_DEFAULTS, run_workflow


def test_defaults_ini_matches_advanced_defaults():
    advanced, top = load_ini(None)
    assert advanced == ADVANCED_DEFAULTS
    assert top == {"min_candidate_variant_size": 8,
                   "min_edge_observations": 3}


def test_user_ini_overrides(tmp_path):
    ini = tmp_path / "user.ini"
    ini.write_text("[manta]\nminPassSomaticScore = 40\n"
                   "useOverlapPairEvidence = 1\n"
                   "minEdgeObservations = 5\n")
    advanced, top = load_ini(str(ini))
    assert advanced["min_pass_somatic_score"] == 40
    assert advanced["use_overlap_pair_evidence"] is True
    assert advanced["min_somatic_score"] == 10  # untouched default
    assert top["min_edge_observations"] == 5


def test_unknown_ini_key_rejected(tmp_path):
    ini = tmp_path / "user.ini"
    ini.write_text("[manta]\nnotARealOption = 1\n")
    with pytest.raises(ValueError, match="(?i)notarealoption"):
        load_ini(str(ini))


def test_run_workflow_rejects_unknown_advanced(tmp_path):
    with pytest.raises(ValueError, match="unknown advanced"):
        run_workflow([], ["/nonexistent.bam"], "/nonexistent.fa",
                     str(tmp_path / "rd"), advanced={"bogus": 1})


def test_config_cli_records_advanced(tmp_path, demo_fasta, normal_bam):
    ini = tmp_path / "user.ini"
    ini.write_text("[manta]\nminSomaticScore = 15\n"
                   "graphNodeMaxEdgeCount = 0\n")
    run_dir = str(tmp_path / "run")
    rc = config_main(["--bam", normal_bam, "--referenceFasta", demo_fasta,
                      "--runDir", run_dir, "--config", str(ini)])
    assert rc == 0
    with open(os.path.join(run_dir, "runWorkflow.config.json")) as f:
        config = json.load(f)
    assert config["advanced"]["min_somatic_score"] == 15
    assert config["advanced"]["graph_node_max_edge_count"] == 0
    assert config["min_candidate_variant_size"] == 8
    assert os.access(os.path.join(run_dir, "runWorkflow.py"), os.X_OK)
