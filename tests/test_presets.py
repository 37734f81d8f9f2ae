"""Every shipped preset must load through the strict config system (unused
keys are fatal, reference: AbstractSlam.h:77-82) and set what it claims."""

import glob
import os

import pytest

from libcml_tpu.cli import SlamConfig
from libcml_tpu.runtime.config import load_yaml_config

PRESET_DIR = os.path.join(os.path.dirname(__file__), "..", "presets")
PRESETS = sorted(glob.glob(os.path.join(PRESET_DIR, "*.yaml")))


def test_presets_exist():
    names = {os.path.basename(p) for p in PRESETS}
    assert {"modslam.yaml", "dso800.yaml", "dso2000.yaml",
            "orb1000.yaml", "orb2000.yaml"} <= names


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads(path):
    cfg = load_yaml_config(SlamConfig(), path)
    assert cfg.direct.max_frames >= 2
    assert cfg.slam in ("hybrid", "direct")


def test_dso_presets_force_direct():
    cfg = load_yaml_config(SlamConfig(),
                           os.path.join(PRESET_DIR, "dso2000.yaml"))
    assert cfg.decision.force == "DIRECT"
    assert cfg.decision.ba_force == "DIRECT"
    assert cfg.direct.max_points == 2048
    assert not cfg.direct.mixed_ba


def test_orb_presets_force_indirect():
    cfg = load_yaml_config(SlamConfig(),
                           os.path.join(PRESET_DIR, "orb2000.yaml"))
    assert cfg.decision.force == "INDIRECT"
    assert cfg.orb_budget == 2000
