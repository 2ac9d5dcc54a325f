"""Every shipped config loads, canonicalizes, and builds its model."""

import glob
import os

import pytest

from tripled_tpu.config import ExperimentConfig, load_config
from tripled_tpu.models.registry import build_model, canonicalize

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(
    p for p in glob.glob(os.path.join(CONFIG_DIR, "*.py"))
    if not os.path.basename(p).startswith("_")
)


def test_configs_exist():
    assert len(CONFIGS) >= 18  # parity with the reference's config/ dir


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads_and_builds(path):
    cfg = load_config(path)
    assert isinstance(cfg, ExperimentConfig)
    mc = canonicalize(cfg.model)
    model = build_model(cfg.model)
    assert model is not None
    assert mc.height % 32 == 0 and mc.width % 32 == 0
