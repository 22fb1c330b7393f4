"""Every shipped config parses through the CLI and builds a model."""

import glob

import pytest

from gvl_tpu.cli import parse_opts
from gvl_tpu.models import build_model

CFGS = sorted(glob.glob("cfgs/*.yml"))


@pytest.mark.parametrize("path", CFGS)
def test_config_parses_and_builds(path):
    cfg = parse_opts(["--cfg_path", path])
    assert cfg.id
    model = build_model(cfg, text_hidden_dim=768)
    assert model.arch.num_queries == cfg.num_queries
    assert model.arch.vocab_size == cfg.vocab_size
    # RL configs inherit their base via base_cfg_path
    if "rl" in path:
        assert cfg.caption_loss_type == "rl"
        assert cfg.only_ft_captioner


def test_config_count():
    # all 11 reference dataset x task variants are shipped
    # (reference: ls cfgs/*.yml — incl. tacos_c3d_msvg)
    assert len(CFGS) == 11
    assert "cfgs/tacos_c3d_msvg.yml" in CFGS
