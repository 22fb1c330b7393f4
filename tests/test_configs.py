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


def test_flag_audit_vs_reference():
    """Every flag in the reference opts.py (reference opts.py:7-290) exists
    on our parser — 188/188 including the --no_aux_loss store_false alias."""
    import os
    import re
    ref = "/root/reference/opts.py"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    src = open(ref).read()
    ref_flags = set(re.findall(r"add_argument\(\s*'--([A-Za-z0-9_]+)'", src))
    assert len(ref_flags) >= 180
    from gvl_tpu.cli import build_parser
    ours = set()
    for action in build_parser()._actions:
        for opt in action.option_strings:
            if opt.startswith("--"):
                ours.add(opt[2:])
    missing = ref_flags - ours
    assert not missing, f"reference flags missing from CLI: {sorted(missing)}"


def test_no_aux_loss_alias():
    cfg = parse_opts(["--no_aux_loss"])
    assert cfg.aux_loss is False
    assert parse_opts([]).aux_loss is True
