"""Checkpoint import tool: reference .pth -> orbax ckpt -> eval.py loads it."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference"),
    reason="reference repo not mounted")


def test_pth_to_orbax_roundtrip(tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    from reference_shim import install_reference_shims, reference_opt
    install_reference_shims()
    import torch
    from pdvc.pdvc import build as ref_build

    torch.manual_seed(0)
    ref_model, *_ = ref_build(reference_opt())
    pth = tmp_path / "ref.pth"
    torch.save({"model": ref_model.state_dict(), "epoch": 5}, str(pth))

    # matching config (see tests/test_reference_parity.py fixture)
    cfg_yml = tmp_path / "cfg.yml"
    cfg_yml.write_text(json.dumps(dict(
        id="imported", hidden_dim=512, nheads=8, enc_layers=2, dec_layers=2,
        transformer_ff_dim=64, num_feature_levels=3, num_queries=8,
        feature_dim=16, frame_embedding_num=24, vocab_size=50,
        input_encoding_size=32, rnn_size=512, att_hid_size=16,
        max_caption_len=8, cap_nheads=1, cap_num_feature_levels=3,
        cap_dec_n_points=4, with_box_refine=1, enable_contrastive=False,
        caption_decoder_type="standard", max_eseq_length=6,
        transformer_dropout_prob=0.0, drop_prob=0.0, msda_impl="ref")))

    out_dir = tmp_path / "imported_run"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, "tools/import_checkpoint.py", "--pth", str(pth),
         "--cfg_path", str(cfg_yml), "--out", str(out_dir)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
        timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "WARNING" not in res.stdout, res.stdout
    assert os.path.exists(out_dir / "model-best.ckpt")
    assert os.path.exists(out_dir / "opts.json")
