"""Model-level Pallas wiring: the trunk with msda_impl='pallas' (interpret
mode on CPU) matches the 'ref' implementation."""

import jax
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from gvl_tpu.models import build_model
from tests.test_model import make_batch, tiny_cfg


def test_trunk_pallas_matches_ref(rng):
    cfg_ref = tiny_cfg(msda_impl="ref")
    cfg_pal = tiny_cfg(msda_impl="pallas")
    model_ref = build_model(cfg_ref, text_hidden_dim=48)
    model_pal = build_model(cfg_pal, text_hidden_dim=48)
    feats, mask, duration = make_batch(rng, cfg_ref)
    params = model_ref.init(jax.random.PRNGKey(0), feats, mask, duration)
    out_ref = model_ref.apply(params, feats, mask, duration)
    with pltpu.force_tpu_interpret_mode():
        out_pal = model_pal.apply(params, feats, mask, duration)
    for k in ["pred_logits", "pred_boxes", "pred_count", "memory"]:
        np.testing.assert_allclose(np.asarray(out_ref[k]),
                                   np.asarray(out_pal[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
