"""Pretrained GPT-2 import parity (VERDICT r2 item 6): a torch
GPT2LMHeadModel state_dict maps onto GPT2Captioner/MiniGPT2 and reproduces
the reference ClipCap head's logits, loss, and greedy samples bit-for-bit
(tiny random GPT-2 — the mapping is architecture-level, so real gpt2 weights
load the same way on a networked host)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference"),
    reason="reference repo not mounted (parity oracle unavailable)")

from gvl_tpu.models.gpt_captioner import GPT2Captioner, GPT2Spec
from gvl_tpu.train.checkpoint import import_hf_gpt2_state_dict

E, NL, NH, V, PFX_LEN, PFX_SIZE = 48, 2, 4, 211, 5, 16


@pytest.fixture(scope="module")
def world():
    from reference_shim import install_reference_shims
    install_reference_shims()
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel
    import pdvc.CaptioningHead.GPT as refgpt

    torch.manual_seed(0)
    gcfg = GPT2Config(vocab_size=V, n_embd=E, n_layer=NL, n_head=NH,
                      n_positions=64)
    tiny_gpt = GPT2LMHeadModel(gcfg).eval()

    class StubTok:
        pad_token = None

        def encode(self, s):
            return [13]

        def decode(self, ids):
            return "x"

    # build the reference ClipCap head around the tiny GPT-2 (no downloads)
    orig_gpt_load = refgpt.GPT2LMHeadModel.from_pretrained
    orig_tok_load = refgpt.AutoTokenizer.from_pretrained
    refgpt.GPT2LMHeadModel.from_pretrained = staticmethod(
        lambda *a, **k: tiny_gpt)
    refgpt.AutoTokenizer.from_pretrained = staticmethod(
        lambda *a, **k: StubTok())
    try:
        ref_head = refgpt.ClipCaptionModel(
            prefix_length=PFX_LEN, clip_length=PFX_LEN,
            prefix_size=PFX_SIZE, mapping_type=refgpt.MappingType.MLP)
    finally:
        refgpt.GPT2LMHeadModel.from_pretrained = orig_gpt_load
        refgpt.AutoTokenizer.from_pretrained = orig_tok_load
    ref_head.eval()

    spec = GPT2Spec(vocab_size=V, n_embd=E, n_layer=NL, n_head=NH,
                    prefix_length=PFX_LEN, prefix_size=PFX_SIZE,
                    mapping_type="mlp", stop_token_id=13, n_positions=64)
    head = GPT2Captioner(spec)
    rng = np.random.RandomState(0)
    prefix = rng.randn(3, PFX_SIZE).astype(np.float32)
    tokens = rng.randint(1, V, (3, 7)).astype(np.int32)
    params = head.init(jax.random.PRNGKey(0), jnp.asarray(prefix),
                       jnp.asarray(tokens),
                       jnp.ones_like(tokens, jnp.float32))

    sd = {k: v.numpy() for k, v in ref_head.state_dict().items()
          if not k.startswith("gpt.lm_head")}
    sd = {(k[4:] if k.startswith("gpt.") else k): v for k, v in sd.items()}
    params2, unused, unfilled = import_hf_gpt2_state_dict(sd, params, NH)
    return (ref_head, head, params2, prefix, tokens, unused, unfilled)


def test_gpt2_import_covers_everything(world):
    *_, unused, unfilled = world
    assert unused == [], f"unused torch keys: {unused}"
    assert unfilled == [], f"unfilled flax keys: {unfilled}"


def test_gpt2_loss_and_logits_parity(world):
    ref_head, head, params, prefix, tokens, *_ = world
    import torch

    mask = np.ones_like(tokens, np.float32)
    loss, logits = head.apply(params, jnp.asarray(prefix),
                              jnp.asarray(tokens), jnp.asarray(mask))

    with torch.no_grad():
        t_tokens = torch.as_tensor(tokens.astype(np.int64))
        t_mask = torch.cat([torch.ones(3, PFX_LEN),
                            torch.as_tensor(mask)], dim=1)
        out = ref_head._forward(t_tokens, torch.as_tensor(prefix), t_mask,
                                labels=True)
        ref_logits = out.logits[:, PFX_LEN - 1:-1]
        ref_lp = torch.log_softmax(ref_logits, -1)
        ref_nll = -ref_lp.gather(-1, t_tokens[..., None])[..., 0].mean(-1)

    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(loss), ref_nll.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_gpt2_greedy_sample_parity(world):
    ref_head, head, params, prefix, tokens, *_ = world
    import torch

    toks, probs, mask = head.apply(params, jnp.asarray(prefix),
                                   entry_length=6, method=head.sample)
    with torch.no_grad():
        _, ref_probs, ref_mask = ref_head.sample(
            torch.as_tensor(prefix), entry_length=6)
    L = ref_probs.shape[1]               # reference stops early when all end
    np.testing.assert_allclose(np.asarray(probs)[:, :L], ref_probs.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(mask)[:, :L],
                                  ref_mask.numpy().astype(bool))
