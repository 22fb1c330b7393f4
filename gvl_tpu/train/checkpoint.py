"""Checkpoint save/restore (orbax) + PyTorch-checkpoint import shim.

Behavioral spec: reference train.py:456-468,535-559 — per-epoch
'model-last', 'model-best' and per-task bests
('model-best-{grounding,dvc,pc,tal}'), optional per-iter snapshots; resume
restores model+optimizer (+text-encoder optimizer) and opt history from
info.json (train.py:158-183, 322-333).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, folder: str):
        self.folder = os.path.abspath(folder)
        os.makedirs(self.folder, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.folder, name + ".ckpt")

    def save(self, name: str, state: Any, epoch: int):
        payload = {"state": jax.device_get(state),
                   "epoch": np.asarray(epoch, np.int32)}
        path = self._path(name)
        if os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._ckpt.save(path, payload)
        self._ckpt.wait_until_finished()

    def restore(self, name: str, template_state: Any) -> Optional[Dict]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        payload = self._ckpt.restore(
            path, {"state": jax.device_get(template_state),
                   "epoch": np.asarray(0, np.int32)})
        return payload

    def restore_raw(self, name: str) -> Optional[Dict]:
        """Template-free restore (nested dict of arrays) — lets eval load
        checkpoints regardless of the training-time optimizer structure."""
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))


_ENCODER_PREFIXES = ("base_encoder", "encoder", "level_embed")


def load_pretrained(params: Dict, path: str, mode: str, cfg) -> Dict:
    """Merge a pretrained run's parameters into a fresh tree.

    mode: 'full' | 'encoder' (only pyramid/deformable encoder + level embed —
    reference filter rule pdvc.py:170-175) | 'decoder' (everything else).
    remove_*_weight flags drop specific heads (reference train.py:96-148).
    `path` is either an orbax .ckpt dir saved by CheckpointManager or a run
    folder containing model-best.ckpt.
    """
    import flax
    import os as _os

    ckpt_path = path
    if not ckpt_path.endswith(".ckpt"):
        for cand in ("model-best.ckpt", "model-last.ckpt"):
            p = _os.path.join(path, cand)
            if _os.path.exists(p):
                ckpt_path = p
                break
    restorer = ocp.StandardCheckpointer()
    # restore with flexible structure: pull raw pytree
    loaded = restorer.restore(_os.path.abspath(ckpt_path))
    src = loaded["state"]["params"]["params"] if "state" in loaded else \
        loaded["params"]["params"]

    flat_dst = flax.traverse_util.flatten_dict(params["params"])
    flat_src = flax.traverse_util.flatten_dict(src)
    removed_prefixes = []
    if getattr(cfg, "remove_class_head_weight", False):
        removed_prefixes.append("class_head")
    if getattr(cfg, "remove_bbox_head_weight", False):
        removed_prefixes.append("bbox_head")
    if getattr(cfg, "remove_caption_head_weight", False) or \
            getattr(cfg, "ft_captioner_from_scratch", False):
        removed_prefixes.append("caption_head")
    if getattr(cfg, "remove_contrastive_projection_weight", False):
        removed_prefixes.append("cl_proj")

    def want(key) -> bool:
        top = key[0]
        if any(top.startswith(p) for p in removed_prefixes):
            return False
        is_enc = any(top.startswith(p) for p in _ENCODER_PREFIXES)
        if mode == "encoder":
            return is_enc
        if mode == "decoder":
            return not is_enc
        return True

    n = 0
    for key, v in flat_src.items():
        if key in flat_dst and want(key) and flat_dst[key].shape == v.shape:
            flat_dst[key] = v
            n += 1
    assert n > 0, "no parameters matched the pretrained checkpoint"
    return {"params": flax.traverse_util.unflatten_dict(flat_dst)}


def import_pytorch_state_dict(sd: Dict, params: Dict, n_heads: int,
                              share_caption_head: bool = True):
    """Map a reference PyTorch state_dict (pdvc.PDVC.state_dict()) onto our
    flax parameter tree. Returns (new_params, unused_torch_keys,
    unfilled_flax_keys).

    Conventions: torch Linear weight (out,in) -> flax Dense kernel (in,out);
    Conv1d (out,in,k) -> (k,in,out); nn.MultiheadAttention in_proj (3C,C) ->
    flax MHA query/key/value kernels (C,H,Dh); LSTM weight_ih_l0 (4H,in) ->
    Dense 'ih' kernel (in,4H). Cloned vs shared heads
    (reference pdvc.py:124-146) land on our per-layer module names.
    """
    import flax

    flat_np = {k: np.asarray(v) for k, v in sd.items()}
    dst = dict(flax.traverse_util.flatten_dict(params["params"], sep="/"))
    used = set()
    filled = set()

    def put(flax_key: str, value: np.ndarray):
        assert flax_key in dst, f"no flax param {flax_key}"
        assert dst[flax_key].shape == value.shape, \
            f"{flax_key}: {dst[flax_key].shape} vs {value.shape}"
        dst[flax_key] = value.astype(np.float32)
        filled.add(flax_key)

    def dense(torch_prefix: str, flax_prefix: str, has_bias: bool = True):
        put(flax_prefix + "/kernel", flat_np[torch_prefix + ".weight"].T)
        used.add(torch_prefix + ".weight")
        if has_bias and torch_prefix + ".bias" in flat_np:
            put(flax_prefix + "/bias", flat_np[torch_prefix + ".bias"])
            used.add(torch_prefix + ".bias")

    def layernorm(torch_prefix: str, flax_prefix: str):
        put(flax_prefix + "/scale", flat_np[torch_prefix + ".weight"])
        put(flax_prefix + "/bias", flat_np[torch_prefix + ".bias"])
        used.update({torch_prefix + ".weight", torch_prefix + ".bias"})

    def msda(torch_prefix: str, flax_prefix: str, with_output: bool = True):
        for sub in ["sampling_offsets", "attention_weights", "value_proj"] + \
                (["output_proj"] if with_output else []):
            dense(f"{torch_prefix}.{sub}", f"{flax_prefix}/{sub}")

    def mha(torch_prefix: str, flax_prefix: str, d_model: int):
        w = flat_np[torch_prefix + ".in_proj_weight"]
        b = flat_np[torch_prefix + ".in_proj_bias"]
        used.update({torch_prefix + ".in_proj_weight",
                     torch_prefix + ".in_proj_bias"})
        dh = d_model // n_heads
        for i, name in enumerate(["query", "key", "value"]):
            wi = w[i * d_model:(i + 1) * d_model]       # (C, C)
            bi = b[i * d_model:(i + 1) * d_model]
            put(f"{flax_prefix}/{name}/kernel",
                wi.T.reshape(d_model, n_heads, dh))
            put(f"{flax_prefix}/{name}/bias", bi.reshape(n_heads, dh))
        wo = flat_np[torch_prefix + ".out_proj.weight"]
        bo = flat_np[torch_prefix + ".out_proj.bias"]
        used.update({torch_prefix + ".out_proj.weight",
                     torch_prefix + ".out_proj.bias"})
        put(f"{flax_prefix}/out/kernel", wo.T.reshape(n_heads, dh, d_model))
        put(f"{flax_prefix}/out/bias", bo)

    def bert_attn(torch_prefix: str, flax_prefix: str, d: int, heads: int):
        """HF BertAttention (separate q/k/v Linears + output.dense) -> flax
        MultiHeadDotProductAttention."""
        dh = d // heads
        for name in ["query", "key", "value"]:
            w = flat_np[f"{torch_prefix}.self.{name}.weight"]
            b = flat_np[f"{torch_prefix}.self.{name}.bias"]
            used.update({f"{torch_prefix}.self.{name}.weight",
                         f"{torch_prefix}.self.{name}.bias"})
            put(f"{flax_prefix}/{name}/kernel", w.T.reshape(d, heads, dh))
            put(f"{flax_prefix}/{name}/bias", b.reshape(heads, dh))
        wo = flat_np[f"{torch_prefix}.output.dense.weight"]
        bo = flat_np[f"{torch_prefix}.output.dense.bias"]
        used.update({f"{torch_prefix}.output.dense.weight",
                     f"{torch_prefix}.output.dense.bias"})
        put(f"{flax_prefix}/out/kernel", wo.T.reshape(heads, dh, d))
        put(f"{flax_prefix}/out/bias", bo)

    # ---- base encoder
    dense("base_encoder.pos_embed.duration_embed_layer",
          "base_encoder/pos_embed/duration_embed")
    lvl = 0
    while f"base_encoder.input_proj.{lvl}.0.weight" in flat_np:
        w = flat_np[f"base_encoder.input_proj.{lvl}.0.weight"]
        put(f"base_encoder/input_proj_{lvl}_conv/kernel",
            np.transpose(w, (2, 1, 0)))
        put(f"base_encoder/input_proj_{lvl}_conv/bias",
            flat_np[f"base_encoder.input_proj.{lvl}.0.bias"])
        put(f"base_encoder/input_proj_{lvl}_norm/scale",
            flat_np[f"base_encoder.input_proj.{lvl}.1.weight"])
        put(f"base_encoder/input_proj_{lvl}_norm/bias",
            flat_np[f"base_encoder.input_proj.{lvl}.1.bias"])
        used.update({f"base_encoder.input_proj.{lvl}.{i}.{p}"
                     for i in (0, 1) for p in ("weight", "bias")})
        lvl += 1

    # ---- transformer
    put("level_embed", flat_np["transformer.level_embed"])
    used.add("transformer.level_embed")
    d_model = flat_np["transformer.level_embed"].shape[1]
    dense("transformer.reference_points", "reference_points")
    if "transformer.pos_trans.weight" in flat_np:
        if "pos_trans/kernel" in dst:
            dense("transformer.pos_trans", "pos_trans")
            layernorm("transformer.pos_trans_norm", "pos_trans_norm")
        else:
            # two-stage machinery unused in query mode; safe to drop
            used.update({"transformer.pos_trans.weight",
                         "transformer.pos_trans.bias",
                         "transformer.pos_trans_norm.weight",
                         "transformer.pos_trans_norm.bias"})

    i = 0
    while f"transformer.encoder.layers.{i}.norm1.weight" in flat_np:
        tp = f"transformer.encoder.layers.{i}"
        fp = f"encoder/layer_{i}"
        msda(f"{tp}.self_attn", f"{fp}/self_attn")
        layernorm(f"{tp}.norm1", f"{fp}/norm1")
        dense(f"{tp}.linear1", f"{fp}/ffn/linear1")
        dense(f"{tp}.linear2", f"{fp}/ffn/linear2")
        layernorm(f"{tp}.norm2", f"{fp}/ffn/norm")
        i += 1

    i = 0
    while f"transformer.decoder.layers.{i}.norm1.weight" in flat_np:
        tp = f"transformer.decoder.layers.{i}"
        fp = f"decoder_layer_{i}"
        msda(f"{tp}.cross_attn", f"{fp}/cross_attn")
        mha(f"{tp}.self_attn", f"{fp}/self_attn", d_model)
        layernorm(f"{tp}.norm1", f"{fp}/norm1")
        layernorm(f"{tp}.norm2", f"{fp}/norm2")
        dense(f"{tp}.linear1", f"{fp}/ffn/linear1")
        dense(f"{tp}.linear2", f"{fp}/ffn/linear2")
        layernorm(f"{tp}.norm3", f"{fp}/ffn/norm")
        i += 1

    # ---- queries + heads
    put("query_embed", flat_np["query_embed.weight"])
    used.add("query_embed.weight")
    i = 0
    while f"class_head.{i}.weight" in flat_np:
        dense(f"class_head.{i}", f"class_head_{i}")
        dense(f"count_head.{i}", f"count_head_{i}")
        for j in range(3):
            dense(f"bbox_head.{i}.layers.{j}", f"bbox_head_{i}/layers_{j}")
        i += 1

    # ---- contrastive projections (when present); with shared weights the
    # reference ModuleList repeats the same tensors under every index — map
    # index 0 and mark the duplicates used
    for tname, fname in [("contrastive_projection_event", "cl_proj_event"),
                         ("contrastive_projection_text", "cl_proj_text")]:
        i = 0
        while f"{tname}.{i}.weight" in flat_np:
            if f"{fname}_{i}/kernel" in dst:
                dense(f"{tname}.{i}", f"{fname}_{i}")
            else:
                assert np.allclose(flat_np[f"{tname}.{i}.weight"],
                                   flat_np[f"{tname}.0.weight"]), \
                    f"{tname}.{i} differs but flax tree has no slot (shared?)"
                used.update({f"{tname}.{i}.weight", f"{tname}.{i}.bias"})
            i += 1
    if "background_embed" in flat_np:
        put("background_embed", flat_np["background_embed"])
        used.add("background_embed")

    # ---- text-side context modules (reference pdvc.py:1092-1163)
    if "word_context_model.w1.weight" in flat_np:
        dense("word_context_model.w1", "word_context/w1")
        dense("word_context_model.w2", "word_context/w2")
    i = 0
    while (f"sentence_context_model.transformer_block.layer.{i}"
           ".attention.self.query.weight") in flat_np:
        tp = f"sentence_context_model.transformer_block.layer.{i}"
        fp = "sentence_context"
        th = flat_np[f"{tp}.attention.self.query.weight"].shape[0]
        from gvl_tpu.models.text import bert_head_count
        t_heads = bert_head_count(th)
        bert_attn(f"{tp}.attention", f"{fp}/self_attn_{i}", th, t_heads)
        layernorm(f"{tp}.attention.output.LayerNorm", f"{fp}/norm1_{i}")
        if f"{tp}.crossattention.self.query.weight" in flat_np:
            bert_attn(f"{tp}.crossattention", f"{fp}/cross_attn_{i}", th,
                      t_heads)
            layernorm(f"{tp}.crossattention.output.LayerNorm",
                      f"{fp}/norm_cross_{i}")
        dense(f"{tp}.intermediate.dense", f"{fp}/ffn1_{i}")
        dense(f"{tp}.output.dense", f"{fp}/ffn2_{i}")
        layernorm(f"{tp}.output.LayerNorm", f"{fp}/norm2_{i}")
        i += 1
    if "sentence_context_model.memory_projection.weight" in flat_np:
        dense("sentence_context_model.memory_projection",
              "sentence_context/memory_projection")
    if "sentence_context_model.pos_table" in flat_np:
        # cosine table is a buffer; we recompute it at trace time
        used.add("sentence_context_model.pos_table")
    if "sentence_context_model.pos_table.weight" in flat_np:
        put("sentence_context/pos_table",
            flat_np["sentence_context_model.pos_table.weight"])
        used.add("sentence_context_model.pos_table.weight")
    # the HF text encoder itself is imported separately into the text bundle
    used.update(k for k in flat_np if k.startswith("text_encoder."))

    # ---- caption heads (LSTM-DSA); shared heads repeat identical tensors
    k = 0
    while f"caption_head.{k}.embed.weight" in flat_np:
        fk = 0 if share_caption_head else k
        tp = f"caption_head.{k}"
        fp = f"caption_head_{fk}"
        if f"{fp}/embed/embedding" in dst:
            put(f"{fp}/embed/embedding", flat_np[f"{tp}.embed.weight"])
            used.add(f"{tp}.embed.weight")
            dense(f"{tp}.logit", f"{fp}/logit")
            put(f"{fp}/cell/ih/kernel",
                flat_np[f"{tp}.core.rnn.weight_ih_l0"].T)
            put(f"{fp}/cell/hh/kernel",
                flat_np[f"{tp}.core.rnn.weight_hh_l0"].T)
            used.update({f"{tp}.core.rnn.weight_ih_l0",
                         f"{tp}.core.rnn.weight_hh_l0"})
            for sub in ["sampling_offsets", "value_proj"]:
                dense(f"{tp}.core.deformable_att.{sub}", f"{fp}/dsa/{sub}")
            # dead params in the reference's MSDeformAttnCap: the raw-samples
            # path neither weights by attention_weights nor applies
            # output_proj (ms_deform_attn_for_caption.py:124-127)
            used.update({f"{tp}.core.deformable_att.{sub}.{p}"
                         for sub in ("output_proj", "attention_weights")
                         for p in ("weight", "bias")})
            for sub in ["ctx2att", "h2att", "alpha_net"]:
                dense(f"{tp}.core.{sub}", f"{fp}/dsa/{sub}")
        else:
            used.update({kk for kk in flat_np if kk.startswith(tp + ".")})
        k += 1

    # aliases: the reference registers the bbox heads twice (the refinement
    # hack at pdvc.py:140 adds them under transformer.decoder.bbox_head)
    used.update(k for k in flat_np
                if k.startswith("transformer.decoder.bbox_head."))

    unused = sorted(set(flat_np) - used)
    unfilled = sorted(set(dst) - filled)
    new_params = {"params": flax.traverse_util.unflatten_dict(dst, sep="/")}
    return new_params, unused, unfilled


def import_hf_gpt2_state_dict(sd: Dict, params: Dict, n_head: int,
                              head_prefix: str = ""):
    """Map an HF torch GPT2LMHeadModel (or GPT2Model) state_dict onto a
    GPT2Captioner parameter tree (models/gpt_captioner.py MiniGPT2), so
    networked runs load real pretrained GPT-2 weights (reference ClipCap
    head builds GPT2LMHeadModel.from_pretrained, GPT.py:233).

    Also maps a reference ClipCap `clip_project` MLP when present in `sd`
    (keys clip_project.model.{0,2}). HF Conv1D stores weights (in, out) —
    already the flax kernel orientation, no transpose.

    head_prefix: path of the captioner inside `params` (e.g.
    'caption_head_0/'), '' when params is the head's own tree.
    Returns (new_params, unused_torch_keys, unfilled_gpt_keys).
    """
    import flax

    sd = {(k[len("transformer."):] if k.startswith("transformer.") else k): v
          for k, v in sd.items()}
    flat_np = {k: np.asarray(v) for k, v in sd.items()}
    dst = dict(flax.traverse_util.flatten_dict(params["params"], sep="/"))
    used, filled = set(), set()
    p = head_prefix

    def put(flax_key: str, value: np.ndarray):
        assert flax_key in dst, f"no flax param {flax_key}"
        assert dst[flax_key].shape == value.shape, \
            f"{flax_key}: {dst[flax_key].shape} vs {value.shape}"
        dst[flax_key] = value.astype(np.float32)
        filled.add(flax_key)

    def ln(tk, fk):
        put(fk + "/scale", flat_np[tk + ".weight"])
        put(fk + "/bias", flat_np[tk + ".bias"])
        used.update({tk + ".weight", tk + ".bias"})

    E = flat_np["wte.weight"].shape[1]
    dh = E // n_head
    put(p + "gpt/wte/embedding", flat_np["wte.weight"])
    put(p + "gpt/wpe/embedding", flat_np["wpe.weight"])
    used.update({"wte.weight", "wpe.weight"})
    i = 0
    while f"h.{i}.ln_1.weight" in flat_np:
        ln(f"h.{i}.ln_1", p + f"gpt/ln1_{i}")
        ln(f"h.{i}.ln_2", p + f"gpt/ln2_{i}")
        w = flat_np[f"h.{i}.attn.c_attn.weight"]            # (E, 3E)
        b = flat_np[f"h.{i}.attn.c_attn.bias"]
        for j, name in enumerate(["query", "key", "value"]):
            put(p + f"gpt/attn_{i}/{name}/kernel",
                w[:, j * E:(j + 1) * E].reshape(E, n_head, dh))
            put(p + f"gpt/attn_{i}/{name}/bias",
                b[j * E:(j + 1) * E].reshape(n_head, dh))
        put(p + f"gpt/attn_{i}/out/kernel",
            flat_np[f"h.{i}.attn.c_proj.weight"].reshape(n_head, dh, E))
        put(p + f"gpt/attn_{i}/out/bias", flat_np[f"h.{i}.attn.c_proj.bias"])
        put(p + f"gpt/fc_{i}/kernel", flat_np[f"h.{i}.mlp.c_fc.weight"])
        put(p + f"gpt/fc_{i}/bias", flat_np[f"h.{i}.mlp.c_fc.bias"])
        put(p + f"gpt/proj_{i}/kernel", flat_np[f"h.{i}.mlp.c_proj.weight"])
        put(p + f"gpt/proj_{i}/bias", flat_np[f"h.{i}.mlp.c_proj.bias"])
        used.update({f"h.{i}.attn.c_attn.weight", f"h.{i}.attn.c_attn.bias",
                     f"h.{i}.attn.c_proj.weight", f"h.{i}.attn.c_proj.bias",
                     f"h.{i}.mlp.c_fc.weight", f"h.{i}.mlp.c_fc.bias",
                     f"h.{i}.mlp.c_proj.weight", f"h.{i}.mlp.c_proj.bias",
                     # attention bias buffers (causal mask constants)
                     f"h.{i}.attn.bias", f"h.{i}.attn.masked_bias"})
        i += 1
    ln("ln_f", p + "gpt/ln_f")
    used.add("lm_head.weight")                              # tied with wte

    # optional ClipCap mapper (reference GPT.py MLP: Linear-tanh-Linear)
    if "clip_project.model.0.weight" in flat_np:
        put(p + "clip_project/fc1/kernel",
            flat_np["clip_project.model.0.weight"].T)
        put(p + "clip_project/fc1/bias", flat_np["clip_project.model.0.bias"])
        put(p + "clip_project/fc2/kernel",
            flat_np["clip_project.model.2.weight"].T)
        put(p + "clip_project/fc2/bias", flat_np["clip_project.model.2.bias"])
        used.update({f"clip_project.model.{j}.{q}" for j in (0, 2)
                     for q in ("weight", "bias")})

    unused = sorted(k for k in set(flat_np) - used if ".attn.bias" not in k
                    and ".attn.masked_bias" not in k)
    has_mapper = "clip_project.model.0.weight" in flat_np
    unfilled = sorted(
        k for k in set(dst) - filled
        if k.startswith(p + "gpt/") or
        (has_mapper and k.startswith(p + "clip_project/")))
    new_params = {"params": flax.traverse_util.unflatten_dict(dst, sep="/")}
    return new_params, unused, unfilled


def import_pytorch_checkpoint(pth_path: str, params: Dict, n_heads: int,
                              share_caption_head: bool = True):
    """Load a reference .pth and map it (see import_pytorch_state_dict)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    sd = {k: v.numpy() for k, v in sd.items()}
    return import_pytorch_state_dict(sd, params, n_heads, share_caption_head)
