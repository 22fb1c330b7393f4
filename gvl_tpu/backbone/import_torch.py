"""Import torchvision VideoResNet / TSP checkpoints into the flax backbone.

The reference's feature extraction loads released TSP/TAC checkpoints built
on (Kinetics/IG65M-pretrained) torchvision `VideoResNet`s (reference
video_backbone/TSP/extract_features/extract_features.py:110-128 — state_dict
under the 'model' key, fc heads stripped) whose module naming is fixed by
torchvision (reference video_backbone/TSP/models/backbone.py:13-75):

  stem.{0,1,3,4}                         R2Plus1dStem: conv/bn/.../conv/bn
  layer{1..4}.{b}.conv{1,2}.0.{0,1,3}    Conv2Plus1D: spatial conv, mid bn,
                                         temporal conv (ReLU at .2 is
                                         stateless)
  layer{1..4}.{b}.conv{1,2}.1            block-level bn
  layer{1..4}.{b}.downsample.{0,1}       1x1x1 conv + bn
  fc / fc1 / fc2                         task heads (TSP models/model.py:31-35)

This module maps those tensors onto `gvl_tpu.backbone.r2plus1d.TSPModel`
variables: torch conv weights (O, I, kT, kH, kW) transpose to flax
(kT, kH, kW, I, O); BatchNorm weight/bias -> params scale/bias and
running_mean/var -> batch_stats mean/var; Linear weights transpose.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_BLOCK_COUNTS = {"r2plus1d_34": (3, 4, 6, 3), "r2plus1d_18": (2, 2, 2, 2),
                 "r3d_18": (2, 2, 2, 2)}

_BN_PARAMS = {"weight": ("params", "scale"), "bias": ("params", "bias"),
              "running_mean": ("batch_stats", "mean"),
              "running_var": ("batch_stats", "var")}


def _flax_paths(torch_key: str, backbone: str):
    """Map one torch tensor name -> (collection, path-tuple, transform) or
    None for stateless entries (num_batches_tracked)."""
    r21d = backbone != "r3d_18"
    counts = _BLOCK_COUNTS[backbone]
    parts = torch_key.split(".")

    def bn(prefix: Tuple[str, ...], leaf: str):
        if leaf == "num_batches_tracked":
            return None
        coll, name = _BN_PARAMS[leaf]
        return coll, prefix + (name,), "none"

    if parts[0] == "stem":
        idx, leaf = int(parts[1]), parts[2]
        if r21d:
            names = {0: ("Conv_0",), 1: ("BatchNorm_0",),
                     3: ("Conv_1",), 4: ("BatchNorm_1",)}
        else:
            names = {0: ("Conv_0",), 1: ("BatchNorm_0",)}
        mod = ("backbone",) + names[idx]
        if leaf == "weight" and "Conv" in names[idx][0]:
            return "params", mod + ("kernel",), "conv"
        return bn(mod, leaf)

    if parts[0].startswith("layer"):
        stage = int(parts[0][5:]) - 1
        b = int(parts[1])
        block = ("backbone", f"BasicBlock_{sum(counts[:stage]) + b}")
        if parts[2] == "downsample":
            if parts[3] == "0":                      # 1x1x1 conv
                return "params", block + ("Conv_0", "kernel"), "conv"
            return bn(block + ("BatchNorm_2",), parts[4])
        c = int(parts[2][4:]) - 1                    # conv1 / conv2
        if r21d:
            inner = ("Conv2Plus1D_%d" % c,)
            if parts[3] == "0":                      # inside Conv2Plus1D
                sub, leaf = parts[4], parts[5]
                if sub == "0":
                    return ("params", block + inner + ("Conv_0", "kernel"),
                            "conv")
                if sub == "1":
                    return bn(block + inner + ("BatchNorm_0",), leaf)
                if sub == "3":
                    return ("params", block + inner + ("Conv_1", "kernel"),
                            "conv")
                raise KeyError(torch_key)
            return bn(block + (f"BatchNorm_{c}",), parts[4])
        else:
            if parts[3] == "0":                      # Conv3DSimple
                return ("params",
                        block + (f"Conv3DSimple_{c}", "Conv_0", "kernel"),
                        "conv")
            return bn(block + (f"BatchNorm_{c}",), parts[4])

    if parts[0] in ("fc", "fc1", "fc2"):
        head = {"fc": "fc_0", "fc1": "fc_0", "fc2": "fc_1"}[parts[0]]
        if parts[1] == "weight":
            return "params", (head, "kernel"), "dense"
        return "params", (head, "bias"), "none"

    raise KeyError(torch_key)


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv":                       # (O,I,kT,kH,kW)->(kT,kH,kW,I,O)
        return np.transpose(arr, (2, 3, 4, 1, 0))
    if kind == "dense":                      # (O,I) -> (I,O)
        return np.transpose(arr, (1, 0))
    return arr


def import_videoresnet_state_dict(state_dict: Dict[str, np.ndarray],
                                  variables, backbone: str = "r2plus1d_34",
                                  strict_shapes: bool = True):
    """Fill a TSPModel variables tree ({'params':..., 'batch_stats':...})
    from a torch state_dict. Accepts raw VideoResNet dicts, TSP `Model`
    dicts ('features.'-prefixed backbone), and DDP 'module.'-prefixed dicts.

    Returns (new_variables, unused_torch_keys, unfilled_flax_paths).
    """
    import jax

    flat = {}
    for coll in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                variables.get(coll, {}))[0]:
            flat[(coll,) + tuple(k.key for k in path)] = leaf

    filled, out = set(), dict(flat)
    unused: List[str] = []
    for key, val in state_dict.items():
        k = key
        for pre in ("module.", "features."):
            if k.startswith(pre):
                k = k[len(pre):]
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        try:
            mapped = _flax_paths(k, backbone)
        except KeyError:
            unused.append(key)
            continue
        if mapped is None:
            continue
        coll, path, kind = mapped
        full = (coll,) + path
        if full not in flat:
            unused.append(key)
            continue
        arr = _transform(arr, kind)
        if strict_shapes and tuple(arr.shape) != tuple(flat[full].shape):
            raise ValueError(
                f"{key}: torch shape {arr.shape} != flax "
                f"{flat[full].shape} at {'/'.join(full)}")
        out[full] = arr.astype(np.asarray(flat[full]).dtype)
        filled.add(full)

    unfilled = sorted("/".join(p) for p in flat if p not in filled)

    def unflatten(d):
        tree: dict = {}
        for path, v in d.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = v
        return tree

    return unflatten(out), unused, unfilled


def load_tsp_checkpoint(pth_path: str, variables, backbone: str):
    """Load a reference TSP .pth (state_dict under 'model', per
    extract_features.py:110) or a raw VideoResNet .pth, strip fc heads the
    way the reference extractor does (extract_features.py:123), and import
    the backbone weights."""
    import torch
    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = blob.get("model", blob) if isinstance(blob, dict) else blob
    sd = {k: v for k, v in sd.items() if "fc" not in k}
    return import_videoresnet_state_dict(sd, variables, backbone)
