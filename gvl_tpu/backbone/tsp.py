"""TSP feature extraction + training drivers (offline, optional layer L6).

Behavioral spec: reference video_backbone/TSP/ —
- extract_features: sliding-window clips over each video, sharded across
  jobs by --num_shards/--shard_id (extract_features.py:82-100), one feature
  file per video;
- train: temporally-sensitive pretraining (action cls + inside/outside
  head) / plain action classification, with lr warmup.

TPU redesign: clips batch through one jitted apply on the dp mesh instead of
DDP; sharding of the video list stays embarrassingly parallel. Video
decoding uses cv2 when frames aren't pre-dumped.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np

CLIP_MEAN = np.array([0.43216, 0.394666, 0.37645], np.float32)
CLIP_STD = np.array([0.22803, 0.22145, 0.216989], np.float32)


def decode_video_frames(path: str, fps: float = 15.0, size: int = 112,
                        max_frames: int = 100000) -> np.ndarray:
    """Decode to (T, size, size, 3) float32 in [0,1] at the target fps
    (reference standardizes clips to 15 fps / 112px center crops)."""
    import cv2
    cap = cv2.VideoCapture(path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    step = max(src_fps / fps, 1e-6)
    frames = []
    idx, next_take = 0, 0.0
    while len(frames) < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if idx >= next_take:
            h, w = frame.shape[:2]
            scale = size * 1.15 / min(h, w)
            frame = cv2.resize(frame, (int(w * scale), int(h * scale)))
            h, w = frame.shape[:2]
            y0, x0 = (h - size) // 2, (w - size) // 2
            crop = frame[y0:y0 + size, x0:x0 + size, ::-1]  # BGR->RGB
            frames.append(crop.astype(np.float32) / 255.0)
            next_take += step
        idx += 1
    cap.release()
    if not frames:
        return np.zeros((0, size, size, 3), np.float32)
    return np.stack(frames)


def make_clips(frames: np.ndarray, clip_len: int = 16,
               stride: int = 16) -> np.ndarray:
    """(T,H,W,C) -> (n_clips, clip_len, H, W, C), last clip padded by
    repeating the final frame."""
    T = len(frames)
    if T == 0:
        return np.zeros((0, clip_len) + frames.shape[1:], np.float32)
    starts = list(range(0, T, stride))  # tail clip padded below
    clips = []
    for s in starts:
        c = frames[s:s + clip_len]
        if len(c) < clip_len:
            pad = np.repeat(c[-1:], clip_len - len(c), axis=0)
            c = np.concatenate([c, pad], 0)
        clips.append(c)
    return np.stack(clips)


def load_backbone_checkpoint(checkpoint: str, params, backbone: str):
    """Restore extraction weights from either a raw torch `.pth` or a
    `backbone.msgpack` written by `tools/import_checkpoint.py --backbone`.

    The msgpack holds ONLY the 'backbone' subtree: the fc heads depend on
    num_classes_list, which differs between the importer's model and the
    extraction model, and are unused for feature extraction anyway
    (reference extract_features.py:123 strips fc before loading)."""
    if checkpoint.endswith(".pth"):
        from gvl_tpu.backbone.import_torch import load_tsp_checkpoint
        params, unused, unfilled = load_tsp_checkpoint(
            checkpoint, params, backbone)
        # A wrong-architecture checkpoint (e.g. r2plus1d_34 weights into
        # backbone='r2plus1d_18') would otherwise silently extract from
        # partially random-init weights — mirror the CLI importer's check.
        bad = [u for u in unfilled if not u.startswith("params/fc_")]
        if bad or unused:
            raise ValueError(
                f"checkpoint {checkpoint!r} does not match "
                f"backbone={backbone!r}: {len(unused)} torch tensors "
                f"unmapped {unused[:5]}, non-fc variables left at init "
                f"{bad[:5]}")
        return params
    from flax.serialization import from_state_dict, msgpack_restore
    with open(checkpoint, "rb") as f:
        raw = msgpack_restore(f.read())
    out = dict(params)
    for col in params:
        if col not in raw or "backbone" not in raw[col]:
            raise ValueError(
                f"{checkpoint!r} has no {col}/backbone subtree — not a "
                "backbone.msgpack written by tools/import_checkpoint.py "
                "--backbone")
        out[col] = dict(params[col])
        out[col]["backbone"] = from_state_dict(params[col]["backbone"],
                                               raw[col]["backbone"])
    return out


def extract_features(video_paths: Sequence[str], out_dir: str,
                     params=None, model=None, batch_size: int = 8,
                     clip_len: int = 16, stride: int = 16, fps: float = 15.0,
                     num_shards: int = 1, shard_id: int = 0,
                     backbone: str = "r2plus1d_34",
                     checkpoint: Optional[str] = None) -> List[str]:
    """Sharded sliding-window feature extraction; one .npy per video.

    `checkpoint`: a `backbone.msgpack` written by `tools/import_checkpoint.py
    --backbone` (converted released TSP/TAC weights) or a raw torch `.pth`
    (imported on the fly). Without it extraction runs from RANDOM INIT and a
    warning is printed — reference extraction always loads released weights
    (extract_features.py:110-128)."""
    import jax
    import jax.numpy as jnp
    from gvl_tpu.backbone.r2plus1d import TSPModel

    os.makedirs(out_dir, exist_ok=True)
    shard = [p for i, p in enumerate(sorted(video_paths))
             if i % num_shards == shard_id]

    if model is None:
        model = TSPModel(num_classes_list=(200,), backbone=backbone)
    if params is None:
        probe = jnp.zeros((1, clip_len, 112, 112, 3))
        params = model.init(jax.random.PRNGKey(0), probe, train=False)
        if checkpoint:
            params = load_backbone_checkpoint(checkpoint, params, backbone)
        else:
            print("WARNING: extracting features from RANDOM-INIT backbone "
                  "(pass checkpoint= a converted TSP/TAC .msgpack or .pth)")

    @jax.jit
    def embed(params, clips):
        feat, _ = model.apply(params, clips, train=False,
                              mutable=False)
        return feat

    written = []
    for path in shard:
        key = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(out_dir, key + ".npy")
        if os.path.exists(out_path):
            continue
        frames = decode_video_frames(path, fps=fps)
        frames = (frames - CLIP_MEAN) / CLIP_STD
        clips = make_clips(frames, clip_len, stride)
        if len(clips) == 0:
            continue
        feats = []
        for i in range(0, len(clips), batch_size):
            chunk = clips[i:i + batch_size]
            if len(chunk) < batch_size:  # keep the jit shape static
                pad = np.repeat(chunk[-1:], batch_size - len(chunk), 0)
                padded = np.concatenate([chunk, pad], 0)
                feats.append(np.asarray(embed(params, jnp.asarray(padded))
                                        )[: len(chunk)])
            else:
                feats.append(np.asarray(embed(params, jnp.asarray(chunk))))
        np.save(out_path, np.concatenate(feats, 0))
        written.append(out_path)
    return written
