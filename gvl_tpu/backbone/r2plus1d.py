"""R(2+1)D / R3D video backbones in flax.

Behavioral spec: reference video_backbone/TSP/models/backbone.py (torchvision
r2plus1d_34 / r2plus1d_18 / r3d_18) — factored (2+1)D convolutions with the
paper's intermediate-width formula, BasicBlocks [3,4,6,3] (34) / [2,2,2,2]
(18), stride-2 spatiotemporal downsampling from stage 2, global avg pool to
a 512-d clip feature.

TPU layout: videos are (N, T, H, W, C) channels-last so 3-D convs map onto
the MXU without transposes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _midplanes(in_c: int, out_c: int, t: int = 3, d: int = 3) -> int:
    # M_i from the R(2+1)D paper: matches torchvision's Conv2Plus1D width
    return (t * d * d * in_c * out_c) // (d * d * in_c + t * out_c)


class Conv2Plus1D(nn.Module):
    out_c: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        in_c = x.shape[-1]
        mid = _midplanes(in_c, self.out_c)
        st, sh, sw = self.stride
        x = nn.Conv(mid, kernel_size=(1, 3, 3), strides=(1, sh, sw),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         epsilon=self.bn_eps)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_c, kernel_size=(3, 1, 1), strides=(st, 1, 1),
                    padding=((1, 1), (0, 0), (0, 0)), use_bias=False)(x)
        return x


class Conv3DSimple(nn.Module):
    out_c: int
    stride: Tuple[int, int, int] = (1, 1, 1)
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.Conv(self.out_c, kernel_size=(3, 3, 3), strides=self.stride,
                       padding=((1, 1), (1, 1), (1, 1)), use_bias=False)(x)


class BasicBlock(nn.Module):
    out_c: int
    conv_type: str = "2plus1d"
    stride: Tuple[int, int, int] = (1, 1, 1)
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool):
        Conv = Conv2Plus1D if self.conv_type == "2plus1d" else Conv3DSimple
        identity = x
        h = Conv(self.out_c, self.stride, self.bn_eps)(x, train)
        h = nn.BatchNorm(use_running_average=not train,
                         epsilon=self.bn_eps)(h)
        h = nn.relu(h)
        h = Conv(self.out_c, (1, 1, 1), self.bn_eps)(h, train)
        h = nn.BatchNorm(use_running_average=not train,
                         epsilon=self.bn_eps)(h)
        if x.shape[-1] != self.out_c or self.stride != (1, 1, 1):
            identity = nn.Conv(self.out_c, kernel_size=(1, 1, 1),
                               strides=self.stride, use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    epsilon=self.bn_eps)(identity)
        return nn.relu(h + identity)


class R2Plus1D(nn.Module):
    """Backbone; returns the pooled 512-d clip feature.

    `bn_eps`: torchvision's r2plus1d_34 builder overrides BatchNorm eps to
    1e-3 for Caffe2/IG65M-checkpoint parity (reference
    video_backbone/TSP/models/backbone.py:23-26); 18-layer variants keep the
    torch default 1e-5."""
    block_counts: Sequence[int] = (3, 4, 6, 3)   # 34; (2,2,2,2) for 18
    conv_type: str = "2plus1d"                   # '3d' for R3D-18
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, T, H, W, 3), normalized
        if self.conv_type == "2plus1d":
            x = nn.Conv(45, kernel_size=(1, 7, 7), strides=(1, 2, 2),
                        padding=((0, 0), (3, 3), (3, 3)), use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             epsilon=self.bn_eps)(x)
            x = nn.relu(x)
            x = nn.Conv(64, kernel_size=(3, 1, 1), strides=(1, 1, 1),
                        padding=((1, 1), (0, 0), (0, 0)), use_bias=False)(x)
        else:
            x = nn.Conv(64, kernel_size=(3, 7, 7), strides=(1, 2, 2),
                        padding=((1, 1), (3, 3), (3, 3)), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         epsilon=self.bn_eps)(x)
        x = nn.relu(x)

        channels = (64, 128, 256, 512)
        for stage, (c, n_blocks) in enumerate(zip(channels,
                                                  self.block_counts)):
            for b in range(n_blocks):
                stride = (2, 2, 2) if (stage > 0 and b == 0) else (1, 1, 1)
                x = BasicBlock(c, self.conv_type, stride,
                               self.bn_eps)(x, train)
        return jnp.mean(x, axis=(1, 2, 3))       # (N, 512)


class TSPModel(nn.Module):
    """Backbone + per-task FC heads with optional global-video-feature
    concatenation (reference: video_backbone/TSP/models/model.py:37-49 —
    GVF doubles the head input width)."""
    num_classes_list: Sequence[int] = (200,)     # e.g. (200, 2) for TSP
    backbone: str = "r2plus1d_34"
    use_gvf: bool = False
    fc_dropout: float = 0.5

    @nn.compact
    def __call__(self, clips, gvf=None, train: bool = False):
        counts = {"r2plus1d_34": (3, 4, 6, 3), "r2plus1d_18": (2, 2, 2, 2),
                  "r3d_18": (2, 2, 2, 2)}[self.backbone]
        conv_type = "3d" if self.backbone == "r3d_18" else "2plus1d"
        bn_eps = 1e-3 if self.backbone == "r2plus1d_34" else 1e-5
        feat = R2Plus1D(counts, conv_type, bn_eps,
                        name="backbone")(clips, train)
        h = feat
        if self.use_gvf:
            assert gvf is not None, "use_gvf requires a global video feature"
            h = jnp.concatenate([h, gvf], axis=-1)
        h = nn.Dropout(self.fc_dropout)(h, deterministic=not train)
        logits = [nn.Dense(n, name=f"fc_{i}")(h)
                  for i, n in enumerate(self.num_classes_list)]
        return feat, logits
