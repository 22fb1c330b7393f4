"""TSP/torchvision VideoResNet -> flax backbone weight import.

torchvision is not installed in-sandbox, so the tests construct an exact
torch replica of its VideoResNet module tree (same attribute names =>
identical state_dict keys as the reference's backbone builder, reference
video_backbone/TSP/models/backbone.py:13-75) and assert:
  - every torch tensor maps (no unused) and every flax variable is filled
    (no unfilled) for r2plus1d_18/34 and r3d_18;
  - forward parity torch-eval vs flax train=False on a real clip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gvl_tpu.backbone.import_torch import (  # noqa: E402
    import_videoresnet_state_dict, load_tsp_checkpoint)
from gvl_tpu.backbone.r2plus1d import TSPModel  # noqa: E402

nn = torch.nn


def _midplanes(i, o):
    return (i * o * 3 * 3 * 3) // (i * 3 * 3 + 3 * o)


class Conv2Plus1D(nn.Sequential):
    def __init__(self, i, o, stride=1):
        m = _midplanes(i, o)
        super().__init__(
            nn.Conv3d(i, m, (1, 3, 3), (1, stride, stride), (0, 1, 1),
                      bias=False),
            nn.BatchNorm3d(m), nn.ReLU(inplace=True),
            nn.Conv3d(m, o, (3, 1, 1), (stride, 1, 1), (1, 0, 0),
                      bias=False))


class Conv3DSimple(nn.Conv3d):
    def __init__(self, i, o, stride=1):
        super().__init__(i, o, (3, 3, 3), (stride,) * 3, (1, 1, 1),
                         bias=False)


class BasicBlock(nn.Module):
    def __init__(self, i, o, conv, stride=1):
        super().__init__()
        self.conv1 = nn.Sequential(conv(i, o, stride), nn.BatchNorm3d(o),
                                   nn.ReLU(inplace=True))
        self.conv2 = nn.Sequential(conv(o, o, 1), nn.BatchNorm3d(o))
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or i != o:
            self.downsample = nn.Sequential(
                nn.Conv3d(i, o, 1, (stride,) * 3, bias=False),
                nn.BatchNorm3d(o))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        return self.relu(self.conv2(self.conv1(x)) + idt)


class VideoResNet(nn.Module):
    def __init__(self, layers=(2, 2, 2, 2), conv_type="2plus1d",
                 num_classes=4):
        super().__init__()
        conv = Conv2Plus1D if conv_type == "2plus1d" else Conv3DSimple
        if conv_type == "2plus1d":
            self.stem = nn.Sequential(
                nn.Conv3d(3, 45, (1, 7, 7), (1, 2, 2), (0, 3, 3),
                          bias=False),
                nn.BatchNorm3d(45), nn.ReLU(inplace=True),
                nn.Conv3d(45, 64, (3, 1, 1), (1, 1, 1), (1, 0, 0),
                          bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        else:
            self.stem = nn.Sequential(
                nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3),
                          bias=False),
                nn.BatchNorm3d(64), nn.ReLU(inplace=True))
        inp = 64
        for s, (c, n) in enumerate(zip((64, 128, 256, 512), layers)):
            blocks = []
            for b in range(n):
                blocks.append(BasicBlock(inp, c, conv,
                                         2 if (s > 0 and b == 0) else 1))
                inp = c
            setattr(self, f"layer{s + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x, features_only=True):
        x = self.stem(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        feat = x.mean(dim=(2, 3, 4))
        return feat if features_only else self.fc(feat)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        if k.endswith("running_var"):
            sd[k] = sd[k].abs() + 0.5
    model.load_state_dict(sd)
    return model


def _flax_vars(backbone, n_cls=4, clip=(1, 4, 32, 32, 3)):
    m = TSPModel(num_classes_list=(n_cls,), backbone=backbone)
    return m, m.init(jax.random.PRNGKey(0), jnp.zeros(clip), train=False)


@pytest.mark.parametrize("backbone,layers,conv_type", [
    ("r2plus1d_18", (2, 2, 2, 2), "2plus1d"),
    ("r2plus1d_34", (3, 4, 6, 3), "2plus1d"),
    ("r3d_18", (2, 2, 2, 2), "3d"),
])
def test_key_coverage(backbone, layers, conv_type):
    """Every torch tensor maps and every flax variable is filled — the
    importer covers the full released-checkpoint surface."""
    tm = VideoResNet(layers, conv_type)
    model, variables = _flax_vars(backbone)
    new, unused, unfilled = import_videoresnet_state_dict(
        tm.state_dict(), variables, backbone=backbone)
    assert unused == [], unused[:5]
    assert unfilled == [], unfilled[:5]
    assert jax.tree_util.tree_structure(new) == \
        jax.tree_util.tree_structure(variables)


def test_forward_parity_r2plus1d_18():
    tm = _randomize(VideoResNet((2, 2, 2, 2), "2plus1d")).eval()
    model, variables = _flax_vars("r2plus1d_18")
    new, unused, unfilled = import_videoresnet_state_dict(
        tm.state_dict(), variables, backbone="r2plus1d_18")
    assert not unused and not unfilled

    rng = np.random.RandomState(1)
    clip = rng.randn(2, 6, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
                  features_only=True).numpy()
    got, _ = model.apply(new, jnp.asarray(clip), train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_forward_parity_r2plus1d_34():
    """The flagship backbone — and the only one with the bn_eps=1e-3
    override (reference backbone.py:23-26 sets eps=1e-3 for the IG65M
    34-layer checkpoints) — so a 34-specific mapping or eps regression
    must fail here, not in production (ADVICE r4)."""
    tm = VideoResNet((3, 4, 6, 3), "2plus1d")
    for m in tm.modules():           # reference sets eps on every BN
        if isinstance(m, nn.BatchNorm3d):
            m.eps = 1e-3
    tm = _randomize(tm, seed=7).eval()
    model, variables = _flax_vars("r2plus1d_34")
    new, unused, unfilled = import_videoresnet_state_dict(
        tm.state_dict(), variables, backbone="r2plus1d_34")
    assert not unused and not unfilled

    rng = np.random.RandomState(4)
    clip = rng.randn(1, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
                  features_only=True).numpy()
    got, _ = model.apply(new, jnp.asarray(clip), train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_backbone_msgpack_cross_num_classes(tmp_path):
    """backbone.msgpack written from a num_classes_list=(1,) model restores
    into a (200,) extraction model: the file carries only the 'backbone'
    subtree, so head-shape differences cannot break extraction (ADVICE r4
    medium — the old full-tree format raised ScopeParamShapeError here)."""
    from flax.serialization import to_bytes

    from gvl_tpu.backbone.tsp import load_backbone_checkpoint

    tm = _randomize(VideoResNet((2, 2, 2, 2), "2plus1d"), seed=5).eval()
    writer, wvars = _flax_vars("r2plus1d_18", n_cls=1)
    filled, unused, unfilled = import_videoresnet_state_dict(
        {k: v for k, v in tm.state_dict().items()
         if not k.startswith("fc")}, wvars, backbone="r2plus1d_18")
    # writer side: serialize only the backbone subtree (as the CLI does)
    sub = {col: {"backbone": tree["backbone"]}
           for col, tree in filled.items()}
    path = tmp_path / "backbone.msgpack"
    path.write_bytes(to_bytes(sub))

    reader, rvars = _flax_vars("r2plus1d_18", n_cls=200)
    restored = load_backbone_checkpoint(str(path), rvars, "r2plus1d_18")

    rng = np.random.RandomState(6)
    clip = rng.randn(1, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
                  features_only=True).numpy()
    got, _ = reader.apply(restored, jnp.asarray(clip), train=False,
                          mutable=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    # a non-backbone msgpack is rejected, not silently partially applied
    bad = tmp_path / "junk.msgpack"
    bad.write_bytes(to_bytes({"params": {"not_backbone": {}}}))
    with pytest.raises(ValueError, match="backbone subtree"):
        load_backbone_checkpoint(str(bad), rvars, "r2plus1d_18")


def test_pth_wrong_architecture_raises(tmp_path):
    """extract_features' on-the-fly .pth path refuses a wrong-architecture
    checkpoint instead of extracting from partially random-init weights
    (ADVICE r4 low)."""
    from gvl_tpu.backbone.tsp import load_backbone_checkpoint

    tm = VideoResNet((3, 4, 6, 3), "2plus1d")   # 34-layer weights
    torch.save({"model": tm.state_dict()}, tmp_path / "w34.pth")
    _, vars18 = _flax_vars("r2plus1d_18")       # ...into an 18-layer model
    # colliding keys already raise at shape-mismatch inside the importer;
    # non-colliding leftovers raise the unmapped/unfilled check
    with pytest.raises(ValueError,
                       match="does not match|shape"):
        load_backbone_checkpoint(str(tmp_path / "w34.pth"), vars18,
                                 "r2plus1d_18")

    # the unmapped-leftovers path: drop a whole block's tensors so no shape
    # collision occurs, leaving flax variables silently at init pre-fix
    sd = {k: v for k, v in VideoResNet((2, 2, 2, 2), "2plus1d")
          .state_dict().items()
          if not k.startswith("layer4.1.") and not k.startswith("fc")}
    torch.save({"model": sd}, tmp_path / "partial.pth")
    with pytest.raises(ValueError, match="does not match"):
        load_backbone_checkpoint(str(tmp_path / "partial.pth"), vars18,
                                 "r2plus1d_18")


def test_forward_parity_r3d_18():
    tm = _randomize(VideoResNet((2, 2, 2, 2), "3d"), seed=3).eval()
    model, variables = _flax_vars("r3d_18")
    new, unused, unfilled = import_videoresnet_state_dict(
        tm.state_dict(), variables, backbone="r3d_18")
    assert not unused and not unfilled

    rng = np.random.RandomState(2)
    clip = rng.randn(1, 4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(clip).permute(0, 4, 1, 2, 3),
                  features_only=True).numpy()
    got, _ = model.apply(new, jnp.asarray(clip), train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_fc_heads_and_tsp_pth(tmp_path):
    """TSP `Model` checkpoints ('features.'-prefixed backbone + fc1/fc2
    heads, under a 'model' key — extract_features.py:110): the loader strips
    fc like the reference extractor and fills the whole backbone; fc heads
    map when imported directly."""
    tm = _randomize(VideoResNet((2, 2, 2, 2), "2plus1d"))
    sd = {"features." + k: v for k, v in tm.state_dict().items()
          if not k.startswith("fc")}
    sd["fc1.weight"] = torch.randn(4, 512)
    sd["fc1.bias"] = torch.randn(4)
    torch.save({"model": sd, "epoch": 5}, tmp_path / "tsp.pth")

    model, variables = _flax_vars("r2plus1d_18")
    new, unused, unfilled = load_tsp_checkpoint(
        str(tmp_path / "tsp.pth"), variables, "r2plus1d_18")
    assert unused == []
    # reference extraction strips fc -> only the head stays at init
    assert all(p.startswith("params/fc_0") for p in unfilled), unfilled

    # direct import (no fc strip) maps the heads too
    new2, unused2, unfilled2 = import_videoresnet_state_dict(
        sd, variables, backbone="r2plus1d_18")
    assert unused2 == [] and unfilled2 == []
    np.testing.assert_allclose(
        np.asarray(new2["params"]["fc_0"]["kernel"]),
        sd["fc1.weight"].numpy().T)
