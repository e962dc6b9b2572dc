"""I3D tower tests (VERDICT r3 #5 — the I3D arm of feature extraction).

The reference delegates I3D to the ``video_features`` submodule (an empty
stub, ``/root/reference/predict_video.py:157``), so there is no reference
code to import; parity is pinned against a test-local torch replica of the
standard InceptionI3d building blocks (TF-SAME padding, eval-mode
BatchNorm3d eps=1e-3) built from the SAME random state dict the converter
ingests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct_tpu.i3d import (
    FEATURE_DIM,
    I3DTower,
    convert_i3d,
    estimate_flow,
    i3d_stacks,
    preprocess_i3d_flow,
    preprocess_i3d_frames,
)
from vct_tpu.i3d.model import INCEPTION_CHANNELS, InceptionModule, Unit3D

torch = pytest.importorskip("torch")


# --------------------------------------------------------------------------
# torch replica of the standard I3D blocks (test-local; eval mode only)
# --------------------------------------------------------------------------


def _same_pad(x, k, s):
    import torch.nn.functional as F

    pads = []
    for dim, (ksz, st) in zip(x.shape[2:], zip(k, s)):
        out = -(-dim // st)
        total = max((out - 1) * st + ksz - dim, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad packs last dim first: (w_l, w_r, h_l, h_r, t_l, t_r)
    flat = [p for pair in reversed(pads) for p in pair]
    return F.pad(x, flat)


class TUnit(torch.nn.Module):
    def __init__(self, cin, cout, k=(1, 1, 1), s=(1, 1, 1), bn=True,
                 act=True, bias=False):
        super().__init__()
        self.k, self.s, self.act = k, s, act
        self.conv3d = torch.nn.Conv3d(cin, cout, k, s, padding=0, bias=bias)
        self.bn = torch.nn.BatchNorm3d(cout, eps=1e-3) if bn else None

    def forward(self, x):
        x = self.conv3d(_same_pad(x, self.k, self.s))
        if self.bn is not None:
            x = self.bn(x)
        return torch.nn.functional.relu(x) if self.act else x


class TInception(torch.nn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        k3 = (3, 3, 3)
        self.b0 = TUnit(cin, ch[0])
        self.b1a = TUnit(cin, ch[1])
        self.b1b = TUnit(ch[1], ch[2], k3)
        self.b2a = TUnit(cin, ch[3])
        self.b2b = TUnit(ch[3], ch[4], k3)
        self.b3b = TUnit(cin, ch[5])

    def forward(self, x):
        b0 = self.b0(x)
        b1 = self.b1b(self.b1a(x))
        b2 = self.b2b(self.b2a(x))
        # zero-pad SAME maxpool (inputs are post-ReLU, so == -inf pad)
        b3 = torch.nn.functional.max_pool3d(
            _same_pad(x, (3, 3, 3), (1, 1, 1)), (3, 3, 3), (1, 1, 1))
        return torch.cat([b0, b1, b2, self.b3b(b3)], dim=1)


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for key, v in sd.items():
        if key.endswith("running_var"):
            sd[key] = torch.rand(v.shape, generator=g) + 0.5
        elif key.endswith("num_batches_tracked"):
            continue
        else:
            sd[key] = torch.randn(v.shape, generator=g) * 0.2
    module.load_state_dict(sd)
    module.eval()
    return {k: v.numpy() for k, v in sd.items()}


def _nchw(x_ndhwc):
    return torch.from_numpy(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)).copy())


def _to_ndhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


# --------------------------------------------------------------------------
# numeric parity: blocks vs the torch replica, same state dict
# --------------------------------------------------------------------------


@pytest.mark.parametrize("k,s", [((1, 1, 1), (1, 1, 1)),
                                 ((3, 3, 3), (1, 1, 1)),
                                 ((7, 7, 7), (2, 2, 2))])
def test_unit3d_matches_torch(k, s):
    tm = TUnit(5, 8, k, s)
    sd = {f"u.{key}": v for key, v in _randomize(tm, seed=k[0] * 10 + s[0]).items()}
    params = convert_i3d.__globals__["_unit"](sd, "u")  # the converter's unit
    x = np.random.RandomState(0).randn(2, 6, 9, 9, 5).astype(np.float32)

    want = _to_ndhwc(tm(_nchw(x)))
    got = Unit3D(8, k, s).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_inception_module_matches_torch():
    ch = (4, 4, 8, 2, 4, 4)
    tm = TInception(10, ch)
    sd = {f"M.{key}": v for key, v in _randomize(tm, seed=7).items()}
    params = {b: convert_i3d.__globals__["_unit"](sd, f"M.{b}")
              for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")}
    x = np.abs(np.random.RandomState(1).randn(2, 4, 8, 8, 10)).astype(np.float32)

    want = _to_ndhwc(tm(_nchw(x)))
    got = InceptionModule(ch).apply({"params": params}, jnp.asarray(x))
    assert got.shape == want.shape == (2, 4, 8, 8, 20)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


# --------------------------------------------------------------------------
# full tower: wiring + converter coverage against independent constants
# --------------------------------------------------------------------------

# Inception-v1 stage output channels (independent literals, NOT derived from
# the model's table — they pin the table itself).
_STAGE_OUT = {
    "Mixed_3b": 256, "Mixed_3c": 480,
    "Mixed_4b": 512, "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 528,
    "Mixed_4f": 832, "Mixed_5b": 832, "Mixed_5c": 1024,
}


def _synthetic_state_dict(rng, in_channels=3):
    """Random full-size torch-layout state dict with the TRUE I3D shapes
    (``in_channels=2`` builds the FLOW-stream stem)."""
    sd = {}

    def unit(prefix, cin, cout, k, bn=True, bias=False):
        sd[f"{prefix}.conv3d.weight"] = rng.randn(cout, cin, *k).astype(np.float32) * 0.05
        if bias:
            sd[f"{prefix}.conv3d.bias"] = rng.randn(cout).astype(np.float32)
        if bn:
            sd[f"{prefix}.bn.weight"] = rng.rand(cout).astype(np.float32) + 0.5
            sd[f"{prefix}.bn.bias"] = rng.randn(cout).astype(np.float32) * 0.1
            sd[f"{prefix}.bn.running_mean"] = rng.randn(cout).astype(np.float32) * 0.1
            sd[f"{prefix}.bn.running_var"] = rng.rand(cout).astype(np.float32) + 0.5

    unit("Conv3d_1a_7x7", in_channels, 64, (7, 7, 7))
    unit("Conv3d_2b_1x1", 64, 64, (1, 1, 1))
    unit("Conv3d_2c_3x3", 64, 192, (3, 3, 3))
    cin = 192
    for name, ch in INCEPTION_CHANNELS:
        k1, k3 = (1, 1, 1), (3, 3, 3)
        unit(f"{name}.b0", cin, ch[0], k1)
        unit(f"{name}.b1a", cin, ch[1], k1)
        unit(f"{name}.b1b", ch[1], ch[2], k3)
        unit(f"{name}.b2a", cin, ch[3], k1)
        unit(f"{name}.b2b", ch[3], ch[4], k3)
        unit(f"{name}.b3b", cin, ch[5], k1)
        cin = _STAGE_OUT[name]  # independent constant, not sum(ch)
    unit("logits", 1024, 400, (1, 1, 1), bn=False, bias=True)
    return sd


def test_full_tower_converter_and_shapes():
    sd = _synthetic_state_dict(np.random.RandomState(3))
    params = convert_i3d(sd, with_logits=True)
    tower = I3DTower(with_logits=True)

    # shape-only trace (no FLOPs): converted params must drive the full
    # Kinetics classifier at the canonical clip shape
    out = jax.eval_shape(
        lambda p, x: tower.apply({"params": p}, x),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, jnp.float32), params),
        jax.ShapeDtypeStruct((2, 64, 224, 224, 3), jnp.float32),
    )
    assert out.shape == (2, 400)

    feat = jax.eval_shape(
        lambda p, x: I3DTower().apply({"params": p}, x),
        jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, jnp.float32),
            convert_i3d(sd)),
        jax.ShapeDtypeStruct((3, 64, 224, 224, 3), jnp.float32),
    )
    assert feat.shape == (3, FEATURE_DIM)


def test_full_tower_runs_small_clip():
    """One real forward at a reduced clip (T=16 keeps the temporal dims valid
    through the three stride-2 stages + the (2,..) avg pool)."""
    sd = _synthetic_state_dict(np.random.RandomState(4))
    params = jax.tree.map(jnp.asarray, convert_i3d(sd))
    x = np.random.RandomState(5).rand(1, 16, 224, 224, 3).astype(np.float32) * 2 - 1
    feats = I3DTower().apply({"params": params}, jnp.asarray(x))
    assert feats.shape == (1, FEATURE_DIM)
    assert bool(jnp.all(jnp.isfinite(feats)))


# --------------------------------------------------------------------------
# host-side preprocessing
# --------------------------------------------------------------------------


def test_preprocess_frames_range_and_shape():
    frames = np.random.RandomState(0).randint(0, 256, (5, 120, 160, 3), np.uint8)
    px = preprocess_i3d_frames(frames)
    assert px.shape == (5, 224, 224, 3)
    assert px.min() >= -1.0 and px.max() <= 1.0


def test_i3d_stacks_windows():
    frames = np.arange(130)[:, None, None, None] * np.ones((1, 2, 2, 3))
    s = i3d_stacks(frames, stack=64, step=64)
    assert s.shape == (2, 64, 2, 2, 3)
    assert s[0, 0, 0, 0, 0] == 0 and s[1, 0, 0, 0, 0] == 64


def test_i3d_stacks_short_video_loops():
    frames = np.arange(10)[:, None, None, None] * np.ones((1, 2, 2, 3))
    s = i3d_stacks(frames, stack=64, step=64)
    assert s.shape == (1, 64, 2, 2, 3)
    np.testing.assert_array_equal(s[0, :, 0, 0, 0],
                                  np.tile(np.arange(10), 7)[:64])


# --------------------------------------------------------------------------
# flow stream (round-4 VERDICT #7): host-side optical flow -> flow tower.
# Estimator is Farneback (TV-L1/PWC unavailable in this cv2 build) — a
# documented substitution (vct_tpu/i3d/flow.py); these tests pin the flow
# CONTRACT (displacement semantics, truncation/scaling, stack/tower fit),
# which is estimator-independent.
# --------------------------------------------------------------------------


def test_flow_static_scene_is_zero():
    frame = np.random.RandomState(0).randint(0, 256, (240, 320, 3), np.uint8)
    frames = np.stack([frame] * 4)
    flow = estimate_flow(frames)
    assert flow.shape == (3, 240, 320, 2)
    assert np.abs(flow).max() < 0.5  # no motion -> (near-)zero field


def test_flow_detects_translation():
    """Shift a textured image 3 px right: interior flow x ~ +3, y ~ 0."""
    rng = np.random.RandomState(1)
    base = rng.randint(0, 256, (200, 200), np.uint8)
    import cv2
    base = cv2.GaussianBlur(base, (7, 7), 2.0)  # texture flow can lock onto
    shifted = np.roll(base, 3, axis=1)
    frames = np.stack([np.stack([f] * 3, -1) for f in (base, shifted)])
    flow = estimate_flow(frames)
    inner = flow[0, 50:150, 50:150]
    assert abs(np.median(inner[..., 0]) - 3.0) < 1.0, np.median(inner[..., 0])
    assert abs(np.median(inner[..., 1])) < 1.0


def test_flow_preprocess_contract():
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, (6, 120, 160, 3), np.uint8)
    fx = preprocess_i3d_flow(frames)
    assert fx.shape == (5, 224, 224, 2)  # T-1 fields, crop geometry, C=2
    assert fx.min() >= -1.0 and fx.max() <= 1.0  # +/-20 px truncation /20
    # stacks accept C=2 and the FLOW tower (2-channel stem) consumes them
    clips = i3d_stacks(fx, stack=16, step=16)
    assert clips.shape[-1] == 2
    sd = _synthetic_state_dict(np.random.RandomState(6), in_channels=2)
    params = jax.tree.map(jnp.asarray, convert_i3d(sd))
    feats = I3DTower().apply({"params": params}, jnp.asarray(clips[:1]))
    assert feats.shape == (1, FEATURE_DIM)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_flow_needs_two_frames():
    with pytest.raises(ValueError, match="at least 2"):
        estimate_flow(np.zeros((1, 64, 64, 3), np.uint8))


def test_flow_from_cropped_single_frame_zero_field():
    """flow_from_cropped owns the degenerate-video tolerance (round-5
    review: the duplicate-frame guard lived copy-pasted at the call sites):
    one cropped frame -> one near-zero scaled flow field, while
    estimate_flow itself stays strict (pinned above)."""
    from vct_tpu.i3d import flow_from_cropped

    one = np.random.RandomState(0).randint(
        0, 255, (1, 224, 224, 3)).astype(np.uint8)
    f = flow_from_cropped(one)
    assert f.shape == (1, 224, 224, 2)
    assert f.dtype == np.float32
    # identical frames: Farneback leaves a tiny numerical residue on noise
    # textures (measured ~0.0025 scaled = 0.05 px), not exact zeros
    assert np.abs(f).max() < 0.01
