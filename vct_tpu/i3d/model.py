"""Flax I3D (Inflated 3D Inception-v1) video tower — the I3D arm of the
reference's feature-extraction dependency.

The reference CLI declares ``--feat_type {CLIP, I3D, CLIP4CLIP-ViT-B-32}``
(``/root/reference/predict_video.py:157``) and delegates extraction to the
``video_features`` submodule (an empty stub in the repo; upstream it wraps the
standard Kinetics-400 InceptionI3d). This module re-implements that tower
TPU-first:

* **NDHWC layout** (channels-last) — XLA's native TPU conv layout; every
  Conv3D lowers onto the MXU without transposes.
* **Inference-only BatchNorm folded to a per-channel affine**: the converter
  (``vct_tpu.i3d.convert``) precomputes ``scale = gamma / sqrt(var + eps)``
  and ``offset = beta - mean * scale``, so eval-mode BN costs one fused
  multiply-add that XLA folds into the conv epilogue.
* ``padding="SAME"`` everywhere — identical to the TF-style ``compute_pad``
  the torch implementation mimics (zero-pad before max-pool is equivalent to
  -inf-pad because every pooled input is post-ReLU, hence >= 0).

Architecture (Kinetics-400 I3D, RGB stream): 7x7x7/2 stem, two conv blocks,
nine Inception modules (Mixed_3b..Mixed_5c), with max-pools between stages;
features = spatially+temporally averaged Mixed_5c output (1024-d per clip),
matching the ``video_features`` I3D contract of one 1024-vector per
64-frame stack. An optional Kinetics logits head is kept for conversion
checks. Flow stream weights load the same way (first-layer in-channels 2),
but flow *estimation* (RAFT/PWC) is out of scope — documented deviation; the
shipped configs never use I3D features (``configs/*.json`` are CLIP4CLIP).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

FEATURE_DIM = 1024
NUM_KINETICS_CLASSES = 400
# video_features' I3D clip geometry: 64-frame stacks, stride 64, 224x224.
STACK_SIZE = 64
STEP_SIZE = 64
IMAGE_SIZE = 224

# (name, [b0, b1a, b1b, b2a, b2b, b3b]) output channels per Inception branch.
# Standard Inception-v1 table; concat order b0 | b1b | b2b | b3b.
INCEPTION_CHANNELS: Tuple[Tuple[str, Tuple[int, ...]], ...] = (
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
)


class Unit3D(nn.Module):
    """Conv3D + (folded) BatchNorm affine + ReLU — the I3D building block.

    BN rides as explicit per-channel ``scale``/``offset`` params (computed
    from the torch running stats at conversion time), exactly eval-mode BN on
    a bias-free conv. The classifier head sets ``use_bn=False, use_bias=True,
    activation=False`` (torch ``Unit3D`` logits configuration).
    """

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    activation: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=tuple(self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_bn:
            scale = self.param("scale", nn.initializers.ones,
                               (self.features,), jnp.float32)
            offset = self.param("offset", nn.initializers.zeros,
                                (self.features,), jnp.float32)
            x = x * scale.astype(self.dtype) + offset.astype(self.dtype)
        if self.activation:
            x = jax.nn.relu(x)
        return x


def _max_pool(x: jnp.ndarray, kernel: Sequence[int],
              stride: Sequence[int]) -> jnp.ndarray:
    return nn.max_pool(x, tuple(kernel), strides=tuple(stride), padding="SAME")


class InceptionModule(nn.Module):
    """Four-branch Inception block: 1x1 | 1x1->3x3 | 1x1->3x3 | pool->1x1.
    Branch names b0/b1a/b1b/b2a/b2b/b3b follow the torch checkpoint layout so
    the converter is a pure key transpose."""

    channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3b)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        k3 = (3, 3, 3)
        b0 = Unit3D(c[0], dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(c[1], dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(c[2], k3, dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(c[3], dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(c[4], k3, dtype=self.dtype, name="b2b")(b2)
        b3 = _max_pool(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c[5], dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3DTower(nn.Module):
    """Kinetics I3D backbone. ``__call__`` returns 1024-d clip features
    (one vector per input clip); ``logits`` adds the Kinetics-400 head.

    Input: ``[B, T, H, W, C]`` float (T=64, H=W=224, C=3 RGB / 2 flow),
    pixel range [-1, 1] (``preprocess_i3d_frames``).
    """

    dtype: Dtype = jnp.float32
    with_logits: bool = False
    num_classes: int = NUM_KINETICS_CLASSES

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = _max_pool(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_2a_3x3
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _max_pool(x, (1, 3, 3), (1, 2, 2))  # MaxPool3d_3a_3x3
        for name, ch in INCEPTION_CHANNELS:
            if name == "Mixed_4b":
                x = _max_pool(x, (3, 3, 3), (2, 2, 2))  # MaxPool3d_4a_3x3
            elif name == "Mixed_5b":
                x = _max_pool(x, (2, 2, 2), (2, 2, 2))  # MaxPool3d_5a_2x2
            x = InceptionModule(ch, dtype=self.dtype, name=name)(x)
        # torch: AvgPool3d((2, 7, 7), stride=1) -> mean over remaining time.
        # Spatial dims are exactly 7x7 at 224 input, so pool == full spatial
        # mean; the (2,)-window temporal pool followed by a mean equals a
        # plain temporal mean up to edge-window weighting — video_features
        # averages to ONE vector per stack either way, and we match that
        # contract with the exact same two-stage reduction.
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        feats = jnp.mean(x, axis=(1, 2, 3))  # [B, 1024] fp32 clip feature
        if not self.with_logits:
            return feats.astype(jnp.float32)
        logits = Unit3D(self.num_classes, use_bn=False, use_bias=True,
                        activation=False, dtype=self.dtype, name="logits")(x)
        return jnp.mean(logits, axis=(1, 2, 3)).astype(jnp.float32)


def resize_center_crop(frames: np.ndarray) -> np.ndarray:
    """uint8 [T, H, W, 3] -> uint8 [T, 224, 224, 3]: resize short side to
    256, center-crop 224 (the I3D geometric transform, shared by the RGB
    scaling below and the flow arm in ``i3d.flow``). Host-side; cv2 only
    imported here."""
    import cv2

    # buffer keeps the input dtype: cv2.resize preserves it, and forcing
    # uint8 would silently truncate/wrap float-frame callers
    out = np.empty((len(frames), IMAGE_SIZE, IMAGE_SIZE, 3), frames.dtype)
    for i, f in enumerate(frames):
        h, w = f.shape[:2]
        s = 256.0 / min(h, w)
        nh, nw = int(round(h * s)), int(round(w * s))
        r = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
        top, left = (nh - IMAGE_SIZE) // 2, (nw - IMAGE_SIZE) // 2
        out[i] = r[top:top + IMAGE_SIZE, left:left + IMAGE_SIZE]
    return out


def scale_i3d_frames(cropped: np.ndarray) -> np.ndarray:
    """Cropped uint8 [T, 224, 224, 3] -> float32 in [-1, 1] — the I3D RGB
    scaling, split from the geometric transform so one-pass extractors can
    crop once and feed both streams (single source of the /127.5-1 formula)."""
    return cropped.astype(np.float32) / 127.5 - 1.0


def preprocess_i3d_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB [T, H, W, 3] -> float32 [T, 224, 224, 3] in [-1, 1]
    (video_features' I3D transform: resize short side to 256, center-crop
    224, scale to [-1, 1])."""
    return scale_i3d_frames(resize_center_crop(frames))


def i3d_stacks(frames: np.ndarray, stack: int = STACK_SIZE,
               step: int = STEP_SIZE) -> np.ndarray:
    """[T, H, W, C] frames -> [n_stacks, stack, H, W, C] clips (the
    video_features stacking: consecutive ``stack``-frame windows at stride
    ``step``; a video shorter than one stack is looped to fill it, so every
    video yields at least one clip)."""
    t = len(frames)
    if t == 0:
        raise ValueError("no frames to stack")
    if t < stack:
        reps = -(-stack // t)
        frames = np.concatenate([frames] * reps)[:stack]
        t = stack
    n = 1 + (t - stack) // step
    return np.stack([frames[i * step:i * step + stack] for i in range(n)])
