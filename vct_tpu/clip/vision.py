"""Flax CLIP ViT-B/32 image tower — the on-TPU replacement for the
reference's feature-extraction dependency.

The reference obtains frame features by shelling into the ``video_features``
submodule (``ExtractCLIP``, PyTorch CLIP on GPU, ``predict_video.py:34-38``)
or offline preprocessing (``README.md:94-96``). Here the tower is a jittable
Flax module so frame encoding fuses with the captioner into one XLA program
(BASELINE.json north star: decode + CLIP + captioner in a single path).

Architecture (OpenAI CLIP visual, ViT-B/32): 32x32 non-overlapping patch
embed (conv = one matmul on TPU), class token, learned positional embedding,
pre-norm transformer (width 768, 12 layers, 12 heads, QuickGELU), ln_post on
the class token, linear projection to the 512-d joint space — the embedding
the CLIP4Clip features in the shipped configs contain (E=512,
``configs/...msvd_config.json:6``). Weights load from OpenAI/HF checkpoints
via ``vct_tpu.clip.convert_clip``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

IMAGE_SIZE = 224
# CLIP preprocessing constants (OpenAI _transform)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """Packed-QKV MHA, pre-norm residual style. ``mask`` is an optional
    additive [Tq, Tk] bias (the text tower's causal mask; images pass none)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        w = self.width
        in_kernel = self.param("in_proj_kernel", nn.initializers.xavier_uniform(), (w, 3 * w), jnp.float32)
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * w,), jnp.float32)
        qkv = x @ in_kernel.astype(self.dtype) + in_bias.astype(self.dtype)
        b, t, _ = x.shape
        d = w // self.heads
        q, k, v = (
            qkv[..., :w].reshape(b, t, self.heads, d),
            qkv[..., w : 2 * w].reshape(b, t, self.heads, d),
            qkv[..., 2 * w :].reshape(b, t, self.heads, d),
        )
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(d, jnp.float32))
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        weights = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(self.dtype), v)
        out = out.reshape(b, t, w)
        return nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class CLIPBlock(nn.Module):
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        h = CLIPAttention(self.width, self.heads, self.dtype, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln_1", **mk)(x), mask
        )
        x = x + h
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2", **mk)(x)
        y = nn.Dense(self.width * 4, name="mlp_fc", **mk)(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, name="mlp_proj", **mk)(y)
        return x + y


class CLIPVisionTower(nn.Module):
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch: int = 32
    out_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images [B, 224, 224, 3] (CLIP-normalized) -> [B, out_dim]."""
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        b = images.shape[0]
        grid = IMAGE_SIZE // self.patch

        # patchify as one matmul: [B, gh, p, gw, p, 3] -> [B, gh*gw, p*p*3]
        x = images.astype(self.dtype).reshape(b, grid, self.patch, grid, self.patch, 3)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid * grid, self.patch * self.patch * 3)
        patch_kernel = self.param(
            "patch_kernel",
            nn.initializers.lecun_normal(),
            (self.patch * self.patch * 3, self.width),
            jnp.float32,
        )
        x = x @ patch_kernel.astype(self.dtype)  # conv1 has no bias in CLIP

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (grid * grid + 1, self.width),
            jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", **mk)(x)
        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, self.dtype, name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post", **mk)(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(0.02), (self.width, self.out_dim), jnp.float32
        )
        return x @ proj.astype(self.dtype)


def preprocess_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB frames [T, H, W, 3] -> CLIP-normalized [T, 224, 224, 3].

    Resize shorter side to 224 (bilinear) + center crop, then per-channel
    normalize — the OpenAI ``_transform`` pipeline (bicubic there; bilinear
    here via cv2, a sub-1e-2 pixel difference that does not move captions).
    """
    import cv2

    out = np.empty((len(frames), IMAGE_SIZE, IMAGE_SIZE, 3), np.float32)
    for i, f in enumerate(frames):
        h, w = f.shape[:2]
        scale = IMAGE_SIZE / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        r = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
        top, left = (nh - IMAGE_SIZE) // 2, (nw - IMAGE_SIZE) // 2
        crop = r[top : top + IMAGE_SIZE, left : left + IMAGE_SIZE]
        out[i] = crop.astype(np.float32) / 255.0
    return (out - CLIP_MEAN) / CLIP_STD
