"""Torch I3D checkpoint -> Flax ``I3DTower`` params.

Source layout: the standard Kinetics InceptionI3d state dict used by the
``video_features`` submodule the reference delegates to
(``/root/reference/predict_video.py:157`` declares ``--feat_type I3D``; the
submodule wraps the piergiaj/pytorch-i3d port of the DeepMind weights).
Keys look like::

    Conv3d_1a_7x7.conv3d.weight                       [out, in, kt, kh, kw]
    Conv3d_1a_7x7.bn.{weight,bias,running_mean,running_var}
    Mixed_3b.b0.conv3d.weight    Mixed_3b.b1a...b1b...b2a...b2b...b3b...
    logits.conv3d.{weight,bias}

Transforms (pure layout, no renaming logic beyond the table):

* conv kernels ``[O, I, kt, kh, kw]`` -> Flax NDHWC ``[kt, kh, kw, I, O]``,
* eval-mode BatchNorm folded to the tower's per-channel affine:
  ``scale = gamma / sqrt(running_var + eps)``,
  ``offset = beta - running_mean * scale`` (torch BN eps 1e-3 — the I3D
  ports construct ``nn.BatchNorm3d(out, eps=0.001)``),
* the Kinetics logits conv (no BN) keeps its bias.

``tests/test_i3d.py`` pins the conversion against an eval-mode torch replica
built from the same state dict.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vct_tpu.i3d.model import INCEPTION_CHANNELS

BN_EPS = 1e-3

_STEM = ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3")
_BRANCHES = ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")


def load_i3d_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pt``/``.pth`` torch state dict (or ``.npz``) to numpy."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _unit(sd: Dict[str, np.ndarray], prefix: str, with_bn: bool = True) -> Dict:
    out: Dict[str, np.ndarray] = {
        "conv": {"kernel": _conv_kernel(sd[f"{prefix}.conv3d.weight"])}
    }
    if f"{prefix}.conv3d.bias" in sd:
        out["conv"]["bias"] = np.asarray(sd[f"{prefix}.conv3d.bias"])
    if with_bn:
        gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
        beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
        mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
        var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
        scale = gamma / np.sqrt(var + BN_EPS)
        out["scale"] = scale
        out["offset"] = beta - mean * scale
    return out


def convert_i3d(sd: Dict[str, np.ndarray], with_logits: bool = False) -> Dict:
    """Torch InceptionI3d state dict -> ``I3DTower`` params pytree (numpy)."""
    params: Dict = {}
    for name in _STEM:
        params[name] = _unit(sd, name)
    for name, _ in INCEPTION_CHANNELS:
        params[name] = {b: _unit(sd, f"{name}.{b}") for b in _BRANCHES}
    if with_logits:
        params["logits"] = _unit(sd, "logits", with_bn=False)
    return params
