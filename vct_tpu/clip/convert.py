"""OpenAI/HF CLIP checkpoint → ``CLIPVisionTower`` Flax params.

The reference never ships CLIP weights in its checkpoints — the tower lives
in the ``video_features`` submodule / ``openai/clip`` dependency
(``TextEncoder.py:12-16``, ``predict_video.py:34-38``). This converter lets
the TPU build load the same published ViT-B/32 weights, from either:

* an OpenAI-format state_dict (``clip.load('ViT-B/32')`` → keys
  ``visual.conv1.weight`` …), or
* a HuggingFace ``CLIPVisionModelWithProjection`` state_dict (keys
  ``vision_model.embeddings.patch_embedding.weight`` …).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_clip_state_dict(path: str) -> Dict[str, np.ndarray]:
    """CLIP weights from ``.npz`` (numpy archive) or a torch ``.pt``/``.bin``
    state dict — the one loading branch shared by the vision (-v CLI) and
    text (matching task) paths."""
    if path.endswith(".npz"):
        return {k: np.asarray(v) for k, v in np.load(path).items()}
    from vct_tpu.convert import load_torch_state_dict

    return load_torch_state_dict(path)


def _conv_to_patch_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv1 weight [width, 3, p, p] -> matmul kernel [p*p*3, width].

    The tower patchifies to (p_h, p_w, channel)-flattened vectors
    (``vision.py`` patchify), so the conv kernel reorders to match.
    """
    return np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])


def _from_openai(sd: Dict[str, np.ndarray], layers: int) -> Dict:
    g = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    params = {
        "patch_kernel": _conv_to_patch_kernel(g("visual.conv1.weight")),
        "class_embedding": g("visual.class_embedding"),
        "positional_embedding": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
        "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
        params[f"resblocks_{i}"] = {
            "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
            "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
            "attn": {
                "in_proj_kernel": g(f"{p}.attn.in_proj_weight").T,
                "in_proj_bias": g(f"{p}.attn.in_proj_bias"),
                "out_proj": {
                    "kernel": g(f"{p}.attn.out_proj.weight").T,
                    "bias": g(f"{p}.attn.out_proj.bias"),
                },
            },
            "mlp_fc": {
                "kernel": g(f"{p}.mlp.c_fc.weight").T,
                "bias": g(f"{p}.mlp.c_fc.bias"),
            },
            "mlp_proj": {
                "kernel": g(f"{p}.mlp.c_proj.weight").T,
                "bias": g(f"{p}.mlp.c_proj.bias"),
            },
        }
    return params


def _hf_to_openai(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename HF CLIPVisionModelWithProjection keys to OpenAI-format keys."""
    out: Dict[str, np.ndarray] = {}
    ren = {
        "vision_model.embeddings.patch_embedding.weight": "visual.conv1.weight",
        "vision_model.embeddings.class_embedding": "visual.class_embedding",
        "vision_model.embeddings.position_embedding.weight": "visual.positional_embedding",
        "vision_model.pre_layrnorm.weight": "visual.ln_pre.weight",  # (sic) HF typo
        "vision_model.pre_layrnorm.bias": "visual.ln_pre.bias",
        "vision_model.post_layernorm.weight": "visual.ln_post.weight",
        "vision_model.post_layernorm.bias": "visual.ln_post.bias",
    }
    qkv: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k in ren:
            out[ren[k]] = v
            continue
        if k == "visual_projection.weight":
            out["visual.proj"] = v.T  # HF Linear [512,768] -> OpenAI [768,512]
            continue
        if k.startswith("vision_model.encoder.layers."):
            parts = k.split(".")
            i, rest = parts[3], ".".join(parts[4:])
            p = f"visual.transformer.resblocks.{i}"
            leaf = {
                "layer_norm1.weight": f"{p}.ln_1.weight",
                "layer_norm1.bias": f"{p}.ln_1.bias",
                "layer_norm2.weight": f"{p}.ln_2.weight",
                "layer_norm2.bias": f"{p}.ln_2.bias",
                "mlp.fc1.weight": f"{p}.mlp.c_fc.weight",
                "mlp.fc1.bias": f"{p}.mlp.c_fc.bias",
                "mlp.fc2.weight": f"{p}.mlp.c_proj.weight",
                "mlp.fc2.bias": f"{p}.mlp.c_proj.bias",
                "self_attn.out_proj.weight": f"{p}.attn.out_proj.weight",
                "self_attn.out_proj.bias": f"{p}.attn.out_proj.bias",
            }
            if rest in leaf:
                out[leaf[rest]] = v
            elif rest.startswith("self_attn."):  # q/k/v_proj -> packed in_proj
                which, leaf_name = rest.split(".")[1], rest.split(".")[2]
                qkv.setdefault(f"{p}|{leaf_name}", {})[which] = v
    for key, parts in qkv.items():
        p, leaf_name = key.split("|")
        stacked = np.concatenate(
            [parts["q_proj"], parts["k_proj"], parts["v_proj"]], axis=0
        )
        out[f"{p}.attn.in_proj_{'weight' if leaf_name == 'weight' else 'bias'}"] = stacked
    return out


def convert_clip(sd: Dict[str, np.ndarray], layers: int = 12) -> Dict:
    """state_dict (OpenAI or HF format, numpy values) -> flax params dict."""
    if "visual.conv1.weight" not in sd and any(
        k.startswith("vision_model.") for k in sd
    ):
        sd = _hf_to_openai(sd)
    return _from_openai(sd, layers)
