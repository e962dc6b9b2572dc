"""PyTorch checkpoint -> vct_tpu Flax variables converter.

Implements the weight-port spec from SURVEY.md Appendix B: the reference's
``state_dict`` keys (``/root/reference/model/*``, e.g.
``cap_decoder.decoder.layers.0.self_attn.in_proj_weight``) map mechanically
onto vct_tpu's parameter tree. Loads are lenient like every reference load
site (``strict=False`` at ``train.py:215``, ``eval.py:149``,
``predict_video.py:122``): missing source keys keep the initialized value,
extra source keys are ignored — both are reported.

Also includes the reference's special importers:
  * ``import_bert_embeddings`` (``MMT4Caption.py:213-220``)
  * ``import_univl_decoder``  (``MMT4Caption.py:222-283``)
both expressed as plain key-remaps into the same pipeline.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# state-dict loading (host-side; torch used only if available)
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth`` state_dict to numpy. Requires torch on the host (the
    baked-in CPU torch suffices); TPU never sees torch."""
    import torch

    raw = torch.load(path, map_location="cpu")
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        k = k[len("module.") :] if k.startswith("module.") else k  # DDP prefix
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# key translation
# ---------------------------------------------------------------------------

# flax module-path element -> torch module-path element
_MODULE_RULES = [
    (re.compile(r"^(layers|unify|transformer_encoders|trans_enc_layers)_(\d+)$"), r"\1.\2"),
    (re.compile(r"^pre_norm$"), "norm"),  # MME do_norm LayerNorm (MMEncoder.py:241)
]

# (flax leaf name) -> (torch leaf name, needs 2D transpose)
_LEAF_RULES = {
    "kernel": ("weight", True),
    "scale": ("weight", False),  # LayerNorm
    "bias": ("bias", False),
    "in_proj_kernel": ("in_proj_weight", True),
    "in_proj_bias": ("in_proj_bias", False),
    "weight_ih": ("weight_ih_l0", True),
    "weight_hh": ("weight_hh_l0", True),
    "bias_ih": ("bias_ih_l0", False),
    "bias_hh": ("bias_hh_l0", False),
    "pos_embedding": ("pos_embedding", False),
}


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[Tuple[str, bool]]:
    """Translate a flax param path to the reference state_dict key."""
    parts: List[str] = []
    reverse_gru = False
    for p in path[:-1]:
        if p == "agg_reverse":
            # torch biGRU stores reverse weights as <name>_l0_reverse on the
            # same module, not a separate submodule.
            parts.append("agg")
            reverse_gru = True
            continue
        if p == "modal_emb" and path[-1] == "embedding":
            parts.append("modal_emb.modal_emb")
            continue
        if p == "temp_emb" and path[-1] == "embedding":
            parts.append("temp_emb.embedding")
            continue
        for rx, repl in _MODULE_RULES:
            m = rx.match(p)
            if m:
                p = rx.sub(repl, p)
                break
        parts.append(p)

    leaf = path[-1]
    if leaf == "tgt_to_emb":  # direct param: cap_decoder.tgt_to_emb.weight
        parts.append("tgt_to_emb")
        leaf_name, transpose = "weight", False
    elif leaf == "embedding":  # nn.Embed tables
        leaf_name, transpose = "weight", False
    elif leaf == "temperature":  # matching temperature lives in loss_fn
        parts.append("loss_fn")
        leaf_name, transpose = "temperature", False
    elif leaf in _LEAF_RULES:
        leaf_name, transpose = _LEAF_RULES[leaf]
    else:
        return None
    if reverse_gru:
        leaf_name += "_reverse"  # torch: weight_ih_l0_reverse etc.
    return ".".join(parts + [leaf_name]), transpose


def _walk(tree: Any, path: Tuple[str, ...] = ()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _set_in(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def convert_state_dict(
    variables: Dict[str, Any],
    state_dict: Dict[str, np.ndarray],
    *,
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Fill initialized flax ``variables`` ({'params': ..., 'buffers': ...})
    from a reference state_dict. Returns (new_variables, report) where report
    has 'missing' (flax leaves not found in the checkpoint) and 'unexpected'
    (checkpoint keys never consumed) — mirroring torch's strict=False report.
    """
    # rebuild as plain nested dicts (copy; the originals stay untouched)
    def to_dict(t):
        return {k: to_dict(v) for k, v in t.items()} if isinstance(t, dict) else t

    new_vars = {c: to_dict(v) for c, v in variables.items()}

    used = set()
    missing: List[str] = []
    for collection in ("params", "buffers"):
        if collection not in new_vars:
            continue
        for path, leaf in _walk(new_vars[collection]):
            translated = _flax_path_to_torch_key(path)
            if translated is None:
                missing.append(f"{collection}/" + "/".join(path))
                continue
            key, transpose = translated
            key = prefix + key
            if key not in state_dict:
                missing.append(key)
                continue
            arr = np.asarray(state_dict[key])
            if transpose:
                arr = arr.T
            if arr.shape != leaf.shape:
                if (
                    path[-1] == "pos_embedding"
                    and arr.ndim == leaf.ndim == 2
                    and arr.shape[1] == leaf.shape[1]
                    and arr.shape[0] < leaf.shape[0]
                ):
                    # real BERT/UniVL position tables are (512, E) while the
                    # model's buffer is (5000, E) (decoder PE maxlen,
                    # reference Embedding.py:11). The reference REBINDS the
                    # buffer to the shorter table (MMT4Caption.py:220,281);
                    # flax buffers keep their shape, so write the imported
                    # rows over the first 512 — identical for every decode
                    # length <= 512 (rows past that stay sinusoidal where
                    # the reference would index-error).
                    merged = np.asarray(leaf).copy()
                    merged[: arr.shape[0]] = arr
                    arr = merged
                else:
                    raise ValueError(
                        f"shape mismatch for {key}: checkpoint {arr.shape} "
                        f"vs model {leaf.shape}"
                    )
            _set_in(new_vars[collection], path, jnp.asarray(arr, dtype=leaf.dtype))
            used.add(key)

    unexpected = [k for k in state_dict if k not in used]
    return new_vars, {"missing": missing, "unexpected": unexpected}


# ---------------------------------------------------------------------------
# special importers (reference MMT4Caption.py:213-283)
# ---------------------------------------------------------------------------


def import_bert_embeddings(
    variables: Dict[str, Any], bert_state: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    """``load_embedding_from_bert``: word embeddings -> tgt_to_emb, position
    embeddings -> positional_encoding buffer (``MMT4Caption.py:213-220``)."""
    remap = {
        "cap_decoder.tgt_to_emb.weight": bert_state["embeddings.word_embeddings.weight"],
        "cap_decoder.positional_encoding.pos_embedding": bert_state[
            "embeddings.position_embeddings.weight"
        ],
    }
    new_vars, _ = convert_state_dict(variables, remap)
    return new_vars


def univl_to_reference_keys(univl: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """UniVL decoder checkpoint -> reference cap_decoder key space, following
    the mapping table at ``MMT4Caption.py:226-281`` (separate q/k/v weights are
    concatenated into the packed in_proj layout)."""
    out: Dict[str, np.ndarray] = {}
    n_layers = 0
    while f"decoder.decoder.layer.{n_layers}.slf_attn.att.query.weight" in univl:
        n_layers += 1
    for l in range(n_layers):
        for wb in ("weight", "bias"):
            for ours, theirs in (("self_attn", "slf_attn"), ("multihead_attn", "enc_attn")):
                out[f"cap_decoder.decoder.layers.{l}.{ours}.in_proj_{wb}"] = np.concatenate(
                    [
                        univl[f"decoder.decoder.layer.{l}.{theirs}.att.query.{wb}"],
                        univl[f"decoder.decoder.layer.{l}.{theirs}.att.key.{wb}"],
                        univl[f"decoder.decoder.layer.{l}.{theirs}.att.value.{wb}"],
                    ],
                    axis=0,
                )
                out[f"cap_decoder.decoder.layers.{l}.{ours}.out_proj.{wb}"] = univl[
                    f"decoder.decoder.layer.{l}.{theirs}.output.dense.{wb}"
                ]
            out[f"cap_decoder.decoder.layers.{l}.norm1.{wb}"] = univl[
                f"decoder.decoder.layer.{l}.slf_attn.output.LayerNorm.{wb}"
            ]
            out[f"cap_decoder.decoder.layers.{l}.norm2.{wb}"] = univl[
                f"decoder.decoder.layer.{l}.enc_attn.output.LayerNorm.{wb}"
            ]
            out[f"cap_decoder.decoder.layers.{l}.linear1.{wb}"] = univl[
                f"decoder.decoder.layer.{l}.intermediate.dense.{wb}"
            ]
            out[f"cap_decoder.decoder.layers.{l}.linear2.{wb}"] = univl[
                f"decoder.decoder.layer.{l}.output.dense.{wb}"
            ]
            out[f"cap_decoder.decoder.layers.{l}.norm3.{wb}"] = univl[
                f"decoder.decoder.layer.{l}.output.LayerNorm.{wb}"
            ]
    for wb in ("weight", "bias"):
        out[f"cap_decoder.decoder.norm.{wb}"] = univl[f"decoder.embeddings.LayerNorm.{wb}"]
    out["cap_decoder.generator.weight"] = univl[
        "decoder.classifier.cls.predictions.decoder.weight"
    ]
    out["cap_decoder.generator.bias"] = univl["decoder.classifier.cls.predictions.bias"]
    out["cap_decoder.tgt_to_emb.weight"] = univl["decoder.embeddings.word_embeddings.weight"]
    out["cap_decoder.positional_encoding.pos_embedding"] = univl[
        "decoder.embeddings.position_embeddings.weight"
    ]
    return out


def import_univl_decoder(
    variables: Dict[str, Any], univl: Dict[str, np.ndarray]
) -> Dict[str, Any]:
    new_vars, _ = convert_state_dict(variables, univl_to_reference_keys(univl))
    return new_vars
