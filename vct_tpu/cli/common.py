"""Shared CLI plumbing: device selection, config/checkpoint loading, model
construction — the reference's ``utils.configure_hardware`` + load-site
boilerplate (``utils.py:126-149``, ``eval.py:147-151``)."""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Tuple

import numpy as np

from vct_tpu.config import Config, load_config  # noqa: F401  (re-export for CLIs)


def add_device_args(parser: argparse.ArgumentParser, required: bool = False) -> None:
    """Reference device flags (``--cpu``/``--gpu``; ``train.py:298-301``).

    On this stack they pick the JAX platform: ``--cpu`` forces the host CPU
    backend, ``--gpu``/``--tpu`` mean "the accelerator" (TPU here — the flag
    name is kept for CLI compatibility). Default: whatever JAX picks.
    """
    group = parser.add_mutually_exclusive_group(required=required)
    group.add_argument("--cpu", action="store_true", help="run on host CPU")
    group.add_argument("--gpu", action="store_true",
                       help="run on the accelerator (compat alias for --tpu)")
    group.add_argument("--tpu", action="store_true", help="run on TPU")
    group.add_argument("--multi_gpu", action="store_true",
                       help="data-parallel over all chips (compat alias; "
                            "multi-chip is the default via the device mesh)")


def configure_hardware(args: argparse.Namespace) -> None:
    """Apply device flags. Must run before any JAX backend use."""
    if getattr(args, "cpu", False):
        import jax

        jax.config.update("jax_platforms", "cpu")
    from vct_tpu.utils import enable_compilation_cache

    enable_compilation_cache()


def make_trainer_pieces(cfg: Config):
    """(model, tokenizer, variables) for inference CLIs — no optimizer."""
    import jax
    import jax.numpy as jnp

    from vct_tpu.models.mmt4caption import MMT4Caption
    from vct_tpu.text.tokenizer import make_tokenizer

    tokenizer = make_tokenizer(cfg.tpu.vocab_path, cfg.model.tokenizer)
    model_cfg = cfg.model
    if (model_cfg.vocab_size != tokenizer.vocab_size
            or model_cfg.pad_id != tokenizer.pad_id):
        import dataclasses

        # pad_id from the tokenizer's [PAD] lookup, like the reference
        # (model/MMT4Caption.py:38) — see Trainer.__init__
        model_cfg = dataclasses.replace(
            model_cfg, vocab_size=tokenizer.vocab_size,
            pad_id=tokenizer.pad_id)
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.tpu.dtype]
    model = MMT4Caption(model_cfg, cfg.tpu, dtype=dtype)

    feats = [jnp.zeros((1, cfg.tpu.max_frames, d), jnp.float32) for d in model_cfg.modal_shape]
    masks = [jnp.zeros((1, cfg.tpu.max_frames), bool) for _ in model_cfg.modal_shape]
    caps = jnp.full((1, cfg.tpu.max_caption_len), 0, jnp.int32).at[:, 0].set(101)
    variables = model.init(jax.random.PRNGKey(cfg.tpu.seed), feats, masks, caps,
                           caps == 0, method=MMT4Caption.caption_loss)
    return model, tokenizer, variables


def memory_mask_advisory(cfg: Config) -> str:
    """One-line parity note for reference ``.pth`` loads: vct_tpu's decoder
    masks padded memory slots by default, the reference never does
    (``CapDecoder.py:49-52``) — observable only when videos are shorter than
    ``tpu.max_frames``. Empty string when the quirk flag already matches."""
    if cfg is None or cfg.tpu.quirk_no_memory_mask_in_decoder:
        return ""
    return (
        "note: decoder cross-attention masks padded memory slots (a fix over "
        "the reference); for bit-parity evals with this .pth on videos "
        "shorter than max_frames set tpu.quirk_no_memory_mask_in_decoder=true"
    )


def load_checkpoint_into(variables, path: str, log=print, cfg: Config = None):
    """Load a ``.pth`` (reference format, converted) or orbax checkpoint.
    Lenient like every reference load site (``strict=False``)."""
    if path.endswith((".pth", ".pt", ".bin")):
        from vct_tpu.convert import convert_state_dict, load_torch_state_dict

        sd = load_torch_state_dict(path)
        variables, report = convert_state_dict(variables, sd)
        log(f"loaded {path}: missing={len(report['missing'])} "
            f"unexpected={len(report['unexpected'])}")
        advisory = memory_mask_advisory(cfg)
        if advisory:
            log(advisory)
        return variables
    from vct_tpu.train.state import restore_params_only

    variables = restore_params_only(path, variables)
    log(f"loaded orbax params from {path}")
    return variables


def load_feature_files(paths: List[str]) -> Tuple[List[np.ndarray], List[str]]:
    """``--features a.npy b.npy`` -> per-modality [1, T, E] arrays (reference
    ``predict_video.py:115-116``; (E, T) arrays auto-transposed like
    ``dataloader.py:382-385``)."""
    feats = []
    for p in paths:
        a = np.load(p).astype(np.float32)
        if a.ndim != 2:
            raise ValueError(f"{p}: expected 2-D (T, E) features, got {a.shape}")
        if a.shape[0] > a.shape[1]:  # stored (E, T) -> (T, E)
            a = a.T
        feats.append(a[None])
    return feats, paths


def print_scores(scores: Dict[str, float]) -> None:
    print(json.dumps({k: round(float(v), 4) for k, v in scores.items()}, indent=2))
