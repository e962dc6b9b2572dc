"""Fused video→caption inference: CLIP frame encoding + multi-modal encoder +
KV-cached greedy decode as ONE jitted XLA program.

The reference runs this as three separate systems — an ``ExtractCLIP``
subprocess for features (``predict_video.py:34-38``), then the captioner's
encoder, then a host-looped greedy decode (``MMT4Caption.py:146-184``). Here
the pixels→caption path is a single compiled program: XLA fuses the CLIP
tower's final projection into the captioner's input linear, nothing round-
trips to host between stages, and the whole thing batches over videos.

Host side keeps only what must be host work: video decode + frame sampling
(``vct_tpu.clip.frames``) and detokenization.
"""

from __future__ import annotations

import functools
from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.clip.vision import CLIPVisionTower, preprocess_frames
from vct_tpu.decode import greedy_generate
from vct_tpu.models.mmt4caption import MMT4Caption


# lru_cache keyed on the (hashable, frozen-dataclass) modules: repeated
# caption_videos calls reuse the SAME closure, so jax.jit's cache hits and the
# fused program compiles once per shape — not once per call.
@functools.lru_cache(maxsize=8)
def make_video_caption_fn(
    model: MMT4Caption,
    tower: CLIPVisionTower,
    *,
    max_len: int = 30,
    start_id: int = 101,
    end_id: int = 102,
    collect_attn: bool = False,
    beam_size: int = 0,
) -> Callable:
    """-> jit fn(variables, clip_params, pixels [N, T, 224, 224, 3]) ->
    (tokens [N, max_len], attn or None). One XLA program, pixels to tokens.
    ``beam_size > 1`` fuses beam search instead of greedy (the second return
    is then the per-video beam score; attention collection is greedy-only)."""
    if beam_size > 1 and collect_attn:
        raise ValueError("collect_attn is greedy-only; drop beam_size")

    @jax.jit
    def fn(variables, clip_params, pixels):
        n, t = pixels.shape[:2]
        flat = pixels.reshape((n * t,) + pixels.shape[2:])
        feats = tower.apply({"params": clip_params}, flat)
        feats = feats.reshape(n, t, feats.shape[-1]).astype(jnp.float32)
        masks = [jnp.zeros((n, t), bool)]
        if beam_size > 1:
            # fused beam kernels when eligible (same rules as the eval
            # path's make_auto_beam_fn — the shape checks are static here;
            # fast_numerics keeps decode on the module graph, see decode.py)
            if (
                model.tpu.use_pallas_attention
                and not model.tpu.fast_numerics
                and jax.default_backend() == "tpu"
            ):
                from vct_tpu.decode_fast import (
                    beam_generate_fused,
                    fused_beam_supported,
                )

                if fused_beam_supported(n, beam_size):
                    return beam_generate_fused(
                        model, variables, [feats], masks,
                        beam_size=beam_size, max_len=max_len,
                        start_id=start_id, end_id=end_id,
                    )
            from vct_tpu.decode import beam_generate

            return beam_generate(
                model, variables, [feats], masks,
                beam_size=beam_size, max_len=max_len,
                start_id=start_id, end_id=end_id,
            )
        if (
            not collect_attn
            and model.tpu.use_pallas_attention
            and not model.tpu.fast_numerics
            and jax.default_backend() == "tpu"
        ):
            from vct_tpu.decode_fast import (
                fused_decode_supported,
                greedy_generate_fused,
            )

            if fused_decode_supported(n):
                return greedy_generate_fused(
                    model, variables, [feats], masks,
                    max_len=max_len, start_id=start_id, end_id=end_id,
                )
        return greedy_generate(
            model, variables, [feats], masks,
            max_len=max_len, start_id=start_id, end_id=end_id,
            collect_attn=collect_attn,
        )

    return fn


def caption_videos(
    video_paths: List[str],
    *,
    model: MMT4Caption,
    tower: CLIPVisionTower,
    variables,
    clip_params,
    tokenizer,
    ext_type: str = "uni_12",
    max_len: int = 30,
) -> List[str]:
    """End-to-end batch: decode+sample frames on host, one fused device call,
    detokenize. All videos must yield the same frame count (uni_N/tsn_N do)."""
    from vct_tpu.clip.frames import sample_frames
    from vct_tpu.decode import detokenize_batch

    pixel_batches = []
    for p in video_paths:
        frames = sample_frames(p, ext_type)
        pixel_batches.append(preprocess_frames(frames))
    t = pixel_batches[0].shape[0]
    if any(pb.shape[0] != t for pb in pixel_batches):
        raise ValueError(
            f"fused batch needs a fixed frame count; use uni_N/tsn_N (got "
            f"{[pb.shape[0] for pb in pixel_batches]})"
        )
    pixels = jnp.asarray(np.stack(pixel_batches))
    fn = make_video_caption_fn(
        model, tower, max_len=max_len,
        start_id=tokenizer.start_id, end_id=tokenizer.end_id,
    )
    tokens, _ = fn(variables, clip_params, pixels)
    return detokenize_batch(tokenizer, tokens)
