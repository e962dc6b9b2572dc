"""Autoregressive caption decoding: greedy and beam search, fully jitted.

The reference's ``greedy_decode`` (``/root/reference/model/MMT4Caption.py:146-184``)
re-runs the complete decoder over the growing prefix every step (no KV cache,
``CapDecoder.py:70-78``) and syncs argmax results to Python each iteration —
O(L²·layers) compute plus a host round-trip per token. Here the whole
generation loop is ONE compiled XLA program: ``lax.while_loop`` over a
KV-cached single-token step, early exit when every sequence has emitted
[SEP] (the reference's ``sum(end_flag) >= batch_size`` break,
``MMT4Caption.py:171-172``).

Semantics preserved for metric parity:
  * start token [CLS], stop token [SEP] (``CapPreprocessor.py:13-15``),
  * already-finished rows keep receiving argmax tokens until all finish —
    truncation at the first [SEP] happens at detokenization
    (``MMT4Caption.py:174-183``, SURVEY.md quirk #7), which
    ``WordPieceTokenizer.decode_caption`` implements.

Beam search is new capability — the reference declares ``beam_decode`` and a
``--beam`` flag but implements neither (``MMT4Caption.py:186-187``,
``predict_video.py:170``).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from vct_tpu.models.mmt4caption import MMT4Caption

NEG_INF = -1.0e30


# ---------------------------------------------------------------------------
# greedy
# ---------------------------------------------------------------------------


def greedy_generate(
    model: MMT4Caption,
    variables,
    video_feats: Sequence[jnp.ndarray],
    video_masks: Optional[Sequence[jnp.ndarray]],
    *,
    max_len: int = 30,
    start_id: int = 101,
    end_id: int = 102,
    pad_id: Optional[int] = None,
    collect_attn: bool = False,
):
    """-> (tokens [B, max_len] int32, attn or None).

    attn (when collect_attn): [max_len-1, num_layers, B, T_mem] cross-attention
    of each generated token — the introspection ``predict_video.py:43-79``
    monkey-patches for.
    """
    if pad_id is None:
        # the model's configured [PAD] id (wired from the tokenizer by the
        # Trainer/make_trainer_pieces) — both decode paths must zero the
        # SAME token's embedding or the fused/module dispatch diverges
        pad_id = model.config.pad_id
    memory, mem_mask, _ = model.apply(
        variables, list(video_feats), list(video_masks) if video_masks else None,
        method=MMT4Caption.encode,
    )
    batch = memory.shape[0]
    caches = model.apply(
        variables, batch, max_len, memory, method=MMT4Caption.init_cache
    )

    tokens = jnp.full((batch, max_len), pad_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start_id)
    done = jnp.zeros((batch,), bool)

    n_layers = model.config.caption_decoder.layer
    t_mem = memory.shape[1]
    attn_buf = (
        jnp.zeros((max_len - 1, n_layers, batch, t_mem), jnp.float32)
        if collect_attn
        else jnp.zeros((1, 1, 1, 1), jnp.float32)
    )

    def cond(state):
        i, _, done, _, _ = state
        return jnp.logical_and(i < max_len - 1, ~jnp.all(done))

    def body(state):
        i, tokens, done, caches, attn_buf = state
        cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)[:, 0]
        logits, caches, attn = model.apply(
            variables, cur, caches, i, mem_mask,
            method=MMT4Caption.decode_step, return_attn=collect_attn,
        )
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], i + 1, axis=1
        )
        done = jnp.logical_or(done, nxt == end_id)
        if collect_attn:
            # attn: [L, B, 1, T_mem] -> store [L, B, T_mem] at step i
            attn_buf = jax.lax.dynamic_update_slice_in_dim(
                attn_buf, attn[:, :, 0, :][None].astype(jnp.float32), i, axis=0
            )
        return i + 1, tokens, done, caches, attn_buf

    _, tokens, _, _, attn_buf = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), tokens, done, caches, attn_buf)
    )
    return tokens, (attn_buf if collect_attn else None)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


def _flatten_beam(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x: jnp.ndarray, b: int, k: int) -> jnp.ndarray:
    return x.reshape((b, k) + x.shape[1:])


def _gather_beams(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x [B, K, ...], idx [B, K'] -> [B, K', ...]."""
    return jax.vmap(lambda xx, ii: xx[ii])(x, idx)


def beam_generate(
    model: MMT4Caption,
    variables,
    video_feats: Sequence[jnp.ndarray],
    video_masks: Optional[Sequence[jnp.ndarray]],
    *,
    beam_size: int = 4,
    max_len: int = 30,
    start_id: int = 101,
    end_id: int = 102,
    pad_id: Optional[int] = None,
    length_penalty: float = 0.6,
):
    """Fixed-width beam search -> (tokens [B, max_len], scores [B]).

    Finished beams are frozen: they can only emit [PAD] with log-prob 0, so
    their cumulative score is preserved while alive beams keep expanding.
    Final selection maximizes score / length**length_penalty (GNMT-style;
    ``length_penalty=0`` reduces to raw log-prob).
    """
    if pad_id is None:
        pad_id = model.config.pad_id  # see greedy_generate
    k = beam_size
    memory, mem_mask, _ = model.apply(
        variables, list(video_feats), list(video_masks) if video_masks else None,
        method=MMT4Caption.encode,
    )
    b, t_mem, e = memory.shape

    # replicate memory per beam: [B*K, T, E]
    memory_k = _flatten_beam(jnp.broadcast_to(memory[:, None], (b, k, t_mem, e)))
    mem_mask_k = None
    if mem_mask is not None:
        mem_mask_k = _flatten_beam(jnp.broadcast_to(mem_mask[:, None], (b, k, t_mem)))

    caches = model.apply(
        variables, b * k, max_len, memory_k, method=MMT4Caption.init_cache
    )

    tokens = jnp.full((b, k, max_len), pad_id, jnp.int32).at[:, :, 0].set(start_id)
    # only beam 0 is live initially (all beams are identical at step 0)
    scores = jnp.tile(
        jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32)[None], (b, 1)
    )
    finished = jnp.zeros((b, k), bool)
    lengths = jnp.ones((b, k), jnp.int32)  # token count incl. start

    vocab = model.config.vocab_size

    def cond(state):
        i, _, _, finished, _, _ = state
        return jnp.logical_and(i < max_len - 1, ~jnp.all(finished))

    def body(state):
        i, tokens, scores, finished, lengths, caches = state
        cur = jax.lax.dynamic_slice_in_dim(
            _flatten_beam(tokens), i, 1, axis=1
        )[:, 0]
        logits, caches, _ = model.apply(
            variables, cur, caches, i, mem_mask_k, method=MMT4Caption.decode_step
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        logp = _unflatten_beam(logp, b, k)  # [B, K, V]

        # frozen finished beams: only PAD continuation, at zero cost
        frozen = jnp.full((b, k, vocab), NEG_INF).at[:, :, pad_id].set(0.0)
        logp = jnp.where(finished[..., None], frozen, logp)

        cand = scores[..., None] + logp  # [B, K, V]
        flat = cand.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, k)  # [B, K]
        beam_idx = top_idx // vocab
        tok_idx = (top_idx % vocab).astype(jnp.int32)

        tokens = _gather_beams(tokens, beam_idx)
        finished = _gather_beams(finished, beam_idx)
        lengths = _gather_beams(lengths, beam_idx)

        def regather(c):
            return _flatten_beam(_gather_beams(_unflatten_beam(c, b, k), beam_idx))

        # only the self-attention cache depends on beam identity; the
        # cross-attention ck/cv were broadcast identically across beams at
        # init and never change — regathering them every token would be pure
        # wasted HBM traffic
        caches = tuple(
            {**layer, "k": regather(layer["k"]), "v": regather(layer["v"])}
            for layer in caches
        )

        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens.reshape(b * k, max_len), tok_idx.reshape(b * k, 1), i + 1, axis=1
        ).reshape(b, k, max_len)
        lengths = jnp.where(finished, lengths, lengths + 1)
        finished = jnp.logical_or(finished, tok_idx == end_id)
        return i + 1, tokens, top_scores, finished, lengths, caches

    state = (jnp.asarray(0, jnp.int32), tokens, scores, finished, lengths, caches)
    _, tokens, scores, finished, lengths, _ = jax.lax.while_loop(cond, body, state)

    norm = jnp.power(lengths.astype(jnp.float32), length_penalty)
    final = scores / jnp.maximum(norm, 1.0)
    best = jnp.argmax(final, axis=1)
    return (
        jax.vmap(lambda t, i: t[i])(tokens, best),
        jax.vmap(lambda s, i: s[i])(final, best),
    )


# ---------------------------------------------------------------------------
# jitted entry points + host detokenization
# ---------------------------------------------------------------------------


def make_greedy_fn(model: MMT4Caption, max_len: int, start_id: int, end_id: int,
                   collect_attn: bool = False) -> Callable:
    """Returns jit(variables, feats, masks) -> (tokens, attn)."""

    @jax.jit
    def fn(variables, video_feats, video_masks):
        return greedy_generate(
            model, variables, video_feats, video_masks,
            max_len=max_len, start_id=start_id, end_id=end_id,
            collect_attn=collect_attn,
        )

    return fn


def make_auto_greedy_fn(model: MMT4Caption, max_len: int, start_id: int,
                        end_id: int, collect_attn: bool = False,
                        mesh=None, interpret: bool = False) -> Callable:
    """Greedy decode on the fastest eligible path: the fused Pallas decode
    kernels on TPU (``vct_tpu.decode_fast``; 27.5k vs 8.4k captions/s/chip
    measured steady-state at B=2048), falling back to the module-graph
    program off-TPU, for attention collection, or for batch sizes the
    kernels can't tile.

    ``mesh`` (multi-device): the fused kernels run under shard_map over the
    'data' axis — same per-chip throughput as single-device — when the model
    opted in via ``tpu.pallas_partition_kernels`` and the mesh is data-only
    (TP shards the decoder weights over 'model', which the replicated-weight
    kernels can't consume); otherwise the module-graph GSPMD program."""
    module_fn = make_greedy_fn(model, max_len, start_id, end_id,
                               collect_attn=collect_attn)
    on_tpu = jax.default_backend() == "tpu" or interpret
    # tpu.fast_numerics drops the module graph to compute-dtype LN stats /
    # softmax logits while the fused kernels keep their fp32 schedule, so the
    # two paths are no longer token-exact — dispatch must not mix them
    # (CLAUDE.md invariant; measured win of fast_numerics is ~0 anyway).
    if (collect_attn or not model.tpu.use_pallas_attention or not on_tpu
            or model.tpu.fast_numerics):
        return module_fn

    if mesh is not None and mesh.size > 1:
        if (
            not model.tpu.pallas_partition_kernels
            or mesh.shape.get("model", 1) > 1
        ):
            return module_fn

        from vct_tpu.decode_fast import (
            fused_decode_sharded_supported,
            make_fused_greedy_sharded_fn,
        )

        n = mesh.shape["data"]
        fused_fn = make_fused_greedy_sharded_fn(
            model, mesh, max_len, start_id, end_id, interpret=interpret)

        def fn(variables, video_feats, video_masks):
            if fused_decode_sharded_supported(video_feats[0].shape[0], n):
                return fused_fn(variables, video_feats, video_masks)
            return module_fn(variables, video_feats, video_masks)

        return fn

    from vct_tpu.decode_fast import fused_decode_supported, make_fused_greedy_fn

    fused_fn = make_fused_greedy_fn(model, max_len, start_id, end_id,
                                    interpret=interpret)

    def fn(variables, video_feats, video_masks):
        if fused_decode_supported(video_feats[0].shape[0]):
            return fused_fn(variables, video_feats, video_masks)
        return module_fn(variables, video_feats, video_masks)

    return fn


def make_beam_fn(model: MMT4Caption, max_len: int, start_id: int, end_id: int,
                 beam_size: int, length_penalty: float = 0.6) -> Callable:
    @jax.jit
    def fn(variables, video_feats, video_masks):
        return beam_generate(
            model, variables, video_feats, video_masks,
            beam_size=beam_size, max_len=max_len,
            start_id=start_id, end_id=end_id, length_penalty=length_penalty,
        )

    return fn


def make_auto_beam_fn(model: MMT4Caption, max_len: int, start_id: int,
                      end_id: int, beam_size: int,
                      length_penalty: float = 0.6, mesh=None,
                      interpret: bool = False) -> Callable:
    """Beam search on the fastest eligible path: the fused decode kernels
    (one stack launch + one norm/generator/top-k launch per token — the
    [B*K, vocab] log-softmax never hits HBM), shard_mapped over 'data' on a
    multi-device mesh when the model opted in via
    ``tpu.pallas_partition_kernels`` (data-only meshes; TP shards the
    decoder weights, so TP meshes run the module-graph GSPMD program), and
    the module-graph program off-TPU or for batch*beam sizes the kernels
    can't tile."""
    module_fn = make_beam_fn(model, max_len, start_id, end_id, beam_size,
                             length_penalty)
    on_tpu = jax.default_backend() == "tpu" or interpret
    # see make_auto_greedy_fn: fast_numerics breaks fused/module exactness
    if (not model.tpu.use_pallas_attention or not on_tpu
            or model.tpu.fast_numerics):
        return module_fn
    if mesh is not None and mesh.size > 1:
        if (
            not model.tpu.pallas_partition_kernels
            or mesh.shape.get("model", 1) > 1
        ):
            return module_fn

        from vct_tpu.decode_fast import (
            fused_beam_sharded_supported,
            make_fused_beam_sharded_fn,
        )

        n = mesh.shape["data"]
        fused_fn = make_fused_beam_sharded_fn(
            model, mesh, max_len, start_id, end_id, beam_size, length_penalty,
            interpret=interpret)

        def fn(variables, video_feats, video_masks):
            if fused_beam_sharded_supported(
                video_feats[0].shape[0], beam_size, n
            ):
                return fused_fn(variables, video_feats, video_masks)
            return module_fn(variables, video_feats, video_masks)

        return fn

    from vct_tpu.decode_fast import fused_beam_supported, make_fused_beam_fn

    fused_fn = make_fused_beam_fn(model, max_len, start_id, end_id, beam_size,
                                  length_penalty, interpret=interpret)

    def fn(variables, video_feats, video_masks):
        if fused_beam_supported(video_feats[0].shape[0], beam_size):
            return fused_fn(variables, video_feats, video_masks)
        return module_fn(variables, video_feats, video_masks)

    return fn


def detokenize_batch(tokenizer, tokens) -> List[str]:
    """Token-id matrix -> caption strings (reference truncation semantics)."""
    import numpy as np

    return [tokenizer.decode_caption(row) for row in np.asarray(tokens)]


def pipelined_map(launch, batches, *, depth: int = 2):
    """Map a device-launching ``launch(batch) -> device result`` over an
    iterable, retaining ``depth`` launched-but-unfetched executions after
    each yield (so ``depth + 1`` can briefly be in flight right after an
    append — size device memory for depth+1 result buffers); yields
    ``(batch, host_result)`` in submission order.

    Split-decode loops (eval every epoch, ``train.py:248`` in the reference)
    are fetch-latency-bound when they materialize each batch's tokens before
    launching the next: on a relay-attached TPU every synchronous fetch costs
    a full round trip (~35 ms measured) that enqueue-only dispatch does not.
    Keeping the next batch in flight while the previous one is fetched and
    detokenized raised measured decode throughput from 13.9k to ~23k
    captions/s/chip at B=1024 (tools/profile.py latency, round-2 history); on a direct-attached
    TPU it still overlaps host detokenization with device compute. ``depth=2``
    (double buffering) captures nearly all of the win — deeper windows only
    add memory.
    """
    from collections import deque

    q: deque = deque()
    for b in batches:
        q.append((b, launch(b)))
        if len(q) > depth:
            b0, r0 = q.popleft()
            yield b0, jax.device_get(r0)
    while q:
        b0, r0 = q.popleft()
        yield b0, jax.device_get(r0)
