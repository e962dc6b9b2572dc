"""Caption decoder: token embedding + sinusoidal PE + Transformer decoder +
LM head + SCE/CE loss (re-design of ``/root/reference/model/CapDecoder.py``).

Differences from the reference, by design:

* ``decode_step`` is a KV-cached single-token step meant to run inside a
  ``lax.while_loop`` — the reference re-runs the whole decoder over the
  growing prefix each step with no cache (``CapDecoder.py:62-79``).
* Attention-map return is a flag on the ordinary decoder rather than a
  separate ``VisTransformerDecoder*`` class pair (``CapDecoder.py:83-154``) —
  the same weights serve both.
* The decoder cross-attends with the encoder's padding mask by default.
  The reference never passes ``memory_key_padding_mask`` (``CapDecoder.py:49-52``),
  so its cross-attention attends padded memory slots; with the shipped uni_12
  features T is constant and nothing is padded, so the choice is unobservable
  there. ``quirk_no_memory_mask=True`` restores the reference behavior exactly.

Embedding parity notes: torch ``nn.Embedding(padding_idx=pad)`` keeps the pad
row at zero with zero gradient; here the lookup output is forced to zero for
pad tokens, which matches the forward exactly and kills the gradient to that
row automatically. The token embedding is *not* scaled by sqrt(d) — neither
does the reference (``CapDecoder.py:48``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vct_tpu.models.embeddings import PositionalEmbedding
from vct_tpu.models.layers import Cache, TransformerDecoder
from vct_tpu.models.losses import cross_entropy_parts, sce_loss_parts
from vct_tpu.ops.attention import causal_bias, combine_bias, padding_bias
from vct_tpu.ops.fused_loss import linear_sce_parts_auto

Dtype = Any


class LMHead(nn.Module):
    """The vocab projection as explicit setup-time params.

    Computationally identical to ``nn.Dense(vocab, dtype, param_dtype=f32)``
    (same init, promotion and op order) but the kernel/bias are created in
    ``setup`` rather than at first call — the fused linear+SCE loss path
    (``ops.fused_loss``) consumes the raw params without ever applying the
    projection, and the param tree must exist (for init/restore) either way.
    Param names stay ``generator/{kernel,bias}`` (checkpoint key inventory,
    SURVEY.md Appendix B: ``cap_decoder.generator.{weight,bias}``).
    """

    in_dim: int
    vocab_size: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.vocab_size), jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.vocab_size,), jnp.float32
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        y = jnp.dot(x, self.kernel.astype(self.dtype))
        return y + self.bias.astype(self.dtype)


class CapDecoder(nn.Module):
    num_layers: int
    embed_dim: int
    nhead: int
    dim_feedforward: int
    dropout_rate: float
    vocab_size: int
    pad_id: int = 0
    sce_loss_alpha: float = 0.5
    activation: str = "gelu"
    quirk_no_memory_mask: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False  # tpu.fast_numerics
    # Fused LM-head+loss (ops.fused_loss): applies on loss-only forwards —
    # the [B*S, vocab] logits never exist in HBM. Same values/grads to float
    # summation order (tests/test_fused_loss.py).
    use_fused_loss: bool = True
    fused_loss_block_v: int = 2048
    # Keep each chunk's dtype logits as a residual for the loss backward
    # (same values to summation order, ~[B*S, vocab] 16-bit HBM for 2 fewer
    # GEMMs per train step; no effect on loss-only forwards / fp32 dtypes).
    # Default off: measured neutral on v5e — see TPUConfig.fused_loss_stash.
    fused_loss_stash: bool = False
    # Route the fused-loss sweeps through the software-pipelined Mosaic
    # kernels when shapes are eligible (see TPUConfig.fused_loss_pallas).
    fused_loss_pallas: bool = False

    def setup(self):
        self.decoder = TransformerDecoder(
            self.num_layers,
            self.embed_dim,
            self.nhead,
            self.dim_feedforward,
            self.dropout_rate,
            self.activation,
            self.dtype,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math,
            name="decoder",
        )
        self.generator = LMHead(
            self.embed_dim, self.vocab_size, dtype=self.dtype, name="generator"
        )
        self.tgt_to_emb = self.param(
            "tgt_to_emb",
            nn.initializers.normal(1.0),
            (self.vocab_size, self.embed_dim),
            jnp.float32,
        )
        self.positional_encoding = PositionalEmbedding(
            self.embed_dim,
            self.dropout_rate,
            5000,
            dtype=self.dtype,
            name="positional_encoding",
        )

    def embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """[B, S] ids -> [B, S, E]; pad rows forced to zero (padding_idx)."""
        emb = jnp.take(self.tgt_to_emb.astype(self.dtype), tokens, axis=0)
        return jnp.where((tokens == self.pad_id)[..., None], 0.0, emb)

    def __call__(
        self,
        memory: jnp.ndarray,
        tgt: jnp.ndarray,
        tgt_padding_mask: jnp.ndarray,
        memory_padding_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
        row_valid: Optional[jnp.ndarray] = None,
        return_parts: bool = False,
        loss_only: bool = False,
    ):
        """Teacher-forced training/val forward (``CapDecoder.py:34-60``).

        memory [B, T, E]; tgt [B, S] ids; tgt_padding_mask [B, S] True=pad;
        ``row_valid`` [B] bool excludes collate filler rows from the loss (the
        reference's batches are ragged and never contain filler).
        Returns (logits [B, S-1, V], loss, attn or None); with
        ``return_parts`` the loss slot is (ce_sum, ce_n, rce_sum, rce_n) so
        callers can aggregate exactly across batches. ``loss_only`` lets the
        fused LM-head+loss kernel skip materializing the logits (the logits
        slot is then None when the fused path is enabled).
        """
        tgt_input = tgt[:, :-1]
        tgt_out = tgt[:, 1:]
        in_pad = tgt_padding_mask[:, :-1]

        tgt_bias = combine_bias(causal_bias(tgt_input.shape[1]), padding_bias(in_pad))
        mem_bias = None
        if memory_padding_mask is not None and not self.quirk_no_memory_mask:
            mem_bias = padding_bias(memory_padding_mask)

        x = self.positional_encoding(self.embed(tgt_input), deterministic=deterministic)
        outs, attn = self.decoder(
            x,
            memory,
            tgt_bias,
            mem_bias,
            deterministic=deterministic,
            return_attn=return_attn,
        )
        flat_labels = tgt_out.reshape(-1)
        valid_flat = None
        if row_valid is not None:
            valid_flat = jnp.broadcast_to(row_valid[:, None], tgt_out.shape).reshape(-1)
        # rect_mask: positions inside the reference's ragged [B, S_batch-1]
        # rectangle, where S_batch = longest caption in the batch (see
        # losses.sce_loss docstring). Filler rows are copies of real rows,
        # so they never raise batch_max; they are excluded via valid_flat.
        lengths = jnp.sum(~tgt_padding_mask, axis=1)
        batch_max = jnp.max(lengths)
        pos = jnp.arange(tgt_out.shape[1])[None, :]
        rect = jnp.broadcast_to(pos < batch_max - 1, tgt_out.shape).reshape(-1)

        if loss_only and self.use_fused_loss:
            logits = None
            keep_ce = (flat_labels != self.pad_id).astype(jnp.float32)
            m_rce = rect.astype(jnp.float32)
            if valid_flat is not None:
                vf = valid_flat.astype(jnp.float32)
                keep_ce = keep_ce * vf
                m_rce = m_rce * vf
            parts = linear_sce_parts_auto(
                outs.reshape(-1, self.embed_dim),
                self.generator.kernel,
                self.generator.bias,
                flat_labels,
                keep_ce,
                m_rce,
                self.dtype,
                self.fused_loss_block_v,
                self.sce_loss_alpha != 1.0,
                self.fused_loss_stash,
                self.fused_loss_pallas,
                # on a registered multi-device mesh the Mosaic loss kernels
                # run under shard_map over 'data' (parallel.mesh registry),
                # same opt-in as the attention kernels
                self.partition_kernels,
            )
        else:
            logits = self.generator(outs)
            flat_logits = logits.reshape(-1, self.vocab_size)
            if self.sce_loss_alpha == 1.0:
                ce_sum, ce_n = cross_entropy_parts(
                    flat_logits, flat_labels, self.pad_id, valid_flat
                )
                parts = (ce_sum, ce_n, jnp.zeros(()), jnp.zeros(()))
            else:
                parts = sce_loss_parts(
                    flat_logits,
                    flat_labels,
                    ignore_index=self.pad_id,
                    rect_mask=rect,
                    valid=valid_flat,
                )
        ce_sum, ce_n, rce_sum, rce_n = parts
        loss = (
            self.sce_loss_alpha * ce_sum / jnp.maximum(ce_n, 1.0)
            + (1.0 - self.sce_loss_alpha) * rce_sum / jnp.maximum(rce_n, 1.0)
        )
        return logits, (parts if return_parts else loss), attn

    # ---- full-prefix single-word scoring (reference-style, used as the
    # parity/benchmark baseline; production decoding uses the cache) ----------

    def decode_word(
        self,
        memory: jnp.ndarray,
        tgt: jnp.ndarray,
        memory_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Re-run the full decoder on the prefix, return last-position logits
        (exact translation of ``CapDecoder.py:62-79``; no KV cache)."""
        tgt_bias = causal_bias(tgt.shape[1])
        mem_bias = None
        if memory_padding_mask is not None and not self.quirk_no_memory_mask:
            mem_bias = padding_bias(memory_padding_mask)
        x = self.positional_encoding(self.embed(tgt), deterministic=True)
        outs, _ = self.decoder(x, memory, tgt_bias, mem_bias, deterministic=True)
        return self.generator(outs[:, -1])

    # ---- KV-cached decoding --------------------------------------------------

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Tuple[Cache, ...]:
        return self.decoder.init_cache(batch, max_len, memory)

    def decode_step(
        self,
        tokens: jnp.ndarray,  # [B] current token ids
        caches: Tuple[Cache, ...],
        idx: jnp.ndarray,  # scalar position of `tokens` in the sequence
        memory_padding_mask: Optional[jnp.ndarray] = None,
        *,
        return_attn: bool = False,
    ):
        """One cached decode step -> (logits [B, V], new caches, attn)."""
        mem_bias = None
        if memory_padding_mask is not None and not self.quirk_no_memory_mask:
            mem_bias = padding_bias(memory_padding_mask)
        tok = self.positional_encoding.at_position(self.embed(tokens[:, None]), idx)
        out, caches, attn = self.decoder.decode_step(
            tok, caches, idx, mem_bias, return_attn=return_attn
        )
        return self.generator(out[:, 0]), caches, attn
