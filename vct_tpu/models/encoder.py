"""Video encoders: MME (default), SimpleSep, HMME.

Re-implementations of ``/root/reference/model/MMEncoder.py`` as static-shape
Flax modules. Shared recipe (``MMEncoder.py:244-276``):

  per-modality Linear dim-unify -> prepend a global-aggregation token ->
  add temporal (+ modal) embeddings -> concat modalities ->
  TransformerEncoder over the fused sequence -> (memory, mask, agg_feature)

Masks use the reference convention: **True = padding** (``dataloader.py:246``);
the prepended global position is always valid (``MMEncoder.py:256``).

All temporal/modal index maps are static (shapes are fixed under jit), so the
reference's per-forward Python loops (SURVEY.md quirk #5) disappear; the whole
encoder is a handful of large batched matmuls — exactly what the MXU wants.

Deviation (documented): HMME's aggregate feature. The reference computes
``sum(cat([m[:, 0] for m in outputs], dim=1), dim=1)`` (``MMEncoder.py:399``),
which collapses to a per-sample *scalar* — an evident bug (the matching head
needs [B, E]). vct_tpu implements the intent: the sum of the per-modality
global tokens, shape [B, E].
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vct_tpu.models.embeddings import (
    GlobalAggregation,
    ModalEmbedding,
    TemporalEmbedding,
    sinusoid_table,
    temporal_embedding_indices,
    temporal_encoding,
)
from vct_tpu.models.layers import TransformerEncoder, TransformerEncoderLayer
from vct_tpu.ops.attention import padding_bias

Dtype = Any


def _prepend_valid(masks: Optional[List[jnp.ndarray]]) -> Optional[List[jnp.ndarray]]:
    """Extend each per-modality pad mask with an always-valid global slot."""
    if masks is None:
        return None
    out = []
    for m in masks:
        pad = jnp.zeros((m.shape[0], 1), dtype=bool)
        out.append(jnp.concatenate([pad, m], axis=1))
    return out


class _MMEBase(nn.Module):
    """Shared unify/agg/embed front-end for MME and HMME."""

    d_feats: Sequence[int]
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    global_type: str = "avg"
    modal_different: bool = True
    temporal_type: str = "encoding"  # encoding | embedding
    do_norm: bool = False
    quirk_unmasked_agg: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False  # tpu.fast_numerics

    @property
    def num_modal(self) -> int:
        return len(self.d_feats)

    def _setup_common(self):
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.unify = [
            nn.Dense(self.d_model, name=f"unify_{i}", **mk) for i in range(self.num_modal)
        ]
        self.global_agg = GlobalAggregation(
            self.global_type,
            self.d_model,
            quirk_unmasked=self.quirk_unmasked_agg,
            dtype=self.dtype,
            name="global_agg",
        )
        if self.temporal_type == "embedding":
            self.temp_emb = TemporalEmbedding(self.d_model, dtype=self.dtype, name="temp_emb")
        if self.num_modal > 1:
            self.modal_emb = ModalEmbedding(
                self.num_modal,
                self.d_model,
                modal_different=self.modal_different,
                dtype=self.dtype,
                name="modal_emb",
            )
        if self.do_norm:
            # fp32 LN statistics are the torch-parity default; fast_math
            # keeps the reductions in the compute dtype (same toggle as
            # the layers.py LayerNorms so tpu.fast_numerics covers ALL
            # module LayerNorms, do_norm configs included)
            self.pre_norm = nn.LayerNorm(
                epsilon=1e-5, name="pre_norm",
                force_float32_reductions=not self.fast_math, **mk)
            self.pre_dropout = nn.Dropout(self.dropout_rate)

    def _front_end(
        self,
        srcs: List[jnp.ndarray],
        padding_masks: Optional[List[jnp.ndarray]],
        deterministic: bool,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], List[int]]:
        """-> (fused [B, sum(1+T_m), E], pad mask or None, per-modal lengths)."""
        uni = [self.unify[i](src.astype(self.dtype)) for i, src in enumerate(srcs)]
        per_modal = []
        for i, f in enumerate(uni):
            mask_i = padding_masks[i] if padding_masks is not None else None
            agg = self.global_agg(f, mask_i)
            per_modal.append(jnp.concatenate([agg, f], axis=1))  # [B, 1+T, E]
        lengths = [int(f.shape[1]) for f in per_modal]

        global_masks = _prepend_valid(padding_masks)
        fused_mask = (
            jnp.concatenate(global_masks, axis=1) if global_masks is not None else None
        )

        if self.temporal_type == "embedding":
            temp = self.temp_emb(temporal_embedding_indices(lengths))
        else:
            temp = temporal_encoding(lengths, self.d_model).astype(self.dtype)

        fused = jnp.concatenate(per_modal, axis=1) + temp[None]
        if self.num_modal > 1:
            fused = fused + self.modal_emb(lengths)[None]
        if self.do_norm:
            fused = self.pre_dropout(self.pre_norm(fused), deterministic=deterministic)
        return fused, fused_mask, lengths


class MultiModalEncoder(_MMEBase):
    """MME — the default encoder (``MMEncoder.py:205-277``).

    Returns (memory [B, sum(1+T), E], pad mask, memory[:, 0] as agg feature).
    """

    num_encoder_layers: int = 1

    def setup(self):
        self._setup_common()
        self.transformer_encoder = TransformerEncoder(
            self.num_encoder_layers,
            self.d_model,
            self.nhead,
            self.dim_feedforward,
            self.dropout_rate,
            self.activation,
            self.dtype,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math,
            name="transformer_encoder",
        )

    def __call__(
        self,
        srcs: List[jnp.ndarray],
        padding_masks: Optional[List[jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ):
        fused, fused_mask, _ = self._front_end(srcs, padding_masks, deterministic)
        memory = self.transformer_encoder(
            fused, padding_bias(fused_mask), deterministic=deterministic
        )
        return memory, fused_mask, memory[:, 0]


class HMMEncoder(_MMEBase):
    """Hierarchical MME (``MMEncoder.py:314-402``): one shared layer stack;
    modality j's input is reset to the embedded original until its entry layer
    ``max(layers) - layers[j]``, then flows through the remaining layers. No
    final LayerNorm (the reference uses bare cloned layers, not the
    ``nn.TransformerEncoder`` wrapper)."""

    num_encoder_layers: Sequence[int] = (1,)

    def setup(self):
        self._setup_common()
        depth = max(self.num_encoder_layers)
        self.trans_enc_layers = [
            TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout_rate,
                self.activation,
                self.dtype,
                use_pallas=self.use_pallas,
                partition_kernels=self.partition_kernels,
                fast_math=self.fast_math,
                name=f"trans_enc_layers_{i}",
            )
            for i in range(depth)
        ]

    def __call__(
        self,
        srcs: List[jnp.ndarray],
        padding_masks: Optional[List[jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ):
        fused, fused_mask, lengths = self._front_end(srcs, padding_masks, deterministic)
        bias = padding_bias(fused_mask)
        offsets = [0]
        for length in lengths:
            offsets.append(offsets[-1] + length)

        target_layer = [max(self.num_encoder_layers) - n for n in self.num_encoder_layers]
        ori_parts = [fused[:, offsets[j] : offsets[j + 1]] for j in range(self.num_modal)]
        last_parts = list(ori_parts)
        for i, layer in enumerate(self.trans_enc_layers):
            inputs = [
                last_parts[j] if target_layer[j] < i else ori_parts[j]
                for j in range(self.num_modal)
            ]
            out = layer(jnp.concatenate(inputs, axis=1), bias, deterministic=deterministic)
            last_parts = [out[:, offsets[j] : offsets[j + 1]] for j in range(self.num_modal)]

        memory = jnp.concatenate(last_parts, axis=1)
        # intent of MMEncoder.py:399 (see module docstring): sum of per-modal
        # global tokens -> [B, E].
        agg = sum(p[:, 0] for p in last_parts)
        return memory, fused_mask, agg


class SimpleSepEncoder(nn.Module):
    """One independent encoder per modality (``MMEncoder.py:280-310``).

    No global token and no agg feature -> caption task only (the validation
    rule from ``utils.py:108-112``). Returns (concat memories, None, None).
    """

    d_feats: Sequence[int]
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    num_encoder_layers: int = 1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False  # tpu.fast_numerics

    @property
    def num_modal(self) -> int:
        return len(self.d_feats)

    def setup(self):
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        self.unify = [
            nn.Dense(self.d_model, name=f"unify_{i}", **mk) for i in range(self.num_modal)
        ]
        self.transformer_encoders = [
            TransformerEncoder(
                self.num_encoder_layers,
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout_rate,
                self.activation,
                self.dtype,
                use_pallas=self.use_pallas,
                partition_kernels=self.partition_kernels,
                fast_math=self.fast_math,
                name=f"transformer_encoders_{i}",
            )
            for i in range(self.num_modal)
        ]

    def __call__(
        self,
        srcs: List[jnp.ndarray],
        padding_masks: Optional[List[jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ):
        uni = [self.unify[i](src.astype(self.dtype)) for i, src in enumerate(srcs)]
        temp = temporal_encoding([int(f.shape[1]) for f in uni], self.d_model, separate=True)
        memories = []
        for i, (f, te) in enumerate(zip(uni, temp)):
            bias = (
                padding_bias(padding_masks[i]) if padding_masks is not None else None
            )
            memories.append(
                self.transformer_encoders[i](
                    f + te[None].astype(self.dtype), bias, deterministic=deterministic
                )
            )
        return jnp.concatenate(memories, axis=1), None, None
