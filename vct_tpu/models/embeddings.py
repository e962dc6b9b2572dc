"""Positional / temporal / modal embeddings and global aggregation.

Reference semantics reproduced (with citations):

* ``sinusoid_table`` — the sin/cos table shared by the decoder's
  ``PositionalEmbedding`` (``/root/reference/model/Embedding.py:13-18``) and the
  encoder's ``TemporalEncoding`` (``MMEncoder.py:71-81``); both use
  ``den = exp(-arange(0, d, 2) * ln(10000) / d)``.
* ``temporal_encoding`` — the reference's linspace alignment: each modality's
  timeline is resampled onto the primary modality's (``MMEncoder.py:98-102``).
  The reference rebuilds this row-by-row in a Python loop *per forward call*
  (SURVEY.md quirk #5); with static shapes we compute the index map once at
  trace time for free.
* ``TemporalEmbedding`` — the learned variant (``MMEncoder.py:118-170``):
  indices ``concat([0], linspace(1, D, t))`` per modality, agg token at 0.
* ``ModalEmbedding`` — per-modality learned embedding over the concatenated
  sequence, optional distinct id for each modality's global token
  (``MMEncoder.py:12-48``).
* ``GlobalAggregation`` — max / avg pooling or (bi)GRU final state
  (``MMEncoder.py:173-201``). The reference pools over *padded* timesteps
  (pads hold the unify-Linear bias); vct_tpu masks pads by default and offers
  ``quirk_unmasked=True`` for bit parity. The GRU runs over the full padded
  sequence in both (matching the reference). biGRU sums the two directional
  final states (``MMEncoder.py:201``).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def sinusoid_table(max_len: int, dim: int) -> np.ndarray:
    """float32 [max_len, dim] sin/cos table (reference formula)."""
    den = np.exp(-np.arange(0, dim, 2, dtype=np.float32) * (math.log(10000.0) / dim))
    pos = np.arange(0, max_len, dtype=np.float32)[:, None]
    table = np.zeros((max_len, dim), dtype=np.float32)
    table[:, 0::2] = np.sin(pos * den)
    table[:, 1::2] = np.cos(pos * den)
    return table


def _align_indices(primary_len: int, t: int) -> np.ndarray:
    """linspace(0, primary_len-1, t) as int32 — the reference's cross-modal
    timeline alignment (``MMEncoder.py:98``)."""
    return np.linspace(0, primary_len - 1, t).astype(np.int32)


def temporal_encoding(
    modal_lengths: Sequence[int],
    dim: int,
    max_len: int = 512,
    separate: bool = False,
) -> Any:
    """Fixed sinusoidal temporal encoding.

    Non-separate (``MMEncoder.py:91-104``): each modality's length *includes*
    the prepended global token; position 0 gets a zero vector, positions
    1..t get ``pe[linspace(0, D-1, t)]`` where ``D`` = primary modality's t.
    Returns [sum(lengths), dim].

    Separate (``MMEncoder.py:105-115``): no global token; returns a list of
    [t_i, dim] arrays.
    """
    pe = sinusoid_table(max_len, dim)
    if not separate:
        d_primary = modal_lengths[0] - 1
        parts = []
        for length in modal_lengths:
            t = length - 1
            block = np.zeros((t + 1, dim), dtype=np.float32)
            block[1:] = pe[_align_indices(d_primary, t)]
            parts.append(block)
        return jnp.asarray(np.concatenate(parts, axis=0))
    d_primary = modal_lengths[0]
    return [jnp.asarray(pe[_align_indices(d_primary, t)]) for t in modal_lengths]


def temporal_embedding_indices(
    modal_lengths: Sequence[int], separate: bool = False
) -> Any:
    """Index map for the learned ``TemporalEmbedding`` (``MMEncoder.py:149-170``).

    Non-separate: per modality ``concat([0], linspace(1, D, t))`` with D =
    primary modality's t (excl. agg); returns int32 [sum(lengths)].
    Separate: per-modality ``linspace(0, D-1, t)``; returns list of [t_i].
    """
    if not separate:
        d_primary = modal_lengths[0] - 1
        parts = []
        for length in modal_lengths:
            t = length - 1
            idx = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.linspace(1, d_primary, t).astype(np.int64)]
            )
            parts.append(idx)
        return jnp.asarray(np.concatenate(parts, axis=0), dtype=jnp.int32)
    d_primary = modal_lengths[0]
    return [
        jnp.asarray(_align_indices(d_primary, t), dtype=jnp.int32) for t in modal_lengths
    ]


class TemporalEmbedding(nn.Module):
    """Learned temporal embedding table (``MMEncoder.py:138``: Embedding(512, d))."""

    dim: int
    max_len: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, indices: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (self.max_len, self.dim), jnp.float32
        )
        return jnp.take(table, indices, axis=0).astype(self.dtype)


class ModalEmbedding(nn.Module):
    """Learned modality-id embedding (``MMEncoder.py:12-48``)."""

    num_modal: int
    dim: int
    modal_different: bool = True
    dtype: Dtype = jnp.float32

    def labels(self, modal_lengths: Sequence[int]) -> jnp.ndarray:
        lab: List[int] = []
        for i, length in enumerate(modal_lengths):
            lab.append(i + self.num_modal if self.modal_different else i)
            lab.extend([i] * (length - 1))
        return jnp.asarray(np.asarray(lab, dtype=np.int32))

    @nn.compact
    def __call__(self, modal_lengths: Sequence[int]) -> jnp.ndarray:
        n = self.num_modal * 2 if self.modal_different else self.num_modal
        table = self.param(
            "embedding", nn.initializers.normal(1.0), (n, self.dim), jnp.float32
        )
        return jnp.take(table, self.labels(modal_lengths), axis=0).astype(self.dtype)


class PositionalEmbedding(nn.Module):
    """Decoder positional embedding + dropout (``Embedding.py:7-25``).

    The table is a *buffer*, not a parameter — but the BERT/UniVL importers
    overwrite it with learned position embeddings (``MMT4Caption.py:220,281``),
    so it lives in the ``buffers`` variable collection where the checkpoint
    converter can write it, and the optimizer never touches it.
    """

    dim: int
    dropout_rate: float = 0.1
    max_len: int = 5000
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pos_embedding = self.variable(
            "buffers",
            "pos_embedding",
            lambda: jnp.asarray(sinusoid_table(self.max_len, self.dim)),
        )
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, token_embedding: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        s = token_embedding.shape[1]
        x = token_embedding + self.pos_embedding.value[:s].astype(self.dtype)
        return self.dropout(x, deterministic=deterministic)

    def at_position(self, token_embedding: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
        """PE for a single decode step at traced position ``idx`` ([B,1,E])."""
        row = jax.lax.dynamic_slice_in_dim(self.pos_embedding.value, idx, 1, axis=0)
        return token_embedding + row[None].astype(self.dtype)


class GRU(nn.Module):
    """Minimal GRU with torch ``nn.GRU`` parameter layout and gate math, so
    reference GRU-aggregation checkpoints convert 1:1.

    torch gate order in the stacked weights is (r, z, n):
      r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
      z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
      n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
      h' = (1 - z) * n + z * h
    """

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
        """x: [B, T, E] -> final hidden state [B, hidden]."""
        e = x.shape[-1]
        h3 = 3 * self.hidden
        k = nn.initializers.uniform(scale=2.0 / math.sqrt(self.hidden))

        def shifted(key, shape, dtype):
            return k(key, shape, dtype) - 1.0 / math.sqrt(self.hidden)

        w_ih = self.param("weight_ih", shifted, (e, h3), jnp.float32)
        w_hh = self.param("weight_hh", shifted, (self.hidden, h3), jnp.float32)
        b_ih = self.param("bias_ih", shifted, (h3,), jnp.float32)
        b_hh = self.param("bias_hh", shifted, (h3,), jnp.float32)

        xw = x @ w_ih.astype(self.dtype) + b_ih.astype(self.dtype)  # [B, T, 3H]
        if reverse:
            xw = jnp.flip(xw, axis=1)

        def step(h, xw_t):
            hw = h @ w_hh.astype(self.dtype) + b_hh.astype(self.dtype)
            xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hw, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, None

        h0 = jnp.zeros((x.shape[0], self.hidden), self.dtype)
        h_final, _ = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1))
        return h_final


class GlobalAggregation(nn.Module):
    """Per-modality global feature: [B, T, E] -> [B, 1, E] (``MMEncoder.py:173-201``)."""

    method: str  # max | avg | GRU | biGRU
    dim: int
    quirk_unmasked: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.method not in ("max", "avg", "GRU", "biGRU"):
            raise ValueError(f"unsupported aggregation: {self.method}")
        if self.method in ("GRU", "biGRU"):
            self.agg = GRU(self.dim, dtype=self.dtype, name="agg")
        if self.method == "biGRU":
            # torch nn.GRU(bidirectional=True) has separate reverse-direction
            # weights (weight_ih_l0_reverse, ...), so a second module here.
            self.agg_reverse = GRU(self.dim, dtype=self.dtype, name="agg_reverse")

    def __call__(
        self, x: jnp.ndarray, padding_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """padding_mask: [B, T] bool, True = PAD (reference convention)."""
        if self.quirk_unmasked:
            padding_mask = None  # reference pools over pads (AdaptiveXPool1d)
        if self.method == "avg":
            if padding_mask is None:
                out = jnp.mean(x, axis=1, keepdims=True)
            else:
                keep = (~padding_mask)[..., None].astype(x.dtype)
                out = jnp.sum(x * keep, axis=1, keepdims=True) / jnp.maximum(
                    jnp.sum(keep, axis=1, keepdims=True), 1.0
                )
            return out
        if self.method == "max":
            if padding_mask is not None:
                x = jnp.where(padding_mask[..., None], jnp.finfo(x.dtype).min, x)
            return jnp.max(x, axis=1, keepdims=True)
        if self.method == "GRU":
            return self.agg(x)[:, None, :]
        # biGRU: sum of forward and backward final states (MMEncoder.py:201)
        fwd = self.agg(x)
        bwd = self.agg_reverse(x, reverse=True)
        return (fwd + bwd)[:, None, :]
