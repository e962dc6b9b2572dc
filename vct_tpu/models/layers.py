"""Transformer building blocks with torch-``nn.Transformer*`` numerics.

The reference delegates all attention/FFN compute to
``torch.nn.TransformerEncoderLayer``/``TransformerDecoderLayer`` with
``batch_first=True``, post-norm (torch default ``norm_first=False``), exact
GELU, and ``layer_norm_eps=1e-5`` (``/root/reference/model/MMEncoder.py:236-238``,
``CapDecoder.py:17-24``). These Flax modules reproduce those numerics exactly
(validated against torch in ``tests/test_torch_parity.py``) while being
TPU-native:

  * packed-QKV projection = one MXU matmul (and a 1:1 map onto torch's
    ``in_proj_weight`` for the checkpoint converter),
  * static shapes everywhere,
  * KV-cached single-token ``decode_step`` methods for autoregressive decoding
    under ``lax.while_loop`` (the reference re-runs the full decoder per token,
    ``CapDecoder.py:62-79``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vct_tpu.ops.attention import NEG_INF, dot_product_attention

Dtype = Any
Cache = Dict[str, jnp.ndarray]


def activation_fn(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name == "gelu":
        # torch F.gelu is the exact erf formulation; jax defaults to tanh
        # approximation, which breaks checkpoint parity.
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unsupported activation: {name}")


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head attention (torch ``nn.MultiheadAttention`` layout).

    ``in_proj_kernel`` is ``[E, 3E]`` = torch ``in_proj_weight``[3E, E]^T with
    q/k/v stacked along the output dim, exactly as the reference checkpoints
    store them (SURVEY.md Appendix B; UniVL import at ``MMT4Caption.py:229-233``).
    """

    embed_dim: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    use_pallas: bool = False  # fused kernel on the no-grad TPU path
    # consult the shard_map kernel-mesh registry (parallel.mesh) when a
    # multi-device mesh is registered; per-model like use_pallas
    partition_kernels: bool = False
    # tpu.fast_numerics: compute-dtype softmax logits instead of fp32
    fast_math: bool = False

    def setup(self):
        e = self.embed_dim
        self.in_proj_kernel = self.param(
            "in_proj_kernel", nn.initializers.xavier_uniform(), (e, 3 * e), jnp.float32
        )
        self.in_proj_bias = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * e,), jnp.float32
        )
        self.out_proj = nn.Dense(e, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, self.embed_dim // self.num_heads)

    def project_q(self, x: jnp.ndarray) -> jnp.ndarray:
        e = self.embed_dim
        w = self.in_proj_kernel[:, :e].astype(self.dtype)
        b = self.in_proj_bias[:e].astype(self.dtype)
        return self._heads(x @ w + b)

    def project_kv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        e = self.embed_dim
        w = self.in_proj_kernel[:, e:].astype(self.dtype)
        b = self.in_proj_bias[e:].astype(self.dtype)
        kv = x @ w + b
        return self._heads(kv[..., :e]), self._heads(kv[..., e:])

    def project_qkv(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        e = self.embed_dim
        qkv = x @ self.in_proj_kernel.astype(self.dtype) + self.in_proj_bias.astype(self.dtype)
        return self._heads(qkv[..., :e]), self._heads(qkv[..., e : 2 * e]), self._heads(qkv[..., 2 * e :])

    def attend(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
        return_weights: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        rng = None
        if self.dropout_rate > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        out, weights = dot_product_attention(
            q,
            k,
            v,
            bias,
            dropout_rate=self.dropout_rate,
            dropout_rng=rng,
            deterministic=deterministic,
            return_weights=return_weights,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math,
        )
        b, t, _, _ = out.shape
        out = self.out_proj(out.reshape(b, t, self.embed_dim))
        return out, weights

    def __call__(
        self,
        query: jnp.ndarray,
        key_value: Optional[jnp.ndarray] = None,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_weights: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if key_value is None:
            q, k, v = self.project_qkv(query)
        else:
            q = self.project_q(query)
            k, v = self.project_kv(key_value)
        return self.attend(
            q, k, v, bias, deterministic=deterministic, return_weights=return_weights
        )


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch ``nn.TransformerEncoderLayer`` order):
    ``x = norm1(x + drop(attn(x))); x = norm2(x + drop(ff(x)))``."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False  # tpu.fast_numerics: dtype-native LN stats/softmax

    def setup(self):
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        # fp32 LayerNorm statistics are the torch-parity default; fast_math
        # keeps the reductions in the compute dtype
        nk = dict(force_float32_reductions=not self.fast_math, **mk)
        self.self_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math, name="self_attn"
        )
        self.linear1 = nn.Dense(self.dim_feedforward, name="linear1", **mk)
        self.linear2 = nn.Dense(self.embed_dim, name="linear2", **mk)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **nk)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **nk)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.dropout1 = nn.Dropout(self.dropout_rate)
        self.dropout2 = nn.Dropout(self.dropout_rate)
        self.act = activation_fn(self.activation)

    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        attn_out, _ = self.self_attn(x, bias=bias, deterministic=deterministic)
        x = self.norm1(x + self.dropout1(attn_out, deterministic=deterministic))
        ff = self.linear2(self.dropout(self.act(self.linear1(x)), deterministic=deterministic))
        x = self.norm2(x + self.dropout2(ff, deterministic=deterministic))
        return x


class TransformerEncoder(nn.Module):
    """Layer stack + final LayerNorm (reference wraps ``nn.TransformerEncoder``
    with ``norm=nn.LayerNorm`` at ``MMEncoder.py:238``)."""

    num_layers: int
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False

    def setup(self):
        self.layers = [
            TransformerEncoderLayer(
                self.embed_dim,
                self.num_heads,
                self.dim_feedforward,
                self.dropout_rate,
                self.activation,
                self.dtype,
                use_pallas=self.use_pallas,
                partition_kernels=self.partition_kernels,
                fast_math=self.fast_math,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            force_float32_reductions=not self.fast_math, name="norm"
        )

    def __call__(
        self,
        x: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        return self.norm(x)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer (torch order, ``CapDecoder.py:108-121``):
    self-attn -> norm1 -> cross-attn -> norm2 -> FFN -> norm3.

    ``decode_step`` runs one token with a KV cache; the attention-map return
    covers the reference's ``VisTransformerDecoderLayer`` capability
    (``CapDecoder.py:83-121``) without monkey-patching.
    """

    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False

    def setup(self):
        mk = dict(dtype=self.dtype, param_dtype=jnp.float32)
        nk = dict(force_float32_reductions=not self.fast_math, **mk)
        self.self_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math, name="self_attn"
        )
        self.multihead_attn = MultiHeadAttention(
            self.embed_dim, self.num_heads, self.dropout_rate, self.dtype,
            use_pallas=self.use_pallas,
            partition_kernels=self.partition_kernels,
            fast_math=self.fast_math, name="multihead_attn"
        )
        self.linear1 = nn.Dense(self.dim_feedforward, name="linear1", **mk)
        self.linear2 = nn.Dense(self.embed_dim, name="linear2", **mk)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1", **nk)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2", **nk)
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3", **nk)
        self.dropout = nn.Dropout(self.dropout_rate)
        self.dropout1 = nn.Dropout(self.dropout_rate)
        self.dropout2 = nn.Dropout(self.dropout_rate)
        self.dropout3 = nn.Dropout(self.dropout_rate)
        self.act = activation_fn(self.activation)

    def _ffn(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        return self.linear2(self.dropout(self.act(self.linear1(x)), deterministic=deterministic))

    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_bias: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        sa, _ = self.self_attn(tgt, bias=tgt_bias, deterministic=deterministic)
        x = self.norm1(tgt + self.dropout1(sa, deterministic=deterministic))
        ca, attn = self.multihead_attn(
            x, memory, bias=memory_bias, deterministic=deterministic, return_weights=return_attn
        )
        x = self.norm2(x + self.dropout2(ca, deterministic=deterministic))
        x = self.norm3(x + self.dropout3(self._ffn(x, deterministic), deterministic=deterministic))
        if attn is not None:
            attn = attn.mean(axis=1)  # torch averages attention weights over heads
        return x, attn

    # ---- KV-cached decoding -------------------------------------------------

    def init_cache(
        self, batch: int, max_len: int, memory: jnp.ndarray
    ) -> Cache:
        """Cross-attention K/V are computed once from the encoder memory; the
        self-attention cache is a fixed-size ring the step writes into."""
        h, d = self.num_heads, self.embed_dim // self.num_heads
        ck, cv = self.multihead_attn.project_kv(memory)
        return {
            "k": jnp.zeros((batch, max_len, h, d), self.dtype),
            "v": jnp.zeros((batch, max_len, h, d), self.dtype),
            "ck": ck,
            "cv": cv,
        }

    def decode_step(
        self,
        tgt_tok: jnp.ndarray,  # [B, 1, E] embedded token at position idx
        cache: Cache,
        idx: jnp.ndarray,  # scalar int32 position
        memory_bias: Optional[jnp.ndarray] = None,
        *,
        return_attn: bool = False,
    ) -> Tuple[jnp.ndarray, Cache, Optional[jnp.ndarray]]:
        max_len = cache["k"].shape[1]
        q, k1, v1 = self.self_attn.project_qkv(tgt_tok)
        k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k1, idx, axis=1)
        v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v1, idx, axis=1)
        # causal: key positions > idx are future (zeros in the cache) -> mask.
        pos = jnp.arange(max_len)
        step_bias = jnp.where(pos <= idx, 0.0, NEG_INF).astype(jnp.float32)[None, None, None, :]
        sa, _ = self.self_attn.attend(q, k, v, step_bias, deterministic=True)
        x = self.norm1(tgt_tok + sa)
        cq = self.multihead_attn.project_q(x)
        ca, attn = self.multihead_attn.attend(
            cq, cache["ck"], cache["cv"], memory_bias, deterministic=True,
            return_weights=return_attn,
        )
        x = self.norm2(x + ca)
        x = self.norm3(x + self._ffn(x, True))
        if attn is not None:
            attn = attn.mean(axis=1)
        return x, {**cache, "k": k, "v": v}, attn


class TransformerDecoder(nn.Module):
    """Decoder stack + final LayerNorm (reference ``nn.TransformerDecoder``
    with ``norm=nn.LayerNorm`` at ``CapDecoder.py:20``)."""

    num_layers: int
    embed_dim: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout_rate: float = 0.1
    activation: str = "gelu"
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    partition_kernels: bool = False
    fast_math: bool = False

    def setup(self):
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim,
                self.num_heads,
                self.dim_feedforward,
                self.dropout_rate,
                self.activation,
                self.dtype,
                use_pallas=self.use_pallas,
                partition_kernels=self.partition_kernels,
                fast_math=self.fast_math,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
            force_float32_reductions=not self.fast_math, name="norm"
        )

    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        tgt_bias: Optional[jnp.ndarray] = None,
        memory_bias: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        attns = []
        x = tgt
        for layer in self.layers:
            x, attn = layer(
                x,
                memory,
                tgt_bias,
                memory_bias,
                deterministic=deterministic,
                return_attn=return_attn,
            )
            if return_attn:
                attns.append(attn)
        x = self.norm(x)
        return x, (jnp.stack(attns, axis=0) if return_attn else None)

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray) -> Tuple[Cache, ...]:
        return tuple(layer.init_cache(batch, max_len, memory) for layer in self.layers)

    def decode_step(
        self,
        tgt_tok: jnp.ndarray,
        caches: Tuple[Cache, ...],
        idx: jnp.ndarray,
        memory_bias: Optional[jnp.ndarray] = None,
        *,
        return_attn: bool = False,
    ) -> Tuple[jnp.ndarray, Tuple[Cache, ...], Optional[jnp.ndarray]]:
        x = tgt_tok
        new_caches = []
        attns = []
        for layer, cache in zip(self.layers, caches):
            x, cache, attn = layer.decode_step(
                x, cache, idx, memory_bias, return_attn=return_attn
            )
            new_caches.append(cache)
            if return_attn:
                attns.append(attn)
        x = self.norm(x)
        return x, tuple(new_caches), (jnp.stack(attns, axis=0) if return_attn else None)
