"""``tpu.fast_numerics`` (round-4 VERDICT #5): opt-in compute-dtype softmax
logits + LayerNorm statistics, quantifying the torch-parity fp32 tax.

Guarantees pinned here: the flag is OFF by default (every parity test in the
suite runs the exact path), a bf16 model with the flag on stays numerically
close (it's the same math at lower statistic precision, not a different
algorithm), it genuinely changes the computation (otherwise the A/B in
tools/profile.py numerics-ab measures nothing), and with fp32 compute dtype
it is a no-op (there is no lower-precision statistic to drop to).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.models.mmt4caption import MMT4Caption

_MODEL_D = {
    "modal": ["clip4clip"],
    "modal_shape": [64],
    "embed_dim": 64,
    "dropout": 0.0,
    "tokenizer": "bert-base-uncased",
    "text_enc_type": None,
    "video_encoder": {
        "layer": 1, "nhead": 4, "feedforward": 128,
        "mme": {"temporal": "encoding", "modal_different": False,
                "do_norm": False, "aggregation": "avg"},
    },
    "caption_decoder": {"layer": 2, "nhead": 4, "feedforward": 128,
                        "sce_loss_alpha": 0.5},
}


def _loss(dtype, fast):
    cfg = dataclasses.replace(ModelConfig.from_dict(_MODEL_D), vocab_size=64)
    tpu = TPUConfig(fast_numerics=fast, use_pallas_attention=False,
                    use_fused_loss=False)
    model = MMT4Caption(cfg, tpu, dtype=dtype)
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((4, 6, 64)), dtype)]
    caps = jnp.asarray(np.random.default_rng(1).integers(1, 64, (4, 12)),
                       jnp.int32)
    v = model.init(jax.random.PRNGKey(0), feats, None, caps, caps == 0,
                   method=MMT4Caption.caption_loss)
    return float(model.apply(v, feats, None, caps, caps == 0,
                             method=MMT4Caption.caption_loss))


def test_default_is_off():
    assert TPUConfig().fast_numerics is False
    assert TPUConfig.from_dict({"fast_numerics": True}).fast_numerics is True


def test_bf16_fast_mode_close_but_distinct():
    exact = _loss(jnp.bfloat16, False)
    fast = _loss(jnp.bfloat16, True)
    assert fast != exact, "fast mode must actually change bf16 numerics"
    assert abs(fast - exact) / abs(exact) < 0.02, (exact, fast)


def test_fp32_fast_mode_is_noop():
    assert _loss(jnp.float32, True) == _loss(jnp.float32, False)


def test_fast_numerics_keeps_decode_on_the_module_graph(monkeypatch):
    """fast_numerics drops the module graph to compute-dtype LN stats /
    softmax logits while the fused decode kernels keep their fp32 schedule,
    so the two paths are no longer token-exact. The auto dispatch must not
    mix them: with the flag on it returns the module-graph program without
    ever building the fused path (round-5 review finding)."""
    import vct_tpu.decode_fast as df
    from vct_tpu.decode import make_auto_beam_fn, make_auto_greedy_fn

    cfg = dataclasses.replace(ModelConfig.from_dict(_MODEL_D), vocab_size=64)

    def boom(*a, **k):
        raise AssertionError("fused path built despite fast_numerics")

    monkeypatch.setattr(df, "make_fused_greedy_fn", boom)
    monkeypatch.setattr(df, "make_fused_beam_fn", boom)

    # interpret=True takes the on-TPU dispatch branch on this CPU host
    model = MMT4Caption(
        cfg, TPUConfig(fast_numerics=True, use_pallas_attention=True),
        dtype=jnp.float32)
    make_auto_greedy_fn(model, 8, 2, 3, interpret=True)
    make_auto_beam_fn(model, 8, 2, 3, beam_size=2, interpret=True)

    # control: with the flag off the same calls DO build the fused path
    model0 = MMT4Caption(
        cfg, TPUConfig(fast_numerics=False, use_pallas_attention=True),
        dtype=jnp.float32)
    with pytest.raises(AssertionError, match="despite fast_numerics"):
        make_auto_greedy_fn(model0, 8, 2, 3, interpret=True)
    with pytest.raises(AssertionError, match="despite fast_numerics"):
        make_auto_beam_fn(model0, 8, 2, 3, beam_size=2, interpret=True)


def test_fast_numerics_routes_attention_to_xla(monkeypatch):
    """fast_math must not be silently ignored on kernel-eligible shapes:
    the Pallas attention kernel keeps its fp32 softmax schedule, so the
    dispatch routes fast_math to the XLA path (which honors it) — same
    rule as the decode dispatch guard."""
    from vct_tpu.ops import attention as at

    monkeypatch.setattr(at, "FORCE_PALLAS_INTERPRET", True)

    def boom(*a, **k):
        raise AssertionError("Pallas attention built despite fast_math")

    import vct_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "fused_attention_trainable", boom)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 8, 4, 16)), jnp.float32)
    out, w = at.dot_product_attention(q, q, q, use_pallas=True,
                                      fast_math=True, deterministic=True)
    assert out.shape == q.shape and w is None
    # control: with fast_math off the same call DOES take the kernel
    with pytest.raises(AssertionError, match="despite fast_math"):
        at.dot_product_attention(q, q, q, use_pallas=True,
                                 fast_math=False, deterministic=True)
