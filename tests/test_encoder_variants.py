"""SimpleSep + HMME encoder variants: semantics per ``MMEncoder.py:280-402``.

The HMME oracle below independently re-implements the reference's
hierarchical loop (``MMEncoder.py:385-398``) on top of the bound layer
modules, so the encoder's staging logic is checked against a second
derivation rather than itself.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.models.encoder import HMMEncoder, SimpleSepEncoder
from vct_tpu.models.mmt4caption import MMT4Caption

B, T1, T2, D1, D2, E, H, FF = 2, 5, 3, 12, 8, 16, 2, 32


def _srcs(rng):
    return (
        [jnp.asarray(rng.standard_normal((B, T1, D1)), jnp.float32),
         jnp.asarray(rng.standard_normal((B, T2, D2)), jnp.float32)],
        [jnp.zeros((B, T1), bool).at[1, -2:].set(True),
         jnp.zeros((B, T2), bool)],
    )


class TestSimpleSep:
    @pytest.fixture(scope="class")
    def enc(self):
        rng = np.random.default_rng(0)
        srcs, masks = _srcs(rng)
        m = SimpleSepEncoder(d_feats=(D1, D2), d_model=E, nhead=H,
                             dim_feedforward=FF, dropout_rate=0.0,
                             num_encoder_layers=1)
        v = m.init(jax.random.PRNGKey(0), srcs, masks)
        return m, v, srcs, masks

    def test_shapes_and_no_agg(self, enc):
        m, v, srcs, masks = enc
        mem, mask, agg = m.apply(v, srcs, masks)
        # no global token per modality -> T1 + T2 positions, no agg feature
        assert mem.shape == (B, T1 + T2, E)
        assert mask is None and agg is None

    def test_modalities_are_independent(self, enc):
        """Per-modality encoders never attend across modalities
        (``MMEncoder.py:292-295``: separate cloned encoders)."""
        m, v, srcs, masks = enc
        mem1, _, _ = m.apply(v, srcs, masks)
        perturbed = [srcs[0], srcs[1] + 10.0]
        mem2, _, _ = m.apply(v, perturbed, masks)
        np.testing.assert_array_equal(
            np.asarray(mem1[:, :T1]), np.asarray(mem2[:, :T1])
        )
        assert np.abs(np.asarray(mem1[:, T1:]) - np.asarray(mem2[:, T1:])).max() > 1e-3

    def test_padding_does_not_leak(self, enc):
        m, v, srcs, masks = enc
        mem1, _, _ = m.apply(v, srcs, masks)
        poisoned = [srcs[0].at[1, -2:].set(1e3), srcs[1]]
        mem2, _, _ = m.apply(v, poisoned, masks)
        np.testing.assert_allclose(
            np.asarray(mem1[1, : T1 - 2]), np.asarray(mem2[1, : T1 - 2]), atol=1e-5
        )


class TestHMME:
    @pytest.fixture(scope="class")
    def enc(self):
        rng = np.random.default_rng(1)
        srcs, masks = _srcs(rng)
        m = HMMEncoder(d_feats=(D1, D2), d_model=E, nhead=H, dim_feedforward=FF,
                       dropout_rate=0.0, num_encoder_layers=(2, 1))
        v = m.init(jax.random.PRNGKey(0), srcs, masks)
        return m, v, srcs, masks

    def test_shapes_and_agg(self, enc):
        m, v, srcs, masks = enc
        mem, mask, agg = m.apply(v, srcs, masks)
        assert mem.shape == (B, (T1 + 1) + (T2 + 1), E)  # +1 global per modality
        assert mask.shape == (B, T1 + 1 + T2 + 1)
        # agg = sum of per-modal global tokens (intended MMEncoder.py:399)
        expect = np.asarray(mem[:, 0]) + np.asarray(mem[:, T1 + 1])
        np.testing.assert_allclose(np.asarray(agg), expect, atol=1e-6)

    def test_matches_reference_loop_oracle(self, enc):
        """Re-derive the output with the reference's staging loop
        (``MMEncoder.py:385-398``) using the bound submodules."""
        m, v, srcs, masks = enc
        mem, _, _ = m.apply(v, srcs, masks)

        bound = m.bind(v)
        fused, fused_mask, lengths = bound._front_end(srcs, masks, True)
        from vct_tpu.ops.attention import padding_bias

        bias = padding_bias(fused_mask)
        offsets = np.cumsum([0] + list(lengths))
        depth = max(m.num_encoder_layers)
        target = [depth - n for n in m.num_encoder_layers]
        ori = [fused[:, offsets[j]:offsets[j + 1]] for j in range(2)]
        last = list(ori)
        for i in range(depth):
            inputs = [last[j] if target[j] < i else ori[j] for j in range(2)]
            out = bound.trans_enc_layers[i](jnp.concatenate(inputs, axis=1), bias)
            last = [out[:, offsets[j]:offsets[j + 1]] for j in range(2)]
        oracle = jnp.concatenate(last, axis=1)
        np.testing.assert_allclose(np.asarray(mem), np.asarray(oracle), atol=1e-6)

    def test_shallow_modality_is_single_layer(self, enc):
        """With layers (2, 1), modality 1 must be processed by exactly ONE
        layer from its ORIGINAL embedding — its layer-0 output is discarded."""
        m, v, srcs, masks = enc
        mem, _, _ = m.apply(v, srcs, masks)

        bound = m.bind(v)
        fused, fused_mask, lengths = bound._front_end(srcs, masks, True)
        from vct_tpu.ops.attention import padding_bias

        bias = padding_bias(fused_mask)
        off = lengths[0]
        # layer 0 processes [ori0, ori1]; layer 1 processes [last0, ORI1]
        out0 = bound.trans_enc_layers[0](fused, bias)
        last0 = out0[:, :off]
        out1 = bound.trans_enc_layers[1](
            jnp.concatenate([last0, fused[:, off:]], axis=1), bias
        )
        np.testing.assert_allclose(
            np.asarray(mem[:, off:]), np.asarray(out1[:, off:]), atol=1e-6
        )


@pytest.mark.parametrize("enc_type,layer", [("simple", 1), ("hmme", [2, 1])])
def test_mmt4caption_variant_integration(enc_type, layer):
    """caption_loss + greedy decode run through MMT4Caption for each variant
    (the reference's config routing, ``MMT4Caption.py:44-85``)."""
    from vct_tpu.decode import make_greedy_fn

    cfg = ModelConfig.from_dict({
        "modal": ["a", "b"], "modal_shape": [D1, D2], "embed_dim": E,
        "dropout": 0.0, "vocab_size": 30,
        "video_encoder": {"type": enc_type, "layer": layer, "nhead": H,
                          "feedforward": FF,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": 1, "nhead": H, "feedforward": FF},
    })
    model = MMT4Caption(cfg, TPUConfig(dtype="float32"))
    rng = np.random.default_rng(2)
    srcs, masks = _srcs(rng)
    caps = jnp.zeros((B, 6), jnp.int32).at[:, 0].set(2).at[:, -1].set(1)
    variables = model.init(jax.random.PRNGKey(0), srcs, masks, caps, caps == 0,
                           method=MMT4Caption.caption_loss)
    loss = model.apply(variables, srcs, masks, caps, caps == 0,
                       method=MMT4Caption.caption_loss)
    assert np.isfinite(float(loss))
    tokens, _ = make_greedy_fn(model, 6, 2, 1)(variables, srcs, masks)
    assert tokens.shape == (B, 6)
