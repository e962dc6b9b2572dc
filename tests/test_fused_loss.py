"""Fused LM-head+SCE loss (ops.fused_loss) vs the materialized-logits path.

The fused path must be a pure performance substitution: identical parts
(ce_sum, ce_n, rce_sum, rce_n) and identical gradients to float summation
order, for every mask combination the decoder produces (pad labels, rect
mask, filler-row valid mask), for CE-only (alpha=1) and SCE, and for vocab
sizes that don't divide the chunk width.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.models.losses import sce_loss_parts, cross_entropy_parts
from vct_tpu.ops.fused_loss import linear_sce_parts


def _data(n=53, e=64, v=997, seed=0, pad_frac=0.2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, e)).astype(np.float32))
    wg = jnp.asarray((rng.standard_normal((e, v)) * 0.05).astype(np.float32))
    bg = jnp.asarray((rng.standard_normal((v,)) * 0.01).astype(np.float32))
    labels = rng.integers(1, v, (n,))
    labels[rng.random(n) < pad_frac] = 0
    labels = jnp.asarray(labels.astype(np.int32))
    rect = jnp.asarray(rng.random(n) > 0.25)
    valid = jnp.asarray(rng.random(n) > 0.15)
    return x, wg, bg, labels, rect, valid


def _unfused(x, wg, bg, labels, rect, valid):
    logits = x @ wg + bg
    return sce_loss_parts(logits, labels, ignore_index=0, rect_mask=rect, valid=valid)


def _fused(x, wg, bg, labels, rect, valid, block_v=256, with_rce=True):
    keep = (labels != 0).astype(jnp.float32) * valid.astype(jnp.float32)
    m = rect.astype(jnp.float32) * valid.astype(jnp.float32)
    return linear_sce_parts(x, wg, bg, labels, keep, m, jnp.float32, block_v, with_rce)


class TestValues:
    def test_parts_match(self):
        args = _data()
        a = _unfused(*args)
        b = _fused(*args)
        for u, f in zip(a, b):
            np.testing.assert_allclose(np.asarray(u), np.asarray(f), rtol=3e-6)

    def test_ragged_vocab_chunking(self):
        # v=997 with block 256 pads to 1024: the 27 pad columns must not
        # leak into lse or the clipped-prob sum (each would add 1e-7)
        args = _data(v=997)
        one = _fused(*args, block_v=1024)  # single chunk, no padding effect
        many = _fused(*args, block_v=256)
        for u, f in zip(one, many):
            np.testing.assert_allclose(np.asarray(u), np.asarray(f), rtol=3e-6)

    def test_ce_only(self):
        x, wg, bg, labels, rect, valid = _data()
        logits = x @ wg + bg
        keep_valid = valid
        ce_sum, ce_n = cross_entropy_parts(logits, labels, 0, keep_valid)
        f = _fused(x, wg, bg, labels, rect, valid, with_rce=False)
        np.testing.assert_allclose(np.asarray(ce_sum), np.asarray(f[0]), rtol=3e-6)
        np.testing.assert_allclose(np.asarray(ce_n), np.asarray(f[1]))
        assert float(f[2]) == 0.0 and float(f[3]) == 0.0


class TestGradients:
    def test_grads_match(self):
        x, wg, bg, labels, rect, valid = _data()

        def loss_u(x, wg, bg):
            c, cn, r, rn = _unfused(x, wg, bg, labels, rect, valid)
            return 0.5 * c / jnp.maximum(cn, 1.0) + 0.5 * r / jnp.maximum(rn, 1.0)

        def loss_f(x, wg, bg):
            c, cn, r, rn = _fused(x, wg, bg, labels, rect, valid)
            return 0.5 * c / jnp.maximum(cn, 1.0) + 0.5 * r / jnp.maximum(rn, 1.0)

        gu = jax.grad(loss_u, argnums=(0, 1, 2))(x, wg, bg)
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(x, wg, bg)
        for u, f in zip(gu, gf):
            u, f = np.asarray(u), np.asarray(f)
            scale = max(np.abs(u).max(), 1e-8)
            assert np.abs(u - f).max() / scale < 1e-5

    def test_stash_matches_recompute_bf16(self):
        # stash=True replaces the backward's logit recompute with the stored
        # bf16 chunk logits — the same VALUES the recompute rounds to. The
        # two compiled programs may still reassociate the downstream
        # reductions differently, so the guarantee is float-summation order
        # (the same caveat as fused-vs-unfused), not bitwise equality.
        x, wg, bg, labels, rect, valid = _data(seed=7)
        keep = (labels != 0).astype(jnp.float32) * valid.astype(jnp.float32)
        m = rect.astype(jnp.float32) * valid.astype(jnp.float32)

        def loss(stash):
            def f(x, wg, bg):
                c, cn, r, rn = linear_sce_parts(
                    x, wg, bg, labels, keep, m, jnp.bfloat16, 256, True, stash)
                return 0.5 * c / jnp.maximum(cn, 1.0) + 0.5 * r / jnp.maximum(rn, 1.0)
            return f

        vs, gs = jax.value_and_grad(loss(True), argnums=(0, 1, 2))(x, wg, bg)
        vr, gr = jax.value_and_grad(loss(False), argnums=(0, 1, 2))(x, wg, bg)
        np.testing.assert_allclose(float(vs), float(vr), rtol=1e-5)
        for a, b in zip(gs, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(b).max(), 1e-8)
            # bf16 grads are ~1e-3 here and the absolute reassociation noise
            # is ~1e-7; 2e-4 bounds the observed 6.5e-5 with headroom
            assert np.abs(a - b).max() / scale < 2e-4

    def test_grads_match_jit(self):
        x, wg, bg, labels, rect, valid = _data(seed=3)

        @jax.jit
        def g(x, wg, bg):
            def loss(x, wg, bg):
                c, cn, r, rn = _fused(x, wg, bg, labels, rect, valid)
                return c / jnp.maximum(cn, 1.0) + r / jnp.maximum(rn, 1.0)
            return jax.grad(loss, argnums=(0, 1, 2))(x, wg, bg)

        def loss_u(x, wg, bg):
            c, cn, r, rn = _unfused(x, wg, bg, labels, rect, valid)
            return c / jnp.maximum(cn, 1.0) + r / jnp.maximum(rn, 1.0)

        gu = jax.grad(loss_u, argnums=(0, 1, 2))(x, wg, bg)
        for u, f in zip(gu, g(x, wg, bg)):
            u, f = np.asarray(u), np.asarray(f)
            scale = max(np.abs(u).max(), 1e-8)
            assert np.abs(u - f).max() / scale < 1e-5


class TestModelIntegration:
    @pytest.fixture(scope="class")
    def setup(self):
        from __graft_entry__ import _batch, _flagship
        from vct_tpu.models.mmt4caption import MMT4Caption
        import dataclasses
        from vct_tpu.config import TPUConfig

        vocab = 500
        model_f = _flagship(vocab_size=vocab, embed=64, d_feat=32, dec_layers=2, ff=96)
        model_u = MMT4Caption(
            model_f.config,
            dataclasses.replace(model_f.tpu, use_fused_loss=False),
            dtype=model_f.dtype,
        )
        feats, masks, caps, cap_mask = _batch(6, 5, 9, 32, vocab)
        variables = model_f.init(
            jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
            method=MMT4Caption.caption_loss,
        )
        return model_f, model_u, variables, feats, masks, caps, cap_mask

    def test_caption_loss_value(self, setup):
        from vct_tpu.models.mmt4caption import MMT4Caption

        model_f, model_u, variables, feats, masks, caps, cap_mask = setup
        row_valid = jnp.asarray([True, True, True, True, False, False])
        lf = model_f.apply(variables, feats, masks, caps, cap_mask,
                           row_valid=row_valid, method=MMT4Caption.caption_loss)
        lu = model_u.apply(variables, feats, masks, caps, cap_mask,
                           row_valid=row_valid, method=MMT4Caption.caption_loss)
        np.testing.assert_allclose(float(lf), float(lu), rtol=1e-5)

    def test_caption_loss_grads(self, setup):
        from vct_tpu.models.mmt4caption import MMT4Caption

        model_f, model_u, variables, feats, masks, caps, cap_mask = setup

        def make_loss(model):
            def loss(params):
                return model.apply(
                    {"params": params, "buffers": variables["buffers"]},
                    feats, masks, caps, cap_mask, method=MMT4Caption.caption_loss)
            return loss

        gf = jax.grad(make_loss(model_f))(variables["params"])
        gu = jax.grad(make_loss(model_u))(variables["params"])
        flat_f = jax.tree_util.tree_leaves_with_path(gf)
        flat_u = {jax.tree_util.keystr(k): v
                  for k, v in jax.tree_util.tree_leaves_with_path(gu)}
        assert flat_f and len(flat_f) == len(flat_u)
        for k, v in flat_f:
            u = np.asarray(flat_u[jax.tree_util.keystr(k)])
            f = np.asarray(v)
            scale = max(np.abs(u).max(), 1e-8)
            assert np.abs(u - f).max() / scale < 2e-5, jax.tree_util.keystr(k)

    def test_parts_path(self, setup):
        from vct_tpu.models.mmt4caption import MMT4Caption

        model_f, model_u, variables, feats, masks, caps, cap_mask = setup
        pf = model_f.apply(variables, feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss_parts)
        pu = model_u.apply(variables, feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss_parts)
        for f, u in zip(pf, pu):
            np.testing.assert_allclose(np.asarray(f), np.asarray(u), rtol=1e-5)

    def test_logits_path_still_materializes(self, setup):
        from vct_tpu.models.mmt4caption import MMT4Caption

        model_f, _, variables, feats, masks, caps, cap_mask = setup
        logits, loss, _ = model_f.apply(
            variables, feats, masks, caps, cap_mask,
            method=MMT4Caption.caption_logits)
        assert logits.shape == (6, caps.shape[1] - 1, 500)
        assert np.isfinite(float(loss))
