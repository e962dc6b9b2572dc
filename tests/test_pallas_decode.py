"""Fused decode-step kernels vs the module-graph greedy path (interpret mode
on CPU; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.decode import greedy_generate
from vct_tpu.decode_fast import greedy_generate_fused
from vct_tpu.models.mmt4caption import MMT4Caption

B, T, D_FEAT, E, H, FF, VOCAB, MAX_LEN = 4, 6, 24, 128, 4, 256, 50, 10


def _model(quirk=False, dec_layers=2):
    cfg = ModelConfig.from_dict({
        "modal": ["CLIP4Clip"], "modal_shape": [D_FEAT], "embed_dim": E,
        "dropout": 0.0, "vocab_size": VOCAB, "activation": "gelu",
        "video_encoder": {"layer": 1, "nhead": H, "feedforward": FF,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": dec_layers, "nhead": H, "feedforward": FF,
                            "sce_loss_alpha": 0.5},
    })
    return MMT4Caption(cfg, TPUConfig(quirk_no_memory_mask_in_decoder=quirk))


def _init(model, rng):
    feats = [jnp.asarray(rng.standard_normal((B, T, D_FEAT)).astype(np.float32))]
    pad = np.zeros((B, T), bool)
    pad[1, -2:] = True
    masks = [jnp.asarray(pad)]
    caps = jnp.zeros((B, MAX_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(3), feats, masks, caps, caps == 0,
                           method=MMT4Caption.caption_loss)
    return feats, masks, variables


@pytest.mark.parametrize("quirk", [False, True])
@pytest.mark.parametrize("single_kernel", [False, True])
def test_fused_greedy_token_exact(rng, quirk, single_kernel):
    """The fused decode (two-kernel tiled path AND the small-batch
    whole-step kernel) must reproduce the module-graph greedy's token ids
    exactly (fp32; padded memory exercises the mem-bias path)."""
    model = _model(quirk=quirk)
    feats, masks, variables = _init(model, rng)
    ref_tokens, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=-1,
    )
    fused_tokens, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=-1,
        block_b=2, block_v=256, single_kernel=single_kernel, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused_tokens), np.asarray(ref_tokens))


def test_fused_greedy_early_stop(rng):
    """end_id semantics: rows keep receiving argmax tokens until all finish,
    exactly like the module path."""
    model = _model()
    feats, masks, variables = _init(model, rng)
    ref_tokens, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    fused_tokens, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        block_b=2, block_v=256, single_kernel=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused_tokens), np.asarray(ref_tokens))


def test_fused_greedy_three_layers(rng):
    model = _model(dec_layers=3)
    feats, masks, variables = _init(model, rng)
    ref_tokens, _ = greedy_generate(
        model, variables, feats, masks, max_len=8, start_id=2, end_id=-1,
    )
    fused_tokens, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=8, start_id=2, end_id=-1,
        block_b=4, block_v=256, single_kernel=False, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused_tokens), np.asarray(ref_tokens))


def test_generator_argmax_kernel_alone(rng):
    """LayerNorm + vocab projection + argmax == the XLA composition, with
    vocab padding never winning."""
    from vct_tpu.decode_fast import _round_up
    from vct_tpu.ops.pallas_decode import fused_norm_generator_argmax

    b, e, v, bv = 8, 128, 300, 128
    x = jnp.asarray(rng.standard_normal((b, e)).astype(np.float32))
    ns = jnp.asarray(rng.standard_normal((e,)).astype(np.float32))
    nb = jnp.asarray(rng.standard_normal((e,)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((e, v)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((v,)).astype(np.float32))

    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ns + nb
    ref = jnp.argmax(y @ wg + bg, axis=-1)

    v_pad = _round_up(v, bv)
    wg_p = jnp.pad(wg, ((0, 0), (0, v_pad - v)))
    bg_p = jnp.pad(bg, (0, v_pad - v), constant_values=-1e30)
    out = fused_norm_generator_argmax(x, ns, nb, wg_p, bg_p,
                                      block_b=4, block_v=bv, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_stacked_layers_kernel_matches_per_layer(rng):
    """fused_layers_step (whole stack, one launch) is bit-exact with the
    sequential per-layer fused_layer_step composition, including the
    in-place cache-row writes, after several seeded steps."""
    from vct_tpu.ops.pallas_decode import fused_layer_step, fused_layers_step

    b, e, f, h, l, tm, nl = 8, 128, 256, 4, 16, 8, 3
    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    layers = [dict(wqkv=t(e, 3 * e), bqkv=t(3 * e), wo=t(e, e), bo=t(e),
                   wcq=t(e, e), bcq=t(e), wco=t(e, e), bco=t(e),
                   n1s=jnp.ones(e), n1b=t(e), n2s=jnp.ones(e), n2b=t(e),
                   w1=t(e, f), b1=t(f), w2=t(f, e), b2=t(e),
                   n3s=jnp.ones(e), n3b=t(e)) for _ in range(nl)]
    stacked = {k: jnp.stack([lw[k] for lw in layers]) for k in layers[0]}
    kc = [jnp.zeros((l, b, e)) for _ in range(nl)]
    vc = [jnp.zeros((l, b, e)) for _ in range(nl)]
    ck = [t(tm, b, e) for _ in range(nl)]
    cv = [t(tm, b, e) for _ in range(nl)]
    mem_bias = jnp.where(jnp.asarray(rng.random((b, tm)) < 0.25),
                         -1e30, 0.0).astype(jnp.float32)
    ks, vs = jnp.stack(kc), jnp.stack(vc)
    cks, cvs = jnp.stack(ck), jnp.stack(cv)

    for idx in range(3):
        x = t(b, e)
        x_ref = x
        for li in range(nl):
            x_ref, kc[li], vc[li] = fused_layer_step(
                x_ref, kc[li], vc[li], ck[li], cv[li], mem_bias, layers[li],
                idx, heads=h, block_b=4, interpret=True)
        x_new, ks, vs = fused_layers_step(
            x, ks, vs, cks, cvs, mem_bias, stacked, idx,
            heads=h, block_b=4, interpret=True)
        np.testing.assert_array_equal(np.asarray(x_ref), np.asarray(x_new))
        np.testing.assert_array_equal(np.asarray(jnp.stack(kc)), np.asarray(ks))
        np.testing.assert_array_equal(np.asarray(jnp.stack(vc)), np.asarray(vs))


def test_stacked_layers_step_window_violation_poisons_output(rng):
    """fused_layers_step's window contract (idx < staged cache length):
    past the window the kernel's pos iota never matches idx and the fresh
    token's K/V silently drops out of self-attention — the guard must
    poison the hidden state to NaN so the violation is unmissable, and
    must NOT fire inside the window."""
    from vct_tpu.ops.pallas_decode import fused_layers_step

    b, e, f, h, l, tm, nl = 8, 128, 256, 4, 8, 8, 2
    def t(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    stacked = {k: jnp.stack([t(*shape) for _ in range(nl)])
               for k, shape in dict(
                   wqkv=(e, 3 * e), bqkv=(3 * e,), wo=(e, e), bo=(e,),
                   wcq=(e, e), bcq=(e,), wco=(e, e), bco=(e,),
                   n1s=(e,), n1b=(e,), n2s=(e,), n2b=(e,),
                   w1=(e, f), b1=(f,), w2=(f, e), b2=(e,),
                   n3s=(e,), n3b=(e,)).items()}
    ks = jnp.zeros((nl, l, b, e))
    vs = jnp.zeros((nl, l, b, e))
    cks, cvs = t(nl, tm, b, e), t(nl, tm, b, e)
    mem_bias = jnp.zeros((b, tm), jnp.float32)

    x_in, idx_in = t(b, e), l - 1  # last in-window row: real output
    x_ok, _, _ = fused_layers_step(x_in, ks, vs, cks, cvs, mem_bias,
                                   stacked, idx_in, heads=h, block_b=4,
                                   interpret=True)
    assert np.isfinite(np.asarray(x_ok)).all()
    x_bad, _, _ = fused_layers_step(x_in, ks, vs, cks, cvs, mem_bias,
                                    stacked, l, heads=h, block_b=4,
                                    interpret=True)
    assert np.isnan(np.asarray(x_bad)).all()


def test_single_kernel_block_b_conflict(rng):
    """Explicit single_kernel=True with block_b > 32 is rejected clearly;
    auto-selection never fights an explicit large tile (falls back to the
    two-kernel path instead of clamping the caller's choice)."""
    model = _model()
    feats, masks, variables = _init(model, rng)
    with pytest.raises(ValueError, match="single_kernel needs block_b <= 32"):
        greedy_generate_fused(
            model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
            end_id=-1, block_b=64, single_kernel=True, interpret=True,
        )


# ---------------------------------------------------------------------------
# shard_mapped fused decode (multi-device mesh)
# ---------------------------------------------------------------------------


def _init_wide(model, rng, b):
    feats = [jnp.asarray(rng.standard_normal((b, T, D_FEAT)).astype(np.float32))]
    pad = np.zeros((b, T), bool)
    pad[1, -2:] = True
    pad[b - 3, -3:] = True
    masks = [jnp.asarray(pad)]
    caps = jnp.zeros((b, MAX_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(3), feats, masks, caps, caps == 0,
                           method=MMT4Caption.caption_loss)
    return feats, masks, variables


def test_fused_sharded_token_exact(rng):
    """greedy_generate_fused_sharded on the 8-device mesh reproduces the
    single-device module-graph token matrix exactly (end_id never fires, so
    per-shard early exit can't diverge the post-[SEP] filler)."""
    from vct_tpu.decode_fast import greedy_generate_fused_sharded
    from vct_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

    model = _model()
    b = 16
    feats, masks, variables = _init_wide(model, rng, b)
    ref_tokens, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=-1,
    )

    mesh = make_mesh()
    v_sh = replicate(mesh, variables)
    f_sh = shard_batch_arrays(mesh, feats)
    m_sh = shard_batch_arrays(mesh, masks)
    tokens, _ = jax.jit(
        lambda v, f, m: greedy_generate_fused_sharded(
            model, v, f, m, mesh=mesh, max_len=MAX_LEN, start_id=2, end_id=-1,
            block_v=256, interpret=True,
        )
    )(v_sh, f_sh, m_sh)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(ref_tokens))


def test_fused_sharded_caption_exact_with_early_stop(rng):
    """With a live end_id each shard may exit its loop earlier than the
    global program (its local rows all finished), so post-[SEP] filler can
    differ — but the user-visible contract, the caption truncated at the
    first [SEP] (reference MMT4Caption.py:174-183), must match row for row."""
    from vct_tpu.decode_fast import greedy_generate_fused_sharded
    from vct_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

    model = _model()
    b = 16
    feats, masks, variables = _init_wide(model, rng, b)
    end_id = 7
    ref_tokens, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
        end_id=end_id,
    )

    mesh = make_mesh()
    tokens, _ = jax.jit(
        lambda v, f, m: greedy_generate_fused_sharded(
            model, v, f, m, mesh=mesh, max_len=MAX_LEN, start_id=2,
            end_id=end_id, block_v=256, interpret=True,
        )
    )(replicate(mesh, variables), shard_batch_arrays(mesh, feats),
      shard_batch_arrays(mesh, masks))

    def truncate(row):
        row = list(row)
        return row[: row.index(end_id) + 1] if end_id in row else row

    for got, ref in zip(np.asarray(tokens).tolist(),
                        np.asarray(ref_tokens).tolist()):
        assert truncate(got) == truncate(ref)


def test_fused_sharded_supported_predicate():
    from vct_tpu.decode_fast import fused_decode_sharded_supported

    assert fused_decode_sharded_supported(2048, 8)   # 256/shard -> block 64
    assert fused_decode_sharded_supported(16, 8)     # 2/shard -> block 2
    assert not fused_decode_sharded_supported(12, 8)  # not divisible
    assert not fused_decode_sharded_supported(88, 8)  # 11/shard: >8, not %8


# ---------------------------------------------------------------------------
# fused beam search (top-k kernel + beam loop)
# ---------------------------------------------------------------------------


def test_topk_kernel_matches_xla(rng):
    """fused_norm_generator_topk's values/ids/logsumexp == lax.top_k +
    logsumexp of the XLA norm+projection composition, padding never
    selected, lowest-index tie-breaks preserved."""
    from vct_tpu.decode_fast import _round_up
    from vct_tpu.ops.pallas_decode import fused_norm_generator_topk

    b, e, v, bv, k = 8, 128, 300, 128, 4
    x = jnp.asarray(rng.standard_normal((b, e)).astype(np.float32))
    ns = jnp.asarray(rng.standard_normal((e,)).astype(np.float32))
    nb = jnp.asarray(rng.standard_normal((e,)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((e, v)).astype(np.float32))
    bg = jnp.asarray(rng.standard_normal((v,)).astype(np.float32))

    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ns + nb
    logits = y @ wg + bg
    ref_v, ref_i = jax.lax.top_k(logits, k)
    ref_lse = jax.nn.logsumexp(logits, axis=-1)

    v_pad = _round_up(v, bv)
    wg_p = jnp.pad(wg, ((0, 0), (0, v_pad - v)))
    bg_p = jnp.pad(bg, (0, v_pad - v), constant_values=-1e30)
    tv, ti, lse = fused_norm_generator_topk(
        x, ns, nb, wg_p, bg_p, k=k, block_b=4, block_v=bv, interpret=True)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(tv), np.asarray(ref_v), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse), rtol=1e-6)


def test_topk_kernel_tie_break_across_tiles(rng):
    """Duplicated max values spanning vocab tiles must resolve to the
    LOWEST absolute id, exactly like lax.top_k."""
    from vct_tpu.ops.pallas_decode import fused_norm_generator_topk

    b, e, v, bv, k = 4, 128, 256, 128, 3
    x = jnp.asarray(rng.standard_normal((b, e)).astype(np.float32))
    ns, nb = jnp.ones((e,)), jnp.zeros((e,))
    # weight columns tied pairwise across the two tiles: col j == col j+128
    half = rng.standard_normal((e, bv)).astype(np.float32)
    wg = jnp.asarray(np.concatenate([half, half], axis=1))
    bg = jnp.zeros((v,))
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ns + nb
    ref_v, ref_i = jax.lax.top_k(y @ wg + bg, k)
    tv, ti, _ = fused_norm_generator_topk(
        x, ns, nb, wg, bg, k=k, block_b=4, block_v=bv, interpret=True)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(tv), np.asarray(ref_v), rtol=1e-6)


@pytest.mark.parametrize("end_id", [-1, 7])
def test_fused_beam_token_exact(rng, end_id):
    """beam_generate_fused reproduces the module-graph beam search's tokens
    exactly (and scores to fp32 noise), with and without early finishing."""
    from vct_tpu.decode import beam_generate
    from vct_tpu.decode_fast import beam_generate_fused

    model = _model()
    feats, masks, variables = _init(model, rng)
    ref_t, ref_s = beam_generate(
        model, variables, feats, masks, beam_size=3,
        max_len=MAX_LEN, start_id=2, end_id=end_id,
    )
    fus_t, fus_s = beam_generate_fused(
        model, variables, feats, masks, beam_size=3,
        max_len=MAX_LEN, start_id=2, end_id=end_id,
        block_b=4, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fus_t), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(fus_s), np.asarray(ref_s), rtol=1e-5)


def test_fused_beam_sharded_matches_single_device(rng):
    """beam_generate_fused_sharded on the 8-device mesh == the single-device
    fused beam (tokens exactly, scores to fp32 noise); each video's k beams
    stay on one shard so the regather is shard-local."""
    from vct_tpu.decode_fast import (
        beam_generate_fused,
        beam_generate_fused_sharded,
        fused_beam_sharded_supported,
    )
    from vct_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

    model = _model()
    b, k = 16, 3
    feats, masks, variables = _init_wide(model, rng, b)
    ref_t, ref_s = beam_generate_fused(
        model, variables, feats, masks, beam_size=k,
        max_len=MAX_LEN, start_id=2, end_id=-1,
        block_b=6, block_v=256, interpret=True,
    )

    mesh = make_mesh()
    assert fused_beam_sharded_supported(b, k, 8)
    tok, sc = jax.jit(
        lambda v, f, m: beam_generate_fused_sharded(
            model, v, f, m, mesh=mesh, beam_size=k, max_len=MAX_LEN,
            start_id=2, end_id=-1, block_v=256, interpret=True,
        )
    )(replicate(mesh, variables), shard_batch_arrays(mesh, feats),
      shard_batch_arrays(mesh, masks))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_s), rtol=1e-5)


# ---------------------------------------------------------------------------
# single-launch full-sequence decode kernel (latency regime)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("end_id", [-1, 7])
def test_sequence_kernel_token_exact(rng, end_id):
    """fused_sequence_decode (the WHOLE generation in one pallas_call:
    VMEM-resident weights + caches, per-token embedding-row DMA) reproduces
    the module-graph greedy exactly, with and without early finishing."""
    from vct_tpu.decode_fast import _prep_decode
    from vct_tpu.ops.pallas_decode import fused_sequence_decode

    model = _model()
    feats, masks, variables = _init(model, rng)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
        end_id=end_id,
    )
    fw, cks, cvs, mem_bias = _prep_decode(
        model, variables, feats, masks, max_len=MAX_LEN, block_v=256)
    toks = fused_sequence_decode(
        fw["emb"], fw["pe"], cks, cvs, mem_bias, fw,
        heads=fw["heads"], max_len=MAX_LEN, start_id=2, end_id=end_id,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


@pytest.mark.parametrize("end_id", [-1, 7])
def test_multi_step_token_exact(rng, end_id):
    """greedy_generate_multi (``unroll`` tokens per kernel launch via
    fused_multi_step) reproduces the module-graph greedy exactly, with and
    without early finishing (the caller re-applies the
    all-rows-finished -> PAD semantics between windows)."""
    from vct_tpu.decode_fast import greedy_generate_multi

    model = _model()
    feats, masks, variables = _init(model, rng)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
        end_id=end_id,
    )
    toks, _ = greedy_generate_multi(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
        end_id=end_id, unroll=4, block_b=2, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_multi_step_quirk_unroll2(rng):
    """unroll=2 window size and the no-memory-mask quirk variant stay
    token-exact (three-layer stack exercises the per-layer patch lists)."""
    from vct_tpu.decode_fast import greedy_generate_multi

    model = _model(quirk=True, dec_layers=3)
    feats, masks, variables = _init(model, rng)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=8, start_id=2, end_id=-1,
    )
    toks, _ = greedy_generate_multi(
        model, variables, feats, masks, max_len=8, start_id=2, end_id=-1,
        unroll=2, block_b=4, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_multi_step_wide_batch(rng):
    """b > block_b runs the multi-step kernel on a >1-program grid and stays
    token-exact (the steady-state throughput configuration)."""
    from vct_tpu.decode_fast import greedy_generate_multi

    model = _model()
    b = 8
    feats, masks, variables = _init_wide(model, rng, b)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    toks, _ = greedy_generate_multi(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        unroll=4, block_b=2, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


@pytest.mark.parametrize("abl", [
    frozenset({"gen"}),
    frozenset({"gen", "dma"}),
    frozenset({"gen", "dma", "layers"}),
])
def test_multi_step_ablations_run(rng, abl):
    """The latency-bisect ablation flags (tools/profile.py latency-decomp)
    must keep the kernel runnable with the right output shapes — tokens are
    deliberately garbage, so only structure is asserted."""
    from vct_tpu.decode_fast import greedy_generate_multi

    model = _model()
    feats, masks, variables = _init(model, rng)
    toks, _ = greedy_generate_multi(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2,
        end_id=-1, unroll=4, block_b=2, block_v=256, interpret=True,
        ablate=abl,
    )
    assert toks.shape == (feats[0].shape[0], MAX_LEN)
    assert toks.dtype == jnp.int32


def test_multi_step_dispatch(rng):
    """greedy_generate_fused(multi_step=u) routes through the multi-token
    kernel and stays token-exact (jit boundary included)."""
    model = _model()
    feats, masks, variables = _init(model, rng)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    toks, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        multi_step=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


def test_auto_beam_dispatch_sharded(rng):
    """make_auto_beam_fn on a data-only multi-device mesh with
    tpu.pallas_partition_kernels routes through the shard_mapped fused beam
    and matches the module-graph GSPMD beam token-for-token."""
    from vct_tpu.decode import make_auto_beam_fn, make_beam_fn
    from vct_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays

    cfg = _model().config
    model = MMT4Caption(cfg, TPUConfig(pallas_partition_kernels=True))
    b, k = 16, 3
    feats, masks, variables = _init_wide(model, rng, b)
    mesh = make_mesh()

    ref_fn = make_beam_fn(model, MAX_LEN, 2, -1, k)
    ref_t, _ = ref_fn(variables, feats, masks)

    auto_fn = make_auto_beam_fn(model, MAX_LEN, 2, -1, k, mesh=mesh,
                                interpret=True)
    tok, _ = auto_fn(replicate(mesh, variables), shard_batch_arrays(mesh, feats),
                     shard_batch_arrays(mesh, masks))
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_t))


def test_sequence_kernel_opt_in_dispatch(rng):
    """greedy_generate_fused(sequence_kernel=True) routes through the
    single-launch kernel and stays token-exact (jit boundary included).
    (Opt-in for now: the relay-side Mosaic still rejects parts of the
    in-kernel loop body on real hardware.)"""
    model = _model()
    feats, masks, variables = _init(model, rng)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    toks, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        sequence_kernel=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))


@pytest.mark.parametrize("e,h,t,b,bb", [(96, 3, 5, 6, 3), (64, 8, 9, 4, 4)])
def test_fused_greedy_geometry_sweep(rng, e, h, t, b, bb):
    """Token-exactness must hold across head/dim/frame geometries, not just
    the fixture's (E=128, H=4, T=6) — odd head counts, non-128 E, odd frame
    counts, and batch tiles that split the batch unevenly-shaped programs."""
    cfg = ModelConfig.from_dict({
        "modal": ["CLIP4Clip"], "modal_shape": [D_FEAT], "embed_dim": e,
        "dropout": 0.0, "vocab_size": VOCAB, "activation": "gelu",
        "video_encoder": {"layer": 1, "nhead": h, "feedforward": FF,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": 2, "nhead": h, "feedforward": FF,
                            "sce_loss_alpha": 0.5},
    })
    model = MMT4Caption(cfg, TPUConfig())
    feats = [jnp.asarray(rng.standard_normal((b, t, D_FEAT)).astype(np.float32))]
    pad = np.zeros((b, t), bool)
    pad[0, -1] = True
    masks = [jnp.asarray(pad)]
    caps = jnp.zeros((b, MAX_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(5), feats, masks, caps,
                           caps == 0, method=MMT4Caption.caption_loss)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    fused, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        block_b=bb, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_greedy_multimodal(rng):
    """Two modalities (different dims + temporal lengths): the fused path
    sees only the encoder's concatenated memory, so exactness must hold for
    multi-modal models too (MME modal embeddings + per-modal masks)."""
    d2, t2 = 16, 4
    cfg = ModelConfig.from_dict({
        "modal": ["CLIP4Clip", "S3D"], "modal_shape": [D_FEAT, d2],
        "embed_dim": E, "dropout": 0.0, "vocab_size": VOCAB,
        "activation": "gelu",
        "video_encoder": {"layer": 1, "nhead": H, "feedforward": FF,
                          "mme": {"temporal": "encoding", "aggregation": "avg",
                                  "modal_different": True}},
        "caption_decoder": {"layer": 2, "nhead": H, "feedforward": FF,
                            "sce_loss_alpha": 0.5},
    })
    model = MMT4Caption(cfg, TPUConfig())
    feats = [
        jnp.asarray(rng.standard_normal((B, T, D_FEAT)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((B, t2, d2)).astype(np.float32)),
    ]
    pad0 = np.zeros((B, T), bool); pad0[1, -2:] = True
    pad1 = np.zeros((B, t2), bool); pad1[2, -1:] = True
    masks = [jnp.asarray(pad0), jnp.asarray(pad1)]
    caps = jnp.zeros((B, MAX_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(9), feats, masks, caps,
                           caps == 0, method=MMT4Caption.caption_loss)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    fused, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        block_b=2, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


@pytest.mark.parametrize("enc_type,layer", [("simple", 1), ("hmme", [2, 1])])
def test_fused_greedy_encoder_variants(rng, enc_type, layer):
    """The fused decode path must be token-exact for the SimpleSep and HMME
    encoder variants too — their memories have different layouts (per-modal
    stacks / hierarchical entry), but the decoder sees only [B, Tm, E]."""
    d2, t2 = 16, 4
    cfg = ModelConfig.from_dict({
        "modal": ["a", "b"], "modal_shape": [D_FEAT, d2], "embed_dim": E,
        "dropout": 0.0, "vocab_size": VOCAB, "activation": "gelu",
        "video_encoder": {"type": enc_type, "layer": layer, "nhead": H,
                          "feedforward": FF,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": 2, "nhead": H, "feedforward": FF,
                            "sce_loss_alpha": 0.5},
    })
    model = MMT4Caption(cfg, TPUConfig())
    feats = [
        jnp.asarray(rng.standard_normal((B, T, D_FEAT)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((B, t2, d2)).astype(np.float32)),
    ]
    masks = [jnp.zeros((B, T), bool), jnp.zeros((B, t2), bool)]
    caps = jnp.zeros((B, MAX_LEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(11), feats, masks, caps,
                           caps == 0, method=MMT4Caption.caption_loss)
    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
    )
    fused, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        block_b=2, block_v=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_multi_step_l_view_violation_poisons_tokens(rng):
    """fused_multi_step's l_view contract ((w_idx + 1) * unroll <= l_view)
    cannot be a Python assert — w_idx is traced — so a violating window must
    return POISONED tokens (-1) rather than silently-wrong ones, and a
    satisfying window must not."""
    from vct_tpu.decode_fast import _prep_decode, _round_up
    from vct_tpu.ops.pallas_decode import fused_multi_step, group_embed_rows

    model = _model()
    feats, masks, variables = _init(model, rng)
    u = 4
    fw, cks, cvs, mem_bias = _prep_decode(
        model, variables, feats, masks, max_len=MAX_LEN, block_v=256)
    e = model.config.embed_dim
    nl = len(fw["layers"])
    l_pad = _round_up(MAX_LEN, 8)
    ks = jnp.zeros((nl, l_pad, B, e), model.dtype)
    vs = jnp.zeros((nl, l_pad, B, e), model.dtype)
    pe3 = fw["pe"][:l_pad].reshape(l_pad, 1, e).astype(model.dtype)
    emb3 = group_embed_rows(fw["emb"].astype(model.dtype))
    cur = jnp.full((B,), 2, jnp.int32)

    def window(w_idx):
        toks, _, _ = fused_multi_step(
            cur, ks, vs, cks, cvs, mem_bias, emb3, pe3, fw,
            jnp.asarray(w_idx, jnp.int32), heads=fw["heads"], unroll=u,
            block_b=2, l_view=8, interpret=True,
        )
        return np.asarray(toks)

    assert (window(1) >= 0).all()   # (1+1)*4 = 8 <= l_view: real tokens
    assert (window(2) == -1).all()  # (2+1)*4 = 12 > l_view: poisoned


def test_nonzero_pad_id_derived_from_model(rng):
    """pad_id flows from the model config (round-5 review finding: the fused
    loop zeroed the CALLER's pad_id — default 0 — while the module graph
    zeroes the model's, so configs with [PAD] != 0 broke the token-exact
    dispatch invariant). Greedy and beam, module vs fused, NO explicit
    pad_id anywhere; end_id=7 lets rows finish so the config pad fills the
    greedy tail and beam embeds frozen-beam pad tokens."""
    import dataclasses

    from vct_tpu.decode import beam_generate
    from vct_tpu.decode_fast import beam_generate_fused

    base = _model()
    model = type(base)(dataclasses.replace(base.config, pad_id=5), base.tpu,
                       dtype=base.dtype)
    assert model.config.pad_id == 5
    feats, masks, variables = _init(model, rng)

    ref, _ = greedy_generate(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7)
    fused, _ = greedy_generate_fused(
        model, variables, feats, masks, max_len=MAX_LEN, start_id=2, end_id=7,
        block_b=2, block_v=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))

    bref, _ = beam_generate(
        model, variables, feats, masks, beam_size=2, max_len=MAX_LEN,
        start_id=2, end_id=7)
    bfused, _ = beam_generate_fused(
        model, variables, feats, masks, beam_size=2, max_len=MAX_LEN,
        start_id=2, end_id=7, block_b=2, block_v=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(bfused), np.asarray(bref))
