"""Multi-chip data parallelism on a virtual 8-device CPU mesh: the GSPMD
train step must (a) actually shard the batch, (b) produce the same numbers as
single-device execution (the DDP-equivalence guarantee)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vct_tpu.config import TrainConfig
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.parallel.mesh import make_mesh, replicate, shard_batch_arrays
from vct_tpu.train.optimizers import build_optimizer
from vct_tpu.train.state import make_train_state
from vct_tpu.train.step import make_train_step

from tests.test_model_parity import D_FEAT, T, VOCAB, small_config

B, S = 16, 10


def _setup(mesh=None):
    cfg = small_config()
    model = MMT4Caption(cfg)
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((B, T, D_FEAT)).astype(np.float32)]
    masks = [np.zeros((B, T), dtype=bool)]
    caps = rng.integers(3, VOCAB, (B, S)).astype(np.int32)
    caps[:, 0] = 2
    caps[:, -1] = 1
    batch = {
        "feats": [jnp.asarray(f) for f in feats],
        "masks": [jnp.asarray(m) for m in masks],
        "token_ids": jnp.asarray(caps),
        "token_mask": jnp.asarray(caps == 0),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["feats"], batch["masks"],
        batch["token_ids"], batch["token_mask"], method=MMT4Caption.caption_loss,
    )
    tcfg = TrainConfig.from_dict(
        {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3}}
    )
    opt = build_optimizer(tcfg, variables["params"])
    state = make_train_state(variables, opt)
    step = make_train_step(model, opt, "caption")
    if mesh is not None:
        state = replicate(mesh, state)
        batch = shard_batch_arrays(mesh, batch)
    return step, state, batch


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_mesh_underuse_warns_full_use_does_not():
    # make_mesh warns when a sub-mesh leaves visible devices idle (a config
    # typo here silently halves throughput otherwise), but stays quiet for
    # the legal full-mesh and deliberate single-device (1x1) cases
    import warnings

    with pytest.warns(UserWarning, match=r"uses 4 of 8 visible devices"):
        make_mesh(data=4, model=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_mesh()  # all 8: no warning
        make_mesh(data=1, model=1)  # single-device escape hatch: no warning


def test_batch_actually_sharded():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    _, _, batch = _setup(mesh)
    sh = batch["token_ids"].sharding
    assert sh.spec == P("data")
    assert len(batch["token_ids"].addressable_shards) == 8


def test_data_parallel_matches_single_device():
    step1, state1, batch1 = _setup(mesh=None)
    mesh = make_mesh()
    step8, state8, batch8 = _setup(mesh)

    for _ in range(3):
        state1, m1 = step1(state1, batch1)
        state8, m8 = step8(state8, batch8)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-5)

    # params drift by float reduction order (the 8-way psum sums in a
    # different association than the single-device reduction; Adam's rsqrt
    # amplifies it) — tolerance covers noise, not semantics
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1.params)),
        jax.tree_util.tree_leaves(jax.device_get(state8.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_greedy_decode_under_mesh():
    from vct_tpu.decode import greedy_generate

    cfg = small_config()
    model = MMT4Caption(cfg)
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    feats = [jnp.asarray(rng.standard_normal((B, T, D_FEAT)).astype(np.float32))]
    masks = [jnp.zeros((B, T), bool)]
    caps = jnp.zeros((B, S), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats, masks, caps, caps == 0,
        method=MMT4Caption.caption_loss,
    )
    variables = replicate(mesh, variables)
    feats = shard_batch_arrays(mesh, feats)
    masks = shard_batch_arrays(mesh, masks)
    tokens, _ = jax.jit(
        lambda v, f, m: greedy_generate(
            model, v, f, m, max_len=8, start_id=2, end_id=1
        )
    )(variables, feats, masks)
    assert tokens.shape == (B, 8)
    assert (np.asarray(tokens)[:, 0] == 2).all()


def test_two_d_mesh_model_axis():
    """A (4, 2) mesh — data parallel with a non-trivial 'model' axis — must
    produce the same step numerics as the 1-D data mesh (params replicated
    across 'model'; the axis is reserved for tensor parallelism)."""
    step1, state1, batch1 = _setup(make_mesh(8, 1))
    state1, m1 = step1(state1, batch1)

    step2, state2, batch2 = _setup(make_mesh(4, 2))
    state2, m2 = step2(state2, batch2)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    # gradient psum order differs between mesh shapes -> fp32 rounding noise,
    # amplified by Adam's rsqrt; updates are ~1e-3, so 2e-5 is tight enough
    # (the fused vocab-chunked loss adds its own summation-order jitter)
    l1 = jax.tree_util.tree_leaves(state1.params)
    l2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _setup_tp(mesh):
    """Like _setup but with REAL tensor parallelism: fused loss off (TP
    shards the [N, V] logits instead) and TP param shardings applied."""
    import dataclasses

    from vct_tpu.parallel.mesh import shard_train_state

    cfg = small_config()
    model = MMT4Caption(cfg)
    model = MMT4Caption(cfg, dataclasses.replace(model.tpu, use_fused_loss=False))
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((B, T, D_FEAT)).astype(np.float32)]
    masks = [np.zeros((B, T), dtype=bool)]
    caps = rng.integers(3, VOCAB, (B, S)).astype(np.int32)
    caps[:, 0] = 2
    caps[:, -1] = 1
    batch = {
        "feats": [jnp.asarray(f) for f in feats],
        "masks": [jnp.asarray(m) for m in masks],
        "token_ids": jnp.asarray(caps),
        "token_mask": jnp.asarray(caps == 0),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["feats"], batch["masks"],
        batch["token_ids"], batch["token_mask"], method=MMT4Caption.caption_loss,
    )
    tcfg = TrainConfig.from_dict(
        {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3}}
    )
    opt = build_optimizer(tcfg, variables["params"])
    state = shard_train_state(mesh, make_train_state(variables, opt))
    step = make_train_step(model, opt, "caption")
    batch = shard_batch_arrays(mesh, batch)
    return step, state, batch


def test_tensor_parallel_params_actually_sharded():
    mesh = make_mesh(4, 2)
    _, state, _ = _setup_tp(mesh)
    gen_k = state.params["cap_decoder"]["generator"]["kernel"]
    # vocab columns split over 'model': each shard holds V/2 columns
    assert {s.data.shape[1] for s in gen_k.addressable_shards} == {VOCAB // 2}
    lin1 = state.params["cap_decoder"]["decoder"]["layers_0"]["linear1"]["kernel"]
    assert {s.data.shape[1] for s in lin1.addressable_shards} == {lin1.shape[1] // 2}
    lin2 = state.params["cap_decoder"]["decoder"]["layers_0"]["linear2"]["kernel"]
    assert {s.data.shape[0] for s in lin2.addressable_shards} == {lin2.shape[0] // 2}
    # optimizer moments mirror the param shardings (same path suffix):
    # find the adam mu leaf for the generator kernel wherever the
    # multi_transform wrapper put it
    target = None
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.opt_state):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if "mu" in names and names[-2:] == ["generator", "kernel"]:
            target = leaf
            break
    assert target is not None, "no adam mu leaf for generator/kernel"
    assert {s.data.shape[1] for s in target.addressable_shards} == {VOCAB // 2}


def test_tensor_parallel_matches_replicated():
    """Three dp x tp train steps produce the same losses and parameters as
    the same model with replicated params on the same mesh shape — GSPMD's
    collectives implement, not change, the math."""
    import dataclasses

    from vct_tpu.parallel.mesh import shard_train_state  # noqa: F401

    mesh = make_mesh(4, 2)
    step_tp, state_tp, batch_tp = _setup_tp(mesh)

    # replicated twin: identical model (fused loss off) and init
    cfg = small_config()
    model = MMT4Caption(cfg)
    model = MMT4Caption(cfg, dataclasses.replace(model.tpu, use_fused_loss=False))
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((B, T, D_FEAT)).astype(np.float32)]
    masks = [np.zeros((B, T), dtype=bool)]
    caps = rng.integers(3, VOCAB, (B, S)).astype(np.int32)
    caps[:, 0] = 2
    caps[:, -1] = 1
    batch = {
        "feats": [jnp.asarray(f) for f in feats],
        "masks": [jnp.asarray(m) for m in masks],
        "token_ids": jnp.asarray(caps),
        "token_mask": jnp.asarray(caps == 0),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["feats"], batch["masks"],
        batch["token_ids"], batch["token_mask"], method=MMT4Caption.caption_loss,
    )
    tcfg = TrainConfig.from_dict(
        {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3}}
    )
    opt = build_optimizer(tcfg, variables["params"])
    state_rep = replicate(mesh, make_train_state(variables, opt))
    step_rep = make_train_step(model, opt, "caption")
    batch_rep = shard_batch_arrays(mesh, batch)

    for _ in range(3):
        state_tp, m_tp = step_tp(state_tp, batch_tp)
        state_rep, m_rep = step_rep(state_rep, batch_rep)
        np.testing.assert_allclose(
            float(m_tp["loss"]), float(m_rep["loss"]), rtol=2e-5)

    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_tp.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_rep.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-3)


# ---------------------------------------------------------------------------
# match / cross tasks under the mesh — the contrastive loss builds a [B, B]
# similarity matrix from a batch that is SHARDED over 'data', exactly where
# sharding bugs hide (GSPMD must gather the text/video features for the
# cross-shard negatives). Reference semantics: /root/reference/train.py:123-143
# (cross-task loss under DDP), /root/reference/model/loss.py:18-35.
# ---------------------------------------------------------------------------

TEXT_DIM = 512  # text_encoder_dim("CLIP"): frozen CLIP text features
N_VALID = 11    # ragged final batch: rows >= N_VALID are collate filler


def _task_batch(n_valid=N_VALID):
    """A collate-shaped batch: rows >= n_valid are copies of row 0 (what
    data/collate.py emits for the ragged final batch)."""
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((B, T, D_FEAT)).astype(np.float32)
    caps = rng.integers(3, VOCAB, (B, S)).astype(np.int32)
    caps[:, 0] = 2
    caps[:, -1] = 1
    text = rng.standard_normal((B, TEXT_DIM)).astype(np.float32)
    feats[n_valid:] = feats[0]
    caps[n_valid:] = caps[0]
    text[n_valid:] = text[0]
    return {
        "feats": [jnp.asarray(feats)],
        "masks": [jnp.zeros((B, T), bool)],
        "token_ids": jnp.asarray(caps),
        "token_mask": jnp.asarray(caps == 0),
        "text_feat": jnp.asarray(text),
        "row_valid": jnp.asarray(np.arange(B) < n_valid),
    }


def _sub_batch(batch, n):
    """The first n rows only — the batch the reference would have scored."""
    out = {}
    for k, v in batch.items():
        if k == "row_valid":
            continue
        out[k] = [x[:n] for x in v] if isinstance(v, list) else v[:n]
    return out


def _setup_matching(task, mesh=None):
    cfg = small_config(matching={"enable_tem": True})
    model = MMT4Caption(cfg)
    batch = _task_batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch["feats"], batch["masks"],
        batch["token_ids"], batch["token_mask"], batch["text_feat"],
        method=MMT4Caption.cross_loss,
    )
    tcfg = TrainConfig.from_dict(
        {"task": task, "optimizer": {"name": "adam", "learning_rate": 1e-3}}
    )
    opt = build_optimizer(tcfg, variables["params"])
    state = make_train_state(variables, opt)
    step = make_train_step(model, opt, task)
    if mesh is not None:
        state = replicate(mesh, state)
        batch = shard_batch_arrays(mesh, batch)
    return model, variables, step, state, batch


@pytest.mark.parametrize("task", ["match", "cross"])
def test_matching_task_data_parallel_matches_single_device(task):
    """Sharded match/cross train steps = single-device, three steps deep."""
    _, _, step1, state1, batch1 = _setup_matching(task)
    mesh = make_mesh()
    _, _, step8, state8, batch8 = _setup_matching(task, mesh)
    for _ in range(3):
        state1, m1 = step1(state1, batch1)
        state8, m8 = step8(state8, batch8)
        for key in m1:
            np.testing.assert_allclose(
                float(m1[key]), float(m8[key]), rtol=2e-5, err_msg=key)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state1.params)),
        jax.tree_util.tree_leaves(jax.device_get(state8.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.parametrize("task", ["match", "cross"])
def test_matching_eval_parts_mesh_equals_unpadded_sub_batch(task):
    """The psum'd sum/count eval parts on the sharded PADDED batch must equal
    the parts of the unpadded [N_VALID] sub-batch on one device — i.e. the
    filler rows contribute nothing: not as contrastive anchors, not as
    negatives, not to the CE sums."""
    from vct_tpu.train.step import make_eval_step

    model, variables, *_ = _setup_matching(task)
    eval_step = make_eval_step(model, task)

    sub = _sub_batch(_task_batch(), N_VALID)
    parts_ref = {k: float(v) for k, v in eval_step(variables, sub).items()}

    mesh = make_mesh()
    batch8 = shard_batch_arrays(mesh, _task_batch())
    parts8 = {
        k: float(v)
        for k, v in eval_step(replicate(mesh, variables), batch8).items()
    }
    assert parts_ref.keys() == parts8.keys()
    for k in parts_ref:
        np.testing.assert_allclose(parts8[k], parts_ref[k], rtol=2e-5, err_msg=k)


def test_train_step_with_partitioned_pallas_kernels():
    """A TRAINING step (fwd + custom_vjp bwd) with
    tpu.pallas_partition_kernels=True on the 8-device mesh — the attention
    kernels shard_map over 'data' inside the jitted step — matches the plain
    XLA train step. Forced through the Pallas dispatch in interpret mode
    (ops.attention.FORCE_PALLAS_INTERPRET); on real chips the same program
    runs the compiled kernels."""
    import dataclasses

    from vct_tpu.models.mmt4caption import TPUConfig
    from vct_tpu.ops import attention as attn_mod
    from vct_tpu.parallel.mesh import set_kernel_mesh

    mesh = make_mesh()
    step_ref, state_ref, batch_ref = _setup(mesh)  # XLA attention
    state_ref, m_ref = step_ref(state_ref, batch_ref)

    cfg = small_config()
    tpu_cfg = TPUConfig(use_pallas_attention=True, pallas_partition_kernels=True)
    model = MMT4Caption(cfg, tpu_cfg)
    rng = np.random.default_rng(0)
    feats = [rng.standard_normal((B, T, D_FEAT)).astype(np.float32)]
    masks = [np.zeros((B, T), dtype=bool)]
    caps = rng.integers(3, VOCAB, (B, S)).astype(np.int32)
    caps[:, 0] = 2
    caps[:, -1] = 1
    batch = {
        "feats": [jnp.asarray(f) for f in feats],
        "masks": [jnp.asarray(m) for m in masks],
        "token_ids": jnp.asarray(caps),
        "token_mask": jnp.asarray(caps == 0),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["feats"], batch["masks"],
        batch["token_ids"], batch["token_mask"], method=MMT4Caption.caption_loss,
    )
    tcfg = TrainConfig.from_dict(
        {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3}}
    )
    opt = build_optimizer(tcfg, variables["params"])
    state = replicate(mesh, make_train_state(variables, opt))
    batch = shard_batch_arrays(mesh, batch)
    step = make_train_step(model, opt, "caption")

    set_kernel_mesh(mesh)
    attn_mod.FORCE_PALLAS_INTERPRET = True
    try:
        state, m = step(state, batch)
    finally:
        attn_mod.FORCE_PALLAS_INTERPRET = False
        set_kernel_mesh(None)

    # flash-style streaming softmax reorders the fp32 reductions vs XLA
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(state_ref.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_tp_mesh_beam_decode_matches_single_device():
    """Beam search with TENSOR-PARALLEL weights on the (4, 2) mesh (vocab-
    sharded LM head, Megatron FFN split) decodes the same tokens as the same
    weights unsharded on one device."""
    from vct_tpu.decode import make_beam_fn
    from vct_tpu.parallel.mesh import shard_train_state

    cfg = small_config()
    model = MMT4Caption(cfg)
    rng = np.random.default_rng(5)
    feats = [jnp.asarray(rng.standard_normal((B, T, D_FEAT)).astype(np.float32))]
    masks = [jnp.zeros((B, T), bool)]
    caps = jnp.zeros((B, S), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), feats, masks, caps, caps == 0,
        method=MMT4Caption.caption_loss,
    )
    beam = make_beam_fn(model, 8, 2, 1, beam_size=3)
    ref_t, ref_s = beam(variables, feats, masks)

    mesh = make_mesh(4, 2)
    tok, sc = beam(
        shard_train_state(mesh, variables),
        shard_batch_arrays(mesh, feats),
        shard_batch_arrays(mesh, masks),
    )
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_s), rtol=2e-5)
