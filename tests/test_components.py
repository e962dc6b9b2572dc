"""Parity of embeddings, aggregation, and losses against reference semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vct_tpu.convert import convert_state_dict
from vct_tpu.models import embeddings as emb
from vct_tpu.models import losses

from tests import torch_ref

ATOL = 2e-5


def test_sinusoid_table_matches_reference_formula():
    ours = emb.sinusoid_table(512, 64)
    theirs = torch_ref.sinusoid_table_torch(512, 64).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_temporal_encoding_alignment():
    """Two modalities (t=6 primary incl. agg -> D=5, t=4 secondary): secondary
    timeline resampled onto the primary's via linspace (MMEncoder.py:98-102)."""
    te = np.asarray(emb.temporal_encoding([6, 4], 16))
    pe = emb.sinusoid_table(512, 16)
    assert te.shape == (10, 16)
    np.testing.assert_allclose(te[0], 0.0)  # agg slot of modality 0
    np.testing.assert_allclose(te[1:6], pe[:5], atol=1e-7)
    np.testing.assert_allclose(te[6], 0.0)  # agg slot of modality 1
    idx = np.linspace(0, 4, 3).astype(np.int32)  # D-1=4, t=3
    np.testing.assert_allclose(te[7:], pe[idx], atol=1e-7)


def test_temporal_embedding_indices():
    """concat([0], linspace(1, D, t)) per modality (MMEncoder.py:150-158)."""
    idx = np.asarray(emb.temporal_embedding_indices([5, 3]))
    # modality 0: t=4, D=4 -> [0, 1, 2, 3, 4]; modality 1: t=2 -> [0, 1, 4]
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4, 0, 1, 4])


def test_modal_embedding_labels():
    m = emb.ModalEmbedding(num_modal=2, dim=8, modal_different=True)
    labels = np.asarray(m.labels([3, 2]))
    # global slots get distinct ids num_modal+i (MMEncoder.py:39-43)
    np.testing.assert_array_equal(labels, [2, 0, 0, 3, 1])
    m2 = emb.ModalEmbedding(num_modal=2, dim=8, modal_different=False)
    np.testing.assert_array_equal(np.asarray(m2.labels([3, 2])), [0, 0, 0, 1, 1])


class _TorchAgg(torch.nn.Module):
    def __init__(self, e, bidirectional):
        super().__init__()
        self.agg = torch.nn.GRU(e, e, batch_first=True, bidirectional=bidirectional)


@pytest.mark.parametrize("method", ["GRU", "biGRU"])
def test_gru_aggregation_parity(rng, method):
    e, b, t = 16, 3, 5
    torch.manual_seed(3)
    tagg = _TorchAgg(e, bidirectional=(method == "biGRU"))
    tagg.eval()
    x = rng.standard_normal((b, t, e)).astype(np.float32)
    with torch.no_grad():
        _, h = tagg.agg(torch.tensor(x))
        t_out = h.sum(0) if method == "biGRU" else h[0]  # MMEncoder.py:199-201

    model = emb.GlobalAggregation(method, e)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in tagg.state_dict().items()}
    variables, report = convert_state_dict(variables, sd)
    assert not report["missing"] and not report["unexpected"], report
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out)[:, 0], t_out.numpy(), atol=ATOL)


def test_masked_pooling():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    mask = jnp.asarray([[False, False, True], [False, True, True]])
    avg = emb.GlobalAggregation("avg", 4)
    out = avg.init_with_output(jax.random.PRNGKey(0), x, mask)[0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, :2].mean(0)))
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(x[1, 0]))
    mx = emb.GlobalAggregation("max", 4)
    out = mx.init_with_output(jax.random.PRNGKey(0), x, mask)[0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0, 1]))
    # quirk path pools over pads like the reference's AdaptiveAvgPool1d
    quirk = emb.GlobalAggregation("avg", 4, quirk_unmasked=True)
    out = quirk.init_with_output(jax.random.PRNGKey(0), x, mask)[0]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(x[0].mean(0)))


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_cross_entropy_ignore_index(rng):
    logits = rng.standard_normal((12, 50)).astype(np.float32)
    labels = rng.integers(0, 50, 12)
    labels[3:6] = 0  # pad
    t_loss = torch.nn.CrossEntropyLoss(ignore_index=0)(
        torch.tensor(logits), torch.tensor(labels)
    )
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0)
    np.testing.assert_allclose(float(ours), float(t_loss), atol=1e-6)


def test_sce_loss_parity(rng):
    logits = rng.standard_normal((20, 64)).astype(np.float32)
    labels = rng.integers(1, 64, 20)
    labels[5:9] = 0
    t_loss = torch_ref.sce_loss_torch(
        torch.tensor(logits), torch.tensor(labels), 0.5, 0.5, 64, 0
    )
    ours = losses.sce_loss(
        jnp.asarray(logits), jnp.asarray(labels), alpha=0.5, beta=0.5, ignore_index=0
    )
    np.testing.assert_allclose(float(ours), float(t_loss), rtol=1e-6)


def test_sce_loss_rect_mask_equals_narrow_rectangle(rng):
    """Static-shape padding + rect_mask == reference ragged rectangle."""
    v = 32
    narrow = rng.standard_normal((3 * 6, v)).astype(np.float32)
    labels_n = rng.integers(1, v, 3 * 6)
    ref = losses.sce_loss(
        jnp.asarray(narrow), jnp.asarray(labels_n), alpha=0.5, beta=0.5, ignore_index=0
    )
    # widen to 3x9 positions; extra ones are pad/garbage
    wide = np.concatenate(
        [narrow.reshape(3, 6, v), rng.standard_normal((3, 3, v)).astype(np.float32)], 1
    ).reshape(-1, v)
    labels_w = np.concatenate(
        [labels_n.reshape(3, 6), np.zeros((3, 3), np.int64)], 1
    ).reshape(-1)
    rect = np.concatenate([np.ones((3, 6), bool), np.zeros((3, 3), bool)], 1).reshape(-1)
    ours = losses.sce_loss(
        jnp.asarray(wide),
        jnp.asarray(labels_w),
        alpha=0.5,
        beta=0.5,
        ignore_index=0,
        rect_mask=jnp.asarray(rect),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_clip_symmetric_losses(rng):
    v = rng.standard_normal((8, 32)).astype(np.float32)
    t = rng.standard_normal((8, 32)).astype(np.float32)
    np.testing.assert_allclose(
        float(losses.clip_symmetric_loss(jnp.asarray(v), jnp.asarray(t))),
        float(torch_ref.csl_torch(torch.tensor(v), torch.tensor(t))),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(losses.clip_symmetric_loss(jnp.asarray(v), jnp.asarray(t), jnp.asarray(0.5))),
        float(torch_ref.csl_torch(torch.tensor(v), torch.tensor(t), 0.5)),
        atol=1e-6,
    )
    # WDS parity must hold at the *call-site* semantics: the reference's
    # Matching invokes loss_fn(text_feat, vid_feat) (Matching.py:27-30), so
    # its dual softmax (dim=0) normalizes over texts per video. vct_tpu calls
    # fn(vid, text) with the transposed sim matrix, hence axis=1 — equivalent
    # because the symmetric CE is transpose-invariant. Assert against torch
    # run in the reference's argument order.
    np.testing.assert_allclose(
        float(
            losses.clip_symmetric_loss_wds(jnp.asarray(v), jnp.asarray(t), jnp.asarray(0.7))
        ),
        float(torch_ref.csl_wds_torch(torch.tensor(t), torch.tensor(v), 0.7)),
        atol=1e-5,
    )
    # the two orientations genuinely differ (the round-1 bug): same-order torch
    # must NOT match, otherwise this test can't catch an axis regression
    a = float(losses.clip_symmetric_loss_wds(jnp.asarray(v), jnp.asarray(t), jnp.asarray(0.7)))
    b = float(torch_ref.csl_wds_torch(torch.tensor(v), torch.tensor(t), 0.7))
    assert abs(a - b) > 1e-4
