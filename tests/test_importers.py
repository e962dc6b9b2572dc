"""BERT-embedding and UniVL-decoder weight importers (reference
``MMT4Caption.py:213-220`` and ``:222-283``)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.convert import (
    import_bert_embeddings,
    import_univl_decoder,
    univl_to_reference_keys,
)
from vct_tpu.models.mmt4caption import MMT4Caption

E, V, FF, L = 16, 20, 32, 2


@pytest.fixture(scope="module")
def variables():
    m = MMT4Caption(
        ModelConfig.from_dict({
            "modal": ["a"], "modal_shape": [8], "embed_dim": E, "dropout": 0.0,
            "vocab_size": V,
            "video_encoder": {"layer": 1, "nhead": 2, "feedforward": FF,
                              "mme": {"temporal": "encoding", "aggregation": "avg"}},
            "caption_decoder": {"layer": L, "nhead": 2, "feedforward": FF},
        }),
        TPUConfig(dtype="float32"),
    )
    feats, masks = [jnp.zeros((1, 3, 8))], [jnp.zeros((1, 3), bool)]
    caps = jnp.zeros((1, 5), jnp.int32).at[:, 0].set(2)
    return m.init(jax.random.PRNGKey(0), feats, masks, caps, caps == 0,
                  method=MMT4Caption.caption_loss)


def test_import_bert_embeddings(variables):
    rng = np.random.default_rng(0)
    bert = {
        "embeddings.word_embeddings.weight": rng.standard_normal((V, E)).astype(np.float32),
        "embeddings.position_embeddings.weight": rng.standard_normal(
            variables["buffers"]["cap_decoder"]["positional_encoding"]["pos_embedding"].shape
        ).astype(np.float32),
    }
    out = import_bert_embeddings(variables, bert)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["cap_decoder"]["tgt_to_emb"]),
        bert["embeddings.word_embeddings.weight"],
    )
    np.testing.assert_array_equal(
        np.asarray(out["buffers"]["cap_decoder"]["positional_encoding"]["pos_embedding"]),
        bert["embeddings.position_embeddings.weight"],
    )


def test_import_bert_embeddings_real_table_shape(variables):
    """Real BERT checkpoints carry a (512, E) position table while the
    model's buffer is (5000, E) (decoder PE maxlen) — the importer must
    write it over the first 512 rows like the reference's buffer rebind
    (``MMT4Caption.py:220``), not raise a shape mismatch."""
    rng = np.random.default_rng(4)
    pos = rng.standard_normal((512, E)).astype(np.float32)
    bert = {
        "embeddings.word_embeddings.weight": rng.standard_normal((V, E)).astype(np.float32),
        "embeddings.position_embeddings.weight": pos,
    }
    before = np.asarray(
        variables["buffers"]["cap_decoder"]["positional_encoding"]["pos_embedding"]
    )
    out = import_bert_embeddings(variables, bert)
    after = np.asarray(
        out["buffers"]["cap_decoder"]["positional_encoding"]["pos_embedding"]
    )
    np.testing.assert_array_equal(after[:512], pos)
    np.testing.assert_array_equal(after[512:], before[512:])  # sinusoid kept


def _fake_univl(rng):
    sd = {}
    for l in range(L):
        p = f"decoder.decoder.layer.{l}"
        for attn in ("slf_attn", "enc_attn"):
            for part in ("query", "key", "value"):
                sd[f"{p}.{attn}.att.{part}.weight"] = rng.standard_normal((E, E)).astype(np.float32)
                sd[f"{p}.{attn}.att.{part}.bias"] = rng.standard_normal((E,)).astype(np.float32)
            sd[f"{p}.{attn}.output.dense.weight"] = rng.standard_normal((E, E)).astype(np.float32)
            sd[f"{p}.{attn}.output.dense.bias"] = rng.standard_normal((E,)).astype(np.float32)
            sd[f"{p}.{attn}.output.LayerNorm.weight"] = rng.standard_normal((E,)).astype(np.float32)
            sd[f"{p}.{attn}.output.LayerNorm.bias"] = rng.standard_normal((E,)).astype(np.float32)
        sd[f"{p}.intermediate.dense.weight"] = rng.standard_normal((FF, E)).astype(np.float32)
        sd[f"{p}.intermediate.dense.bias"] = rng.standard_normal((FF,)).astype(np.float32)
        sd[f"{p}.output.dense.weight"] = rng.standard_normal((E, FF)).astype(np.float32)
        sd[f"{p}.output.dense.bias"] = rng.standard_normal((E,)).astype(np.float32)
        sd[f"{p}.output.LayerNorm.weight"] = rng.standard_normal((E,)).astype(np.float32)
        sd[f"{p}.output.LayerNorm.bias"] = rng.standard_normal((E,)).astype(np.float32)
    sd["decoder.embeddings.LayerNorm.weight"] = rng.standard_normal((E,)).astype(np.float32)
    sd["decoder.embeddings.LayerNorm.bias"] = rng.standard_normal((E,)).astype(np.float32)
    sd["decoder.embeddings.word_embeddings.weight"] = rng.standard_normal((V, E)).astype(np.float32)
    sd["decoder.embeddings.position_embeddings.weight"] = rng.standard_normal((5000, E)).astype(np.float32)
    sd["decoder.classifier.cls.predictions.decoder.weight"] = rng.standard_normal((V, E)).astype(np.float32)
    sd["decoder.classifier.cls.predictions.bias"] = rng.standard_normal((V,)).astype(np.float32)
    return sd


def test_univl_key_remap_layers_detected():
    sd = _fake_univl(np.random.default_rng(1))
    remap = univl_to_reference_keys(sd)
    assert f"cap_decoder.decoder.layers.{L-1}.self_attn.in_proj_weight" in remap
    assert f"cap_decoder.decoder.layers.{L}.self_attn.in_proj_weight" not in remap
    # packed QKV = concat(q, k, v) along dim0 (reference MMT4Caption.py:229-233)
    got = remap["cap_decoder.decoder.layers.0.self_attn.in_proj_weight"]
    exp = np.concatenate([sd["decoder.decoder.layer.0.slf_attn.att.query.weight"],
                          sd["decoder.decoder.layer.0.slf_attn.att.key.weight"],
                          sd["decoder.decoder.layer.0.slf_attn.att.value.weight"]], axis=0)
    np.testing.assert_array_equal(got, exp)


def test_import_univl_decoder(variables):
    sd = _fake_univl(np.random.default_rng(2))
    out = import_univl_decoder(variables, sd)
    p = out["params"]["cap_decoder"]
    # cross-attn out_proj kernel = torch weight transposed
    np.testing.assert_array_equal(
        np.asarray(p["decoder"]["layers_1"]["multihead_attn"]["out_proj"]["kernel"]),
        sd["decoder.decoder.layer.1.enc_attn.output.dense.weight"].T,
    )
    # generator (LM head) kernel = torch weight transposed
    np.testing.assert_array_equal(
        np.asarray(p["generator"]["kernel"]),
        sd["decoder.classifier.cls.predictions.decoder.weight"].T,
    )
    # LayerNorm scale mapped from norm3 source
    np.testing.assert_array_equal(
        np.asarray(p["decoder"]["layers_0"]["norm3"]["scale"]),
        sd["decoder.decoder.layer.0.output.LayerNorm.weight"],
    )
    # encoder params untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["video_encoder"]["unify_0"]["kernel"]),
        np.asarray(variables["params"]["video_encoder"]["unify_0"]["kernel"]),
    )


def test_trainer_univl_config_key(tmp_path):
    """model.caption_decoder.univl in the config triggers the UniVL decoder
    import at Trainer build (reference train.py:212-216)."""
    torch = pytest.importorskip("torch")

    from vct_tpu.config import Config
    from vct_tpu.train.loop import Trainer

    sd = _fake_univl(np.random.default_rng(3))
    pth = tmp_path / "univl.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

    feat_dir = tmp_path / "feats"; feat_dir.mkdir()
    np.save(feat_dir / "vid0.npy", np.zeros((3, 8), np.float32))
    (tmp_path / "ann.txt").write_text("vid0 a cap")
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                  + [f"w{i}" for i in range(V - 5)]))
    split = {"feat_dir": [str(feat_dir)], "annotation_path": str(tmp_path / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 1}
    cfg = Config.from_dict({
        "data": {"train": split},
        "train": {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": str(tmp_path / "c"), "log_dir": str(tmp_path / "l"),
                  "tag": "u"},
        "model": {"modal": ["a"], "modal_shape": [8], "embed_dim": E, "dropout": 0.0,
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": FF,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": L, "nhead": 2, "feedforward": FF,
                                      "univl": str(pth)}},
        "tpu": {"max_frames": 3, "max_caption_len": 8, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "vocab.txt")},
    })
    tr = Trainer(cfg, log=lambda *_: None)
    got = np.asarray(jax.device_get(
        tr.variables["params"]["cap_decoder"]["generator"]["kernel"]))
    np.testing.assert_array_equal(
        got, sd["decoder.classifier.cls.predictions.decoder.weight"].T)
