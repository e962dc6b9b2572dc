"""Frozen CLIP text encoder -> Trainer cross-task integration (the reference's
``TextEncoder`` + ``Matching`` path, ``MMT4Caption.py:123-144``)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from vct_tpu.clip.text import build_text_encoder
from vct_tpu.config import Config

from tests.test_clip_text import _make_bpe_files

E_FEAT, T, WIDTH, LAYERS = 16, 4, 32, 1


def _tiny_clip_text_npz(path, rng, vocab=None):
    width, layers, out = WIDTH, LAYERS, 512
    sd = {
        "token_embedding.weight": rng.standard_normal((vocab, width)) * 0.02,
        "positional_embedding": rng.standard_normal((77, width)) * 0.01,
        "ln_final.weight": np.ones(width), "ln_final.bias": np.zeros(width),
        "text_projection": rng.standard_normal((width, out)) * 0.02,
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones(width), f"{p}.ln_1.bias": np.zeros(width),
            f"{p}.ln_2.weight": np.ones(width), f"{p}.ln_2.bias": np.zeros(width),
            f"{p}.attn.in_proj_weight": rng.standard_normal((3 * width, width)) * 0.02,
            f"{p}.attn.in_proj_bias": np.zeros(3 * width),
            f"{p}.attn.out_proj.weight": rng.standard_normal((width, width)) * 0.02,
            f"{p}.attn.out_proj.bias": np.zeros(width),
            f"{p}.mlp.c_fc.weight": rng.standard_normal((4 * width, width)) * 0.02,
            f"{p}.mlp.c_fc.bias": np.zeros(4 * width),
            f"{p}.mlp.c_proj.weight": rng.standard_normal((width, 4 * width)) * 0.02,
            f"{p}.mlp.c_proj.bias": np.zeros(width),
        })
    np.savez(path, **{k: np.asarray(v, np.float32) for k, v in sd.items()})


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("txtenc")
    vocab_json, merges_txt = _make_bpe_files(root)
    n_vocab = len(json.loads((root / "vocab.json").read_text()))
    _tiny_clip_text_npz(root / "clip_text.npz", np.random.default_rng(0), vocab=n_vocab)
    return root, vocab_json, merges_txt, n_vocab


def test_build_text_encoder_clip(assets):
    root, vocab_json, merges_txt, n_vocab = assets
    enc = build_text_encoder(
        "CLIP", clip_weights=str(root / "clip_text.npz"),
        vocab_json=vocab_json, merges_txt=merges_txt, batch_pad=4,
        tower_kwargs=dict(vocab_size=n_vocab, width=WIDTH, layers=LAYERS, heads=2),
    )
    out = enc(["hello world", "hello", "world hello world"])
    assert out.shape == (3, 512) and out.dtype == np.float32
    assert np.isfinite(out).all()
    # deterministic + batch-pad independent
    np.testing.assert_array_equal(out[:2], enc(["hello world", "hello"])[:2])


def test_trainer_cross_task_with_clip_text_encoder(assets, tmp_path):
    from vct_tpu.train.loop import Trainer

    root, vocab_json, merges_txt, n_vocab = assets
    feat_dir = tmp_path / "feats"; feat_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(4):
        np.save(feat_dir / f"vid{i}.npy", rng.standard_normal((T, E_FEAT)).astype(np.float32))
        lines.append(f"vid{i} hello world {i}")
    (tmp_path / "ann.txt").write_text("\n".join(lines))
    (tmp_path / "wp_vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "hello", "world", "0", "1", "2", "3"]))

    split = {"feat_dir": [str(feat_dir)], "annotation_path": str(tmp_path / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 4}
    cfg = Config.from_dict({
        "data": {"train": split},
        "train": {"task": "cross", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": str(tmp_path / "c"), "log_dir": str(tmp_path / "l"),
                  "tag": "x", "metric_earlystop": False},
        "test": {"max_length": 8},
        "model": {"modal": ["CLIP4Clip"], "modal_shape": [E_FEAT], "embed_dim": 32,
                  "dropout": 0.1, "loss_beta": 0.5, "text_enc_type": "CLIP",
                  "matching": {"enable_tem": True, "matching_loss": "CSL"},
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64}},
        "tpu": {"max_frames": T, "max_caption_len": 10, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "wp_vocab.txt")},
    })
    enc = build_text_encoder(
        "CLIP", clip_weights=str(root / "clip_text.npz"),
        vocab_json=vocab_json, merges_txt=merges_txt, batch_pad=4,
        tower_kwargs=dict(vocab_size=n_vocab, width=WIDTH, layers=LAYERS, heads=2),
    )
    trainer = Trainer(cfg, text_encoder=enc, log=lambda *_: None)
    loss0 = trainer.train_epoch(0)
    loss1 = trainer.train_epoch(1)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0  # cross loss (cap + match) improves


def test_trainer_cross_without_encoder_raises(assets, tmp_path):
    from vct_tpu.train.loop import Trainer

    (tmp_path / "v.txt").write_text("[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\nx")
    feat_dir = tmp_path / "f"; feat_dir.mkdir()
    np.save(feat_dir / "vid0.npy", np.zeros((T, E_FEAT), np.float32))
    (tmp_path / "a.txt").write_text("vid0 x")
    split = {"feat_dir": [str(feat_dir)], "annotation_path": str(tmp_path / "a.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 1}
    cfg = Config.from_dict({
        "data": {"train": split},
        "train": {"task": "match", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": ".", "log_dir": ".", "tag": "x"},
        "model": {"modal": ["a"], "modal_shape": [E_FEAT], "embed_dim": 32,
                  "dropout": 0.0, "matching": {"enable_tem": True, "matching_loss": "CSL"},
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64}},
        "tpu": {"max_frames": T, "max_caption_len": 10, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "v.txt")},
    })
    with pytest.raises(ValueError, match="text_encoder"):
        Trainer(cfg, log=lambda *_: None)
