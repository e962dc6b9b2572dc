"""Training subsystem tests: scheduler parity with torch, task freezing,
end-to-end Trainer fit/resume on a synthetic dataset."""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vct_tpu.config import Config
from vct_tpu.train.optimizers import (
    CosineAnnealingLR,
    ReduceLROnPlateau,
    build_optimizer,
    build_scheduler,
    current_learning_rate,
    freeze_labels,
)

N_VID, T, E_FEAT = 6, 5, 16
VOCAB_WORDS = ["a", "person", "does", "action", "variant"] + [str(i) for i in range(8)]


def test_cosine_schedule_matches_torch():
    base, tmax, eta = 1e-4, 8, 1e-5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=tmax, eta_min=eta)
    ours = CosineAnnealingLR(base, tmax, eta)
    for _ in range(12):
        opt.step()
        tsched.step()
        ours.step()
        np.testing.assert_allclose(ours.lr, opt.param_groups[0]["lr"], rtol=1e-6)


def test_plateau_schedule_matches_torch():
    base = 1e-3
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=0.5, patience=2)
    ours = ReduceLROnPlateau(base, factor=0.5, patience=2)
    losses = [1.0, 0.9, 0.95, 0.96, 0.97, 0.98, 0.5, 0.6, 0.7, 0.8, 0.9]
    for loss in losses:
        opt.step()
        tsched.step(loss)
        ours.step(loss)
        np.testing.assert_allclose(ours.lr, opt.param_groups[0]["lr"], rtol=1e-6)


def test_freeze_labels():
    params = {"video_encoder": {"w": 1}, "cap_decoder": {"w": 1}, "matching": {"w": 1}}
    lab = freeze_labels(params, "caption")
    assert lab["matching"]["w"] == "frozen" and lab["cap_decoder"]["w"] == "train"
    lab = freeze_labels(params, "match")
    assert lab["cap_decoder"]["w"] == "frozen" and lab["matching"]["w"] == "train"
    lab = freeze_labels(params, "cross")
    assert lab["matching"]["w"] == "train" and lab["cap_decoder"]["w"] == "train"


# ---------------------------------------------------------------------------
# Trainer end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_ws")
    feat_dir = root / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(N_VID):
        np.save(feat_dir / f"vid{i}.npy",
                rng.standard_normal((T, E_FEAT)).astype(np.float32))
        for j in range(3):
            lines.append(f"vid{i} a person does action {i} variant {j}")
    (root / "ann.txt").write_text("\n".join(lines))

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + VOCAB_WORDS
    (root / "vocab.txt").write_text("\n".join(vocab))
    return root


def make_config(root, task="caption") -> Config:
    split = {
        "feat_dir": [str(root / "feats")],
        "annotation_path": str(root / "ann.txt"),
        "dataset": "msvd",
        "mode": "by_caption",
        "split_mode": "train",
        "batch_size": 4,
    }
    eval_split = dict(split, mode="by_video", split_mode="validate", batch_size=2)
    return Config.from_dict(
        {
            "data": {"train": split, "validation": dict(split), "eval": eval_split},
            "train": {
                "task": task,
                "optimizer": {
                    "name": "adam",
                    "learning_rate": 1e-3,
                    "beta": [0.9, 0.999],
                    "lr_scheduler": {"name": "CosineAnnealingLR", "T_max": 8,
                                     "eta_min": 1e-5},
                },
                "earlystop": 5,
                "epoch": 2,
                "save_frequency": 100,
                "save_dir": str(root / "ckpt"),
                "log_dir": str(root / "log"),
                "tag": "test",
                "metric_earlystop": True,
            },
            "test": {"max_length": 12},
            "model": {
                "modal": ["CLIP4Clip"],
                "modal_shape": [E_FEAT],
                "tokenizer": "bert-base-uncased",
                "text_enc_type": "CLIP",
                "embed_dim": 32,
                "dropout": 0.1,
                "loss_beta": 0.5,
                "matching": {"enable_tem": False, "matching_loss": "CSL"},
                "activation": "gelu",
                "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                  "mme": {"temporal": "encoding", "modal_different": True,
                                          "do_norm": False, "aggregation": "avg"}},
                "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "sce_loss_alpha": 0.5},
            },
            "tpu": {
                "max_frames": T,
                "max_caption_len": 12,
                "dtype": "float32",
                "mesh_data": 1,
                "vocab_path": str(root / "vocab.txt"),
            },
        }
    )


@pytest.fixture(scope="module")
def trainer(workspace):
    from vct_tpu.train.loop import Trainer

    return Trainer(make_config(workspace), log=lambda *_: None)


def test_trainer_fit_and_improve(trainer):
    l0 = trainer.train_epoch(0)
    for e in range(1, 4):
        le = trainer.train_epoch(e)
    assert np.isfinite(l0) and np.isfinite(le)
    assert le < l0  # tiny model memorizes the 18-caption corpus quickly


def test_trainer_val_and_eval(trainer):
    val = trainer.val_epoch()
    assert "loss" in val and np.isfinite(val["loss"])
    scores = trainer.eval_epoch()
    for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in scores


def test_trainer_freeze_matching(trainer):
    before = jax.device_get(trainer.state.params["matching"])
    trainer.train_epoch(7)
    after = jax.device_get(trainer.state.params["matching"])
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(b, a)


def test_trainer_checkpoint_roundtrip(trainer, workspace):
    path = trainer.save("_roundtrip", epoch=3)
    params_before = jax.device_get(trainer.state.params)
    trainer.train_epoch(9)  # mutate
    trainer.resume(path)
    params_after = jax.device_get(trainer.state.params)
    for b, a in zip(
        jax.tree_util.tree_leaves(params_before), jax.tree_util.tree_leaves(params_after)
    ):
        np.testing.assert_array_equal(b, a)
    assert trainer.start_epoch == 3


def test_trainer_full_fit(workspace):
    from vct_tpu.train.loop import Trainer

    t = Trainer(make_config(workspace), log=lambda *_: None)
    scores = t.fit()
    assert "CIDEr" in scores
    import pathlib

    assert (pathlib.Path(workspace) / "ckpt").exists()


def test_trainer_beam_eval(workspace):
    """tpu.beam_size > 1 switches epoch-eval decoding to beam search (a
    capability the reference stubs, MMT4Caption.py:186-187)."""
    import dataclasses

    from vct_tpu.train.loop import Trainer

    cfg = make_config(workspace)
    cfg = cfg.replace(tpu=dataclasses.replace(cfg.tpu, beam_size=2))
    tr = Trainer(cfg, log=lambda *_: None)
    scores = tr.eval_epoch()
    assert set(scores) >= {"Bleu_4", "METEOR", "ROUGE_L", "CIDEr"}


def test_latest_checkpoint_and_resume(workspace):
    """fit() writes a rolling _latest full train state; resume continues from
    the next epoch (crash/preemption recovery, absent in the reference)."""
    import os

    from vct_tpu.train.loop import Trainer

    cfg = make_config(workspace)
    tr = Trainer(cfg, log=lambda *_: None)
    tr.fit()
    latest = os.path.join(cfg.train.save_dir, cfg.train.tag + "_latest")
    assert os.path.isdir(latest)

    tr2 = Trainer(cfg, log=lambda *_: None)
    tr2.resume(latest)
    assert tr2.start_epoch == cfg.train.epoch  # finished run -> nothing left
    assert int(tr2.state.step) == int(tr.state.step)


def test_earlystop_marks_latest_concluded(workspace):
    """An early-stopped run's rolling checkpoint must resume to 'nothing
    left', not restart the remaining epochs."""
    import dataclasses
    import os

    from vct_tpu.config import TrainConfig
    from vct_tpu.train.loop import Trainer

    cfg = make_config(workspace)
    tcfg = dataclasses.replace(cfg.train, earlystop=0, epoch=6,
                               metric_earlystop=False,
                               save_dir=str(workspace / "es_ckpt"), tag="es")
    cfg = cfg.replace(train=tcfg)
    tr = Trainer(cfg, log=lambda *_: None)
    # deterministic worsening val loss -> patience 0 stops at epoch 1
    vals = iter([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    tr.val_epoch = lambda: {"loss": next(vals)}
    tr.fit()
    assert tr.earlystop.early_stop  # sanity: it actually early-stopped

    tr2 = Trainer(cfg, log=lambda *_: None)
    tr2.resume(os.path.join(cfg.train.save_dir, cfg.train.tag + "_latest"))
    assert tr2.start_epoch == cfg.train.epoch  # concluded, nothing to train
