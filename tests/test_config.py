"""Config ingestion: the reference JSON configs must load verbatim."""

import glob

import pytest

from vct_tpu.config import Config, load_config

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*.json"))


@pytest.mark.parametrize("path", REF_CONFIGS)
def test_reference_configs_load_verbatim(path):
    cfg = load_config(path)
    assert cfg.model.embed_dim == 768
    assert cfg.model.modal_shape == (512,)
    assert cfg.model.video_encoder.layer == 1
    assert cfg.model.caption_decoder.layer == 3
    assert cfg.model.caption_decoder.sce_loss_alpha == 0.5
    assert cfg.train.optimizer.name == "adam"
    assert cfg.train.optimizer.learning_rate == 1e-4
    assert cfg.train.lr_scheduler.name == "CosineAnnealingLR"
    assert cfg.test.max_length == 30
    assert cfg.data.train.batch_size == 64
    assert cfg.data.eval.mode == "by_video"
    # TPU extension block defaults in
    assert cfg.tpu.max_frames == 12
    assert cfg.tpu.seed == 666


def test_simple_encoder_cross_task_rejected():
    d = {
        "train": {"task": "cross"},
        "model": {"video_encoder": {"type": "simple"}},
    }
    with pytest.raises(ValueError):
        Config.from_dict(d)


def test_display_roundtrip(capsys):
    cfg = load_config(REF_CONFIGS[0])
    out = cfg.display()
    assert "Config" in out
