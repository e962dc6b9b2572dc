"""CLIP vision tower: parity vs HF torch CLIP, frame sampling, preprocessing."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vct_tpu.clip import CLIPVisionTower, parse_ext_type, preprocess_frames
from vct_tpu.clip.convert import convert_clip
from vct_tpu.clip.frames import frame_indices


class TestFrameSampling:
    def test_parse_ext_type(self):
        assert parse_ext_type("uni_12") == ("uni", 12.0)
        assert parse_ext_type("fps_2") == ("fps", 2.0)
        for bad in ("uni", "blah_3", "uni_0", "uni_x"):
            with pytest.raises(ValueError):
                parse_ext_type(bad)

    def test_uni(self):
        idx = frame_indices(100, 25.0, "uni_12")
        assert len(idx) == 12 and idx[0] == 0 and idx[-1] == 99
        assert (np.diff(idx) > 0).all()
        # more frames requested than exist -> duplicates, still N long
        assert len(frame_indices(3, 25.0, "uni_12")) == 12

    def test_fps(self):
        idx = frame_indices(100, 25.0, "fps_5")  # every 5th frame
        assert np.array_equal(idx, np.arange(0, 100, 5))

    def test_fix(self):
        assert np.array_equal(frame_indices(100, 25.0, "fix_20"), np.arange(0, 100, 20))

    def test_tsn(self):
        idx = frame_indices(120, 25.0, "tsn_12")  # centers of 12 segments of 10
        assert len(idx) == 12 and np.array_equal(idx, np.arange(5, 120, 10))

    def test_preprocess_shapes_and_range(self):
        frames = np.random.default_rng(0).integers(0, 255, (3, 240, 320, 3)).astype(np.uint8)
        out = preprocess_frames(frames)
        assert out.shape == (3, 224, 224, 3) and out.dtype == np.float32
        assert np.isfinite(out).all() and abs(out).max() < 4  # normalized range


class TestCLIPTowerParity:
    """Random HF torch CLIPVisionModelWithProjection -> convert -> same output."""

    @pytest.fixture(scope="class")
    def towers(self):
        torch = pytest.importorskip("torch")
        from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

        cfg = CLIPVisionConfig(
            hidden_size=768, intermediate_size=3072, num_hidden_layers=2,
            num_attention_heads=12, image_size=224, patch_size=32,
            projection_dim=512, hidden_act="quick_gelu",
        )
        torch.manual_seed(0)
        ref = CLIPVisionModelWithProjection(cfg).eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = convert_clip(sd, layers=2)
        tower = CLIPVisionTower(layers=2)
        return ref, tower, params

    def test_output_parity(self, towers):
        import torch

        ref, tower, params = towers
        rng = np.random.default_rng(1)
        imgs = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
        ours = np.asarray(tower.apply({"params": params}, jnp.asarray(imgs)))
        with torch.no_grad():
            theirs = ref(
                pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
            ).image_embeds.numpy()
        assert ours.shape == theirs.shape == (2, 512)
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)
