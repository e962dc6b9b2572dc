"""Fused pixels->caption pipeline + predict-CLI raw-video path."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
cv2 = pytest.importorskip("cv2")
import jax.numpy as jnp


def _random_openai_clip_sd(rng, width=768, layers=12, patch=32, out=512):
    """Random ViT-B/32 visual state_dict in OpenAI key format."""
    sd = {
        "visual.conv1.weight": rng.standard_normal((width, 3, patch, patch)) * 0.02,
        "visual.class_embedding": rng.standard_normal((width,)) * 0.02,
        "visual.positional_embedding": rng.standard_normal((50, width)) * 0.01,
        "visual.ln_pre.weight": np.ones(width), "visual.ln_pre.bias": np.zeros(width),
        "visual.ln_post.weight": np.ones(width), "visual.ln_post.bias": np.zeros(width),
        "visual.proj": rng.standard_normal((width, out)) * 0.02,
    }
    for i in range(layers):
        p = f"visual.transformer.resblocks.{i}"
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
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _write_video(path, n_frames=40):
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (160, 120))
    for i in range(n_frames):
        f = np.zeros((120, 160, 3), np.uint8)
        cv2.rectangle(f, (i * 2, 30), (i * 2 + 30, 70), (0, 200, 255), -1)
        w.write(f)
    w.release()


def test_fused_video_caption_fn():
    """CLIP tower + captioner fuse into one jitted program."""
    from vct_tpu.clip.vision import CLIPVisionTower
    from vct_tpu.config import ModelConfig, TPUConfig
    from vct_tpu.models.mmt4caption import MMT4Caption
    from vct_tpu.pipeline import make_video_caption_fn

    tower = CLIPVisionTower(width=64, layers=1, heads=2, out_dim=16)
    mcfg = ModelConfig.from_dict({
        "modal": ["CLIP4Clip"], "modal_shape": [16], "embed_dim": 32,
        "dropout": 0.0, "vocab_size": 40,
        "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64},
    })
    model = MMT4Caption(mcfg, TPUConfig(dtype="float32"))

    rng = np.random.default_rng(0)
    n, t = 2, 4
    pixels = jnp.asarray(rng.standard_normal((n, t, 224, 224, 3)), jnp.float32)
    clip_params = tower.init(jax.random.PRNGKey(0), pixels[0])["params"]
    feats = [jnp.zeros((n, t, 16), jnp.float32)]
    masks = [jnp.zeros((n, t), bool)]
    caps = jnp.full((n, 8), 0, jnp.int32).at[:, 0].set(2)
    variables = model.init(jax.random.PRNGKey(1), feats, masks, caps, caps == 0,
                           method=MMT4Caption.caption_loss)

    fn = make_video_caption_fn(model, tower, max_len=8, start_id=2, end_id=3)
    tokens, _ = fn(variables, clip_params, pixels)
    assert tokens.shape == (n, 8)
    assert (np.asarray(tokens)[:, 0] == 2).all()
    # deterministic: same pixels -> same tokens
    tokens2, _ = fn(variables, clip_params, pixels)
    np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))

    # fused BEAM path (round-2 VERDICT #9): pixels -> beam search, one program
    bfn = make_video_caption_fn(model, tower, max_len=8, start_id=2, end_id=3,
                                beam_size=3)
    btokens, scores = bfn(variables, clip_params, pixels)
    assert btokens.shape == (n, 8) and scores.shape == (n,)
    assert (np.asarray(btokens)[:, 0] == 2).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="greedy-only"):
        make_video_caption_fn(model, tower, max_len=8, start_id=2, end_id=3,
                              beam_size=3, collect_attn=True)


def test_predict_cli_raw_video(tmp_path):
    """predict -v: host decode -> fused CLIP+captioner -> caption string."""
    from vct_tpu.cli.predict import main

    _write_video(tmp_path / "in.avi")
    np.savez(tmp_path / "clip.npz", **_random_openai_clip_sd(np.random.default_rng(0)))

    # reuse the tiny-config workspace pattern from test_cli
    feat_dir = tmp_path / "feats"; feat_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(3):
        np.save(feat_dir / f"vid{i}.npy", rng.standard_normal((5, 512)).astype(np.float32))
        lines.append(f"vid{i} a thing moves {i}")
    (tmp_path / "ann.txt").write_text("\n".join(lines))
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "a", "thing", "moves", "0", "1", "2"]))
    split = {"feat_dir": [str(feat_dir)], "annotation_path": str(tmp_path / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 2}
    cfg = {
        "data": {"train": split, "eval": dict(split, mode="by_video",
                                              split_mode="validate")},
        "train": {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "log"), "tag": "t"},
        "test": {"max_length": 8},
        "model": {"modal": ["CLIP4Clip"], "modal_shape": [512], "embed_dim": 32,
                  "dropout": 0.1, "activation": "gelu",
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64}},
        "tpu": {"max_frames": 5, "max_caption_len": 10, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "vocab.txt")},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    # make a checkpoint by training one step-free save: use the Trainer save path
    from vct_tpu.config import load_config
    from vct_tpu.train.loop import Trainer

    trainer = Trainer(load_config(str(tmp_path / "config.json")), log=lambda *_: None)
    ckpt = trainer.save("_e0", 0)

    main(["-c", str(tmp_path / "config.json"), "-m", ckpt,
          "-v", str(tmp_path / "in.avi"), "--ext_type", "uni_4",
          "--clip_weights", str(tmp_path / "clip.npz"), "--greedy"])

    # --beam on the fused raw-video path (round-2 VERDICT #9)
    main(["-c", str(tmp_path / "config.json"), "-m", ckpt,
          "-v", str(tmp_path / "in.avi"), "--ext_type", "uni_4",
          "--clip_weights", str(tmp_path / "clip.npz"), "--beam", "2"])


def test_fused_matches_staged():
    """The fused pixels->caption program must emit the same tokens as running
    the CLIP tower and the decoder as separate programs."""
    from vct_tpu.clip.vision import CLIPVisionTower
    from vct_tpu.config import ModelConfig, TPUConfig
    from vct_tpu.decode import make_greedy_fn
    from vct_tpu.models.mmt4caption import MMT4Caption
    from vct_tpu.pipeline import make_video_caption_fn

    tower = CLIPVisionTower(width=64, layers=1, heads=2, out_dim=16)
    mcfg = ModelConfig.from_dict({
        "modal": ["CLIP4Clip"], "modal_shape": [16], "embed_dim": 32,
        "dropout": 0.0, "vocab_size": 40,
        "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                          "mme": {"temporal": "encoding", "aggregation": "avg"}},
        "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64},
    })
    model = MMT4Caption(mcfg, TPUConfig(dtype="float32"))
    rng = np.random.default_rng(7)
    n, t = 2, 4
    pixels = jnp.asarray(rng.standard_normal((n, t, 224, 224, 3)), jnp.float32)
    clip_params = tower.init(jax.random.PRNGKey(0), pixels[0])["params"]
    feats0 = [jnp.zeros((n, t, 16), jnp.float32)]
    masks0 = [jnp.zeros((n, t), bool)]
    caps = jnp.full((n, 8), 0, jnp.int32).at[:, 0].set(2)
    variables = model.init(jax.random.PRNGKey(1), feats0, masks0, caps, caps == 0,
                           method=MMT4Caption.caption_loss)

    fused_tokens, _ = make_video_caption_fn(model, tower, max_len=8,
                                            start_id=2, end_id=3)(
        variables, clip_params, pixels)

    flat = pixels.reshape((n * t, 224, 224, 3))
    feats = tower.apply({"params": clip_params}, flat).reshape(n, t, 16)
    staged_tokens, _ = make_greedy_fn(model, 8, 2, 3)(
        variables, [feats.astype(jnp.float32)], masks0)
    np.testing.assert_array_equal(np.asarray(fused_tokens), np.asarray(staged_tokens))


def test_extract_cli(tmp_path, capsys):
    """Offline feature extraction: video dir -> per-video (T, 512) .npy
    (the reference's training-data prep, README.md:94-96)."""
    from vct_tpu.cli.extract import main

    vid_dir = tmp_path / "vids"; vid_dir.mkdir()
    _write_video(vid_dir / "a.avi", n_frames=30)
    _write_video(vid_dir / "b.avi", n_frames=50)
    np.savez(tmp_path / "clip.npz", **_random_openai_clip_sd(np.random.default_rng(0)))
    out = tmp_path / "feats"

    main(["--videos", str(vid_dir), "--out", str(out), "--ext_type", "uni_4",
          "--clip_weights", str(tmp_path / "clip.npz"), "--batch_frames", "8"])
    a = np.load(out / "a.npy"); b = np.load(out / "b.npy")
    assert a.shape == (4, 512) and b.shape == (4, 512)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert "extracted 2 videos" in capsys.readouterr().out

    # skip-existing then overwrite
    main(["--videos", str(vid_dir), "--out", str(out), "--ext_type", "uni_4",
          "--clip_weights", str(tmp_path / "clip.npz")])
    assert "extracted 0 videos (2 skipped)" in capsys.readouterr().out


def test_extract_cli_i3d(tmp_path, capsys):
    """--feat_type I3D (VERDICT r3 #5): video -> (n_stacks, 1024) .npy via the
    Flax Kinetics I3D tower (reference predict_video.py:157 declares the I3D
    arm; the video_features submodule it delegates to is an empty stub)."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.extract import main

    vid_dir = tmp_path / "vids"; vid_dir.mkdir()
    _write_video(vid_dir / "a.avi", n_frames=30)  # < 64 -> looped to 1 stack
    np.savez(tmp_path / "i3d.npz", **_synthetic_state_dict(np.random.RandomState(0)))
    out = tmp_path / "feats"

    main(["--videos", str(vid_dir), "--out", str(out), "--feat_type", "I3D",
          "--i3d_weights", str(tmp_path / "i3d.npz")])
    a = np.load(out / "a.npy")
    assert a.shape == (1, 1024)
    assert np.isfinite(a).all()
    assert "extracted 1 videos" in capsys.readouterr().out


def test_extract_cli_i3d_flow(tmp_path, capsys):
    """--feat_type I3D --i3d_stream flow (round-4 VERDICT #7): video ->
    host-side optical flow -> 2-channel-stem flow tower -> (n_stacks, 1024)."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.extract import main

    vid_dir = tmp_path / "vids"; vid_dir.mkdir()
    _write_video(vid_dir / "a.avi", n_frames=20)  # 19 flow fields -> 1 stack
    np.savez(tmp_path / "i3d_flow.npz",
             **_synthetic_state_dict(np.random.RandomState(1), in_channels=2))
    out = tmp_path / "feats"

    main(["--videos", str(vid_dir), "--out", str(out), "--feat_type", "I3D",
          "--i3d_stream", "flow",
          "--i3d_weights", str(tmp_path / "i3d_flow.npz")])
    a = np.load(out / "a.npy")
    assert a.shape == (1, 1024)
    assert np.isfinite(a).all()
    assert "extracted 1 videos" in capsys.readouterr().out


def test_extract_cli_i3d_flow_single_frame_video(tmp_path, capsys):
    """A degenerate 1-frame video must not abort the flow-arm run:
    estimate_flow needs >= 2 frames, so extract duplicates the frame
    (near-zero flow field) — the same tolerance i3d_stacks' frame
    looping gives the RGB arm (round-5 review finding)."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.extract import main

    vid_dir = tmp_path / "vids"; vid_dir.mkdir()
    _write_video(vid_dir / "one.avi", n_frames=1)
    np.savez(tmp_path / "i3d_flow.npz",
             **_synthetic_state_dict(np.random.RandomState(2), in_channels=2))
    out = tmp_path / "feats"

    main(["--videos", str(vid_dir), "--out", str(out), "--feat_type", "I3D",
          "--i3d_stream", "flow",
          "--i3d_weights", str(tmp_path / "i3d_flow.npz")])
    a = np.load(out / "one.npy")
    assert a.shape == (1, 1024)
    assert np.isfinite(a).all()
    assert "extracted 1 videos" in capsys.readouterr().out


def test_predict_cli_i3d_raw_video(tmp_path):
    """predict -v --feat_type I3D: I3D tower features -> captioner."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.predict import main

    _write_video(tmp_path / "in.avi", n_frames=30)
    np.savez(tmp_path / "i3d.npz", **_synthetic_state_dict(np.random.RandomState(1)))

    feat_dir = tmp_path / "feats"; feat_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(3):
        np.save(feat_dir / f"vid{i}.npy", rng.standard_normal((2, 1024)).astype(np.float32))
        lines.append(f"vid{i} a thing moves {i}")
    (tmp_path / "ann.txt").write_text("\n".join(lines))
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "a", "thing", "moves", "0", "1", "2"]))
    split = {"feat_dir": [str(feat_dir)], "annotation_path": str(tmp_path / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 2}
    cfg = {
        "data": {"train": split, "eval": dict(split, mode="by_video",
                                              split_mode="validate")},
        "train": {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "log"), "tag": "t"},
        "test": {"max_length": 8},
        "model": {"modal": ["I3D"], "modal_shape": [1024], "embed_dim": 32,
                  "dropout": 0.1, "activation": "gelu",
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64}},
        "tpu": {"max_frames": 5, "max_caption_len": 10, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "vocab.txt")},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    from vct_tpu.config import load_config
    from vct_tpu.train.loop import Trainer

    trainer = Trainer(load_config(str(tmp_path / "config.json")), log=lambda *_: None)
    ckpt = trainer.save("_e0", 0)

    main(["-c", str(tmp_path / "config.json"), "-m", ckpt,
          "-v", str(tmp_path / "in.avi"), "--feat_type", "I3D",
          "--i3d_weights", str(tmp_path / "i3d.npz"), "--greedy"])


def test_predict_cli_i3d_both_streams_single_frame(tmp_path):
    """predict -v --i3d_stream both on a degenerate 1-frame video: two
    I3D towers (RGB + flow) feed a two-modality captioner. Covers the
    round-5 review findings — the flow arm duplicates the single frame
    (near-zero flow field) instead of crashing, and the stream->slot
    ordering follows the config's modal names."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.predict import main

    _write_video(tmp_path / "in.avi", n_frames=1)
    rs = np.random.RandomState(3)
    np.savez(tmp_path / "i3d_rgb.npz", **_synthetic_state_dict(rs))
    np.savez(tmp_path / "i3d_flow.npz",
             **_synthetic_state_dict(rs, in_channels=2))

    rng = np.random.default_rng(1)
    lines = []
    feat_dirs = []
    for modal in ("rgbd", "flowd"):
        d = tmp_path / modal; d.mkdir()
        feat_dirs.append(str(d))
        for i in range(3):
            np.save(d / f"vid{i}.npy",
                    rng.standard_normal((2, 1024)).astype(np.float32))
    lines = [f"vid{i} a thing moves {i}" for i in range(3)]
    (tmp_path / "ann.txt").write_text("\n".join(lines))
    (tmp_path / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
                   "a", "thing", "moves", "0", "1", "2"]))
    split = {"feat_dir": feat_dirs, "annotation_path": str(tmp_path / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption", "split_mode": "train",
             "batch_size": 2}
    cfg = {
        "data": {"train": split, "eval": dict(split, mode="by_video",
                                              split_mode="validate")},
        "train": {"task": "caption", "optimizer": {"name": "adam", "learning_rate": 1e-3},
                  "epoch": 1, "save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "log"), "tag": "t"},
        "test": {"max_length": 8},
        "model": {"modal": ["i3d_rgb", "i3d_flow"], "modal_shape": [1024, 1024],
                  "embed_dim": 32, "dropout": 0.1, "activation": "gelu",
                  "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                    "mme": {"temporal": "encoding", "aggregation": "avg"}},
                  "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64}},
        "tpu": {"max_frames": 5, "max_caption_len": 10, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(tmp_path / "vocab.txt")},
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    from vct_tpu.config import load_config
    from vct_tpu.train.loop import Trainer

    trainer = Trainer(load_config(str(tmp_path / "config.json")), log=lambda *_: None)
    ckpt = trainer.save("_e0", 0)

    main(["-c", str(tmp_path / "config.json"), "-m", ckpt,
          "-v", str(tmp_path / "in.avi"), "--feat_type", "I3D",
          "--i3d_stream", "both",
          "--i3d_weights", str(tmp_path / "i3d_rgb.npz"),
          "--i3d_flow_weights", str(tmp_path / "i3d_flow.npz"), "--greedy"])


def test_extract_cli_i3d_both_matches_single_stream_runs(tmp_path, capsys):
    """--i3d_stream both (round 5): one pass decodes + crops each video once
    and writes RGB features to --out and flow features to --out_flow. Must be
    BIT-identical to the two single-stream runs it replaces (the shared crop
    is exactly what preprocess_i3d_frames/_flow each start from)."""
    from tests.test_i3d import _synthetic_state_dict

    from vct_tpu.cli.extract import main

    vid_dir = tmp_path / "vids"; vid_dir.mkdir()
    _write_video(vid_dir / "a.avi", n_frames=3)
    rs = np.random.RandomState(7)
    np.savez(tmp_path / "rgb.npz", **_synthetic_state_dict(rs))
    np.savez(tmp_path / "flow.npz", **_synthetic_state_dict(rs, in_channels=2))
    w = {"rgb": str(tmp_path / "rgb.npz"), "flow": str(tmp_path / "flow.npz")}

    main(["--videos", str(vid_dir), "--out", str(tmp_path / "both_rgb"),
          "--out_flow", str(tmp_path / "both_flow"), "--feat_type", "I3D",
          "--i3d_stream", "both", "--i3d_weights", w["rgb"],
          "--i3d_flow_weights", w["flow"]])
    assert "extracted 1 videos" in capsys.readouterr().out

    for stream in ("rgb", "flow"):
        main(["--videos", str(vid_dir), "--out", str(tmp_path / f"solo_{stream}"),
              "--feat_type", "I3D", "--i3d_stream", stream,
              "--i3d_weights", w[stream]])
        a = np.load(tmp_path / f"both_{stream}" / "a.npy")
        b = np.load(tmp_path / f"solo_{stream}" / "a.npy")
        assert a.shape == b.shape == (1, 1024)
        np.testing.assert_array_equal(a, b)

    # skip logic covers BOTH outputs: rerun without --overwrite writes nothing
    main(["--videos", str(vid_dir), "--out", str(tmp_path / "both_rgb"),
          "--out_flow", str(tmp_path / "both_flow"), "--feat_type", "I3D",
          "--i3d_stream", "both", "--i3d_weights", w["rgb"],
          "--i3d_flow_weights", w["flow"]])
    assert "extracted 0 videos (1 skipped)" in capsys.readouterr().out

    # per-file skip (round-5 review finding): a missing sibling forces a
    # recompute but must NOT clobber the existing output without --overwrite
    sentinel = np.full((1, 1024), 7.0, np.float32)
    np.save(tmp_path / "both_rgb" / "a.npy", sentinel)
    (tmp_path / "both_flow" / "a.npy").unlink()
    main(["--videos", str(vid_dir), "--out", str(tmp_path / "both_rgb"),
          "--out_flow", str(tmp_path / "both_flow"), "--feat_type", "I3D",
          "--i3d_stream", "both", "--i3d_weights", w["rgb"],
          "--i3d_flow_weights", w["flow"]])
    np.testing.assert_array_equal(
        np.load(tmp_path / "both_rgb" / "a.npy"), sentinel)
    np.testing.assert_array_equal(
        np.load(tmp_path / "both_flow" / "a.npy"),
        np.load(tmp_path / "solo_flow" / "a.npy"))

    # missing --out_flow / --i3d_flow_weights fail loudly
    with pytest.raises(SystemExit, match="out_flow"):
        main(["--videos", str(vid_dir), "--out", str(tmp_path / "x"),
              "--feat_type", "I3D", "--i3d_stream", "both",
              "--i3d_weights", w["rgb"], "--i3d_flow_weights", w["flow"]])
    with pytest.raises(SystemExit, match="i3d_flow_weights"):
        main(["--videos", str(vid_dir), "--out", str(tmp_path / "x"),
              "--out_flow", str(tmp_path / "y"), "--feat_type", "I3D",
              "--i3d_stream", "both", "--i3d_weights", w["rgb"]])
