"""Data layer tests over a synthetic MSVD/MSR-VTT fixture on disk."""

import json

import numpy as np
import pytest

from vct_tpu.config import SplitConfig, TPUConfig
from vct_tpu.data.collate import fit_time_axis
from vct_tpu.data.datasets import MSRVTTDataset, MSVDDataset, build_dataset, load_feature
from vct_tpu.data.loader import DataLoader, build_dataloader

N_VIDEOS = 7
T_FRAMES = 12
E_FEAT = 16


@pytest.fixture(scope="module")
def msvd_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msvd")
    feat_dir = root / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N_VIDEOS):
        arr = rng.standard_normal((T_FRAMES, E_FEAT)).astype(np.float32)
        if i % 2:  # store transposed (E, T) to exercise auto-orientation
            arr = arr.T
        np.save(feat_dir / f"vid{i}.npy", arr)
    ann = root / "train.txt"
    lines = []
    for i in range(N_VIDEOS):
        for j in range(3):
            lines.append(f"vid{i} a person does action {i} variant {j}")
    ann.write_text("\n".join(lines))
    return root


@pytest.fixture(scope="module")
def msrvtt_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("msrvtt")
    feat_dir = root / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(1)
    videos, sentences = [], []
    for i in range(N_VIDEOS):
        np.save(
            feat_dir / f"video{i}.npy",
            rng.standard_normal((T_FRAMES, E_FEAT)).astype(np.float32),
        )
        split = "train" if i < 5 else "validate"
        videos.append({"video_id": f"video{i}", "split": split})
        for j in range(2):
            sentences.append({"video_id": f"video{i}", "caption": f"caption {i} {j}"})
    (root / "ann.json").write_text(json.dumps({"videos": videos, "sentences": sentences}))
    return root


def test_load_feature_auto_orientation(msvd_root):
    for i in range(2):
        arr = load_feature(str(msvd_root / "feats" / f"vid{i}.npy"))
        assert arr.shape == (T_FRAMES, E_FEAT)


def test_msvd_dataset_modes(msvd_root):
    ds = MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"))
    assert len(ds) == N_VIDEOS * 3  # by_caption: one sample per caption
    feats, cap, vid = ds[0]
    assert feats[0].shape == (T_FRAMES, E_FEAT)
    assert cap.startswith("a person")
    assert vid in ds.video2caption and len(ds.video2caption[vid]) == 3

    ds_v = MSVDDataset(
        [str(msvd_root / "feats")], str(msvd_root / "train.txt"), mode="by_video"
    )
    assert len(ds_v) == N_VIDEOS
    feats, cap, vid = ds_v[2]
    assert cap == "" and vid == sorted(f"vid{i}" for i in range(N_VIDEOS))[2]


def test_msvd_debug_truncation(msvd_root):
    ds = MSVDDataset(
        [str(msvd_root / "feats")], str(msvd_root / "train.txt"), debug=True, debug_num=5
    )
    assert len(ds) == 5


def test_msrvtt_split_filtering(msrvtt_root):
    tr = MSRVTTDataset([str(msrvtt_root / "feats")], str(msrvtt_root / "ann.json"), "train")
    va = MSRVTTDataset([str(msrvtt_root / "feats")], str(msrvtt_root / "ann.json"), "val")
    assert len(tr) == 5 * 2
    assert len(va) == 2 * 2
    assert va.split_type == "validate"  # val -> validate normalization


def test_fit_time_axis():
    feat = np.arange(20, dtype=np.float32).reshape(5, 4)
    out, mask = fit_time_axis(feat, 8)
    assert out.shape == (8, 4)
    np.testing.assert_array_equal(mask, [False] * 5 + [True] * 3)
    np.testing.assert_array_equal(out[:5], feat)
    # longer than max -> uniform subsample, nothing padded
    out, mask = fit_time_axis(feat, 3)
    assert not mask.any()
    np.testing.assert_array_equal(out, feat[[0, 2, 4]])


def test_dataloader_static_shapes_and_fill(msvd_root):
    ds = MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"))
    loader = DataLoader(ds, batch_size=8, max_frames=T_FRAMES, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == -(-len(ds) // 8) == len(loader)
    for b in batches:
        assert b.feats[0].shape == (8, T_FRAMES, E_FEAT)
        assert b.masks[0].shape == (8, T_FRAMES)
    assert batches[-1].n_valid == len(ds) % 8


def test_dataloader_deterministic_shuffle(msvd_root):
    ds = MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"))
    l1 = DataLoader(ds, batch_size=4, max_frames=T_FRAMES, shuffle=True, seed=666)
    l1.set_epoch(3)
    l2 = DataLoader(ds, batch_size=4, max_frames=T_FRAMES, shuffle=True, seed=666)
    l2.set_epoch(3)
    v1 = [b.vids for b in l1]
    v2 = [b.vids for b in l2]
    assert v1 == v2
    l2.set_epoch(4)
    assert [b.vids for b in l2] != v1
    # train loader drops the ragged tail for static shapes
    assert len(l1) == len(ds) // 4


def test_build_dataset_factory(msvd_root):
    cfg = SplitConfig(
        feat_dir=(str(msvd_root / "feats"),),
        annotation_path=str(msvd_root / "train.txt"),
        dataset="msvd",
        split_mode="train",
    )
    ds, loader = build_dataloader(cfg, TPUConfig(max_frames=T_FRAMES))
    assert loader.shuffle
    assert isinstance(ds, MSVDDataset)


def test_vatex_dataset(tmp_path):
    """VATEX: JSON list of {videoID, enCap}, features keyed by the 11-char
    YouTube-id prefix of the file stem (reference dataloader.py:114-151)."""
    import json as _json

    from vct_tpu.data.datasets import VATEXDataset

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    # stems carry start/end suffixes like real VATEX clips
    stems = ["abcdefghijk_000010_000020", "LMNOPQRSTUV_000000_000010"]
    for s in stems:
        np.save(feat_dir / f"{s}.npy", rng.standard_normal((4, 8)).astype(np.float32))
    ann = [
        {"videoID": "abcdefghijk_000010_000020", "enCap": ["a cat sits", "a cat rests"]},
        {"videoID": "LMNOPQRSTUV_000000_000010", "enCap": ["a dog runs"]},
        {"videoID": "notinfeats0_000000_000010", "enCap": ["missing video"]},
    ]
    (tmp_path / "ann.json").write_text(_json.dumps(ann))

    ds = VATEXDataset([str(feat_dir)], str(tmp_path / "ann.json"),
                      split_type="train", mode="by_caption")
    assert len(ds) == 3  # 2 + 1 captions; the missing video contributes none
    feats, cap, vid = ds[0]
    assert feats[0].shape == (4, 8) and isinstance(cap, str) and vid in stems
    gt = ds.video2caption
    assert sorted(map(len, gt.values())) == [1, 2]


# ---------------------------------------------------------------------------
# round-3 review fixes: fail-fast datasets, no leaked prefetch threads
# ---------------------------------------------------------------------------


def test_missing_stem_in_first_modality_warns_and_drops(tmp_path):
    """A stem missing from some modality dirs is survivable: warn loudly and
    drop it (round-4 revision of the round-3 hard-fail — a stray extra .npy
    shouldn't abort dataset construction), keeping symmetry: it drops no
    matter WHICH dir lost the file, including feat_dirs[0]."""
    rng = np.random.default_rng(3)
    d0, d1 = tmp_path / "m0", tmp_path / "m1"
    d0.mkdir(); d1.mkdir()
    for i in range(3):
        arr = rng.standard_normal((4, 8)).astype(np.float32)
        if i > 0:  # v0 missing from the FIRST dir
            np.save(d0 / f"v{i}.npy", arr)
        np.save(d1 / f"v{i}.npy", arr)
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(f"v{i} a caption" for i in range(3)))
    with pytest.warns(UserWarning, match="v0"):
        ds = MSVDDataset([str(d0), str(d1)], str(ann))
    assert len(ds) == 2  # v0 dropped everywhere, not just from dir 0
    assert "v0" not in ds.video_ids_all


def test_disjoint_feature_dirs_raise(tmp_path):
    """No shared stems at all = the dirs don't describe the same videos;
    that is a configuration error, not a stray file."""
    rng = np.random.default_rng(4)
    d0, d1 = tmp_path / "m0", tmp_path / "m1"
    d0.mkdir(); d1.mkdir()
    np.save(d0 / "a.npy", rng.standard_normal((4, 8)).astype(np.float32))
    np.save(d1 / "b.npy", rng.standard_normal((4, 8)).astype(np.float32))
    ann = tmp_path / "ann.txt"
    ann.write_text("a a caption\nb a caption")
    with pytest.raises(FileNotFoundError, match="NO video stems"):
        MSVDDataset([str(d0), str(d1)], str(ann))


def test_unknown_split_type_raises(msvd_root):
    with pytest.raises(ValueError, match="split_type"):
        MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"),
                    split_type="dev")


def test_abandoned_iterator_reaps_prefetch_thread(msvd_root):
    """Breaking out of a prefetching loader mid-epoch must not leak the
    producer thread blocked on a full queue."""
    import threading
    import time as _time

    ds = MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"))
    loader = DataLoader(ds, batch_size=2, max_frames=T_FRAMES,
                        shuffle=False, drop_last=False, prefetch=2)
    before = {t.ident for t in threading.enumerate()}
    it = iter(loader)
    next(it)  # producer started and likely blocked on the full queue
    it.close()  # the consumer abandons the epoch (same as `break`)
    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        _time.sleep(0.05)
    assert not leaked, f"prefetch producer leaked: {leaked}"


def test_native_unknown_mode_raises(msvd_root):
    from vct_tpu.data import native as native_mod

    if not native_mod.available():
        pytest.skip("native loader unavailable")
    ds = MSVDDataset([str(msvd_root / "feats")], str(msvd_root / "train.txt"))
    ds.mode = "by-caption"  # typo'd mode
    with pytest.raises(ValueError, match="unknown mode"):
        native_mod.collate_from_dataset(ds, [0, 1], batch_size=2,
                                        max_frames=T_FRAMES)


def test_dropped_stem_not_sampleable_from_any_dir(tmp_path):
    """Round-5 review: cap_vid_list must filter against the COMMON-stem set.
    A stem present in feat_dirs[0] but missing from a later dir used to stay
    sampleable (the filter checked dir0 only) and KeyError'd mid-epoch when
    its features were loaded."""
    rng = np.random.default_rng(5)
    d0, d1 = tmp_path / "m0", tmp_path / "m1"
    d0.mkdir(); d1.mkdir()
    for i in range(3):
        arr = rng.standard_normal((4, 8)).astype(np.float32)
        np.save(d0 / f"v{i}.npy", arr)
        if i > 0:  # v0 missing from the SECOND dir this time
            np.save(d1 / f"v{i}.npy", arr)
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(f"v{i} a caption" for i in range(3)))
    with pytest.warns(UserWarning, match="v0"):
        ds = MSVDDataset([str(d0), str(d1)], str(ann))
    assert all(vid != "v0" for _, vid in ds.cap_vid_list)
    # every remaining sample loads cleanly (this used to KeyError on v0)
    for i in range(len(ds)):
        feats, caption, vid = ds[i]
        assert len(feats) == 2


def test_build_dataset_unknown_name_raises(msvd_root):
    from vct_tpu.data.datasets import build_dataset

    cfg = SplitConfig(
        feat_dir=(str(msvd_root / "feats"),),
        annotation_path=str(msvd_root / "train.txt"),
        dataset="msr-vtt",  # typo: silent MSRVTT fallback used to hide it
        split_mode="train",
    )
    with pytest.raises(ValueError, match="unknown dataset"):
        build_dataset(cfg)
