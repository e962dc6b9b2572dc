"""Native C++ batch loader: bit-exact parity with the Python collate path."""

import numpy as np
import pytest

from vct_tpu.data import native
from vct_tpu.data.collate import collate, fit_time_axis
from vct_tpu.data.datasets import load_feature

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (no compiler)"
)

E = 24


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("npy")
    rng = np.random.default_rng(0)
    cases = {
        "te_short": rng.standard_normal((5, E)).astype(np.float32),      # (T,E), T<max
        "te_exact": rng.standard_normal((8, E)).astype(np.float32),      # T==max
        "te_long": rng.standard_normal((23, E)).astype(np.float32),      # subsample
        "et_stored": rng.standard_normal((E, 7)).astype(np.float32),     # (E,T) stored
        "f64": rng.standard_normal((6, E)),                               # <f8 payload
        "squeeze": rng.standard_normal((1, 9, E)).astype(np.float32),    # leading 1-dim
        "fortran": np.asfortranarray(rng.standard_normal((10, E)).astype(np.float32)),
    }
    paths = {}
    for name, arr in cases.items():
        p = root / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)
    return paths


def test_parity_all_layouts(files):
    max_t = 8
    paths = list(files.values())
    feats, mask = native.load_padded_batch(paths, max_t, E)
    assert feats.shape == (len(paths), max_t, E) and mask.shape == (len(paths), max_t)
    for i, p in enumerate(paths):
        ref_feat, ref_mask = fit_time_axis(load_feature(p), max_t)
        np.testing.assert_array_equal(feats[i], ref_feat, err_msg=p)
        np.testing.assert_array_equal(mask[i], ref_mask, err_msg=p)


def test_wrong_dim_raises(files, tmp_path):
    bad = tmp_path / "bad.npy"
    np.save(bad, np.zeros((5, E + 3), np.float32))
    with pytest.raises(IOError, match="feature dim"):
        native.load_padded_batch([str(bad)], 8, E)


def test_missing_file_raises(files):
    with pytest.raises(IOError, match="cannot open"):
        native.load_padded_batch(["/nope/missing.npy"], 8, E)


def test_one_dim_raises_like_python(tmp_path):
    """A (T,) feature must error in BOTH paths — never silently load as a
    single frame (ADVICE round 1: the native path used to promote to 2-D)."""
    bad = tmp_path / "onedim.npy"
    np.save(bad, np.zeros((E,), np.float32))
    with pytest.raises(ValueError):
        load_feature(str(bad))
    with pytest.raises(IOError, match="not 2-D"):
        native.load_padded_batch([str(bad)], 8, E)


def test_dataloader_native_matches_python(tmp_path):
    from vct_tpu.data.datasets import MSVDDataset
    from vct_tpu.data.loader import DataLoader

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(5):
        t = int(rng.integers(3, 15))
        np.save(feat_dir / f"vid{i}.npy", rng.standard_normal((t, E)).astype(np.float32))
        lines.append(f"vid{i} caption number {i}")
    (tmp_path / "ann.txt").write_text("\n".join(lines))

    ds = MSVDDataset([str(feat_dir)], str(tmp_path / "ann.txt"),
                     split_type="train", mode="by_caption")
    kw = dict(max_frames=8, shuffle=False, prefetch=0)
    batches_native = list(DataLoader(ds, 2, native=True, **kw))
    batches_python = list(DataLoader(ds, 2, native=False, **kw))
    assert len(batches_native) == len(batches_python) > 0
    for bn, bp in zip(batches_native, batches_python):
        assert bn.vids == bp.vids and bn.captions == bp.captions
        assert bn.n_valid == bp.n_valid
        for fn_, fp_ in zip(bn.feats, bp.feats):
            np.testing.assert_array_equal(fn_, fp_)
        for mn_, mp_ in zip(bn.masks, bp.masks):
            np.testing.assert_array_equal(mn_, mp_)


def test_subsample_bitexact_adversarial(tmp_path):
    """T values where naive i*(t-1)/(max_t-1) rounding diverges from numpy's
    step-first linspace (found by review: T=123/231/245, max_t=15)."""
    max_t = 15
    e_wide = 300  # must stay > T: the reference orientation rule is dim0<=dim1
    rng = np.random.default_rng(3)
    for t in (123, 231, 245, 16, 100):
        p = tmp_path / f"t{t}.npy"
        np.save(p, rng.standard_normal((t, e_wide)).astype(np.float32))
        feats, mask = native.load_padded_batch([str(p)], max_t, e_wide)
        ref_feat, ref_mask = fit_time_axis(load_feature(str(p)), max_t)
        np.testing.assert_array_equal(feats[0], ref_feat, err_msg=f"T={t}")
        np.testing.assert_array_equal(mask[0], ref_mask, err_msg=f"T={t}")


def test_float16_payload(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.standard_normal((6, E)).astype(np.float16)
    # include subnormals + specials
    arr[0, 0] = np.float16(6e-8)
    arr[0, 1] = np.float16(-6e-8)
    arr[0, 2] = np.float16(0.0)
    p = tmp_path / "h.npy"
    np.save(p, arr)
    feats, _ = native.load_padded_batch([str(p)], 8, E)
    np.testing.assert_array_equal(feats[0, :6], arr.astype(np.float32))


def test_unsupported_dtype_falls_back_to_python(tmp_path):
    """int payloads aren't native-supported; the DataLoader must silently use
    the Python path (which casts) rather than erroring."""
    from vct_tpu.data.datasets import MSVDDataset
    from vct_tpu.data.loader import DataLoader

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    np.save(feat_dir / "vid0.npy", np.arange(3 * E, dtype=np.int32).reshape(3, E))
    (tmp_path / "ann.txt").write_text("vid0 an int feature")
    ds = MSVDDataset([str(feat_dir)], str(tmp_path / "ann.txt"),
                     split_type="train", mode="by_caption")
    loader = DataLoader(ds, 1, max_frames=4, shuffle=False, prefetch=0, native=True)
    batches = list(loader)
    assert len(batches) == 1 and not loader.native  # fell back permanently
    np.testing.assert_array_equal(
        batches[0].feats[0][0, :3],
        np.arange(3 * E, dtype=np.float32).reshape(3, E),
    )


def test_multimodal_native_batches(tmp_path):
    """Two feature dirs (two modalities) through the native collate path."""
    from vct_tpu.data.datasets import MSVDDataset
    from vct_tpu.data.loader import DataLoader

    d1 = tmp_path / "m1"; d1.mkdir()
    d2 = tmp_path / "m2"; d2.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        np.save(d1 / f"vid{i}.npy", rng.standard_normal((4, E)).astype(np.float32))
        np.save(d2 / f"vid{i}.npy", rng.standard_normal((6, E * 2)).astype(np.float32))
    (tmp_path / "ann.txt").write_text("\n".join(f"vid{i} a caption {i}" for i in range(3)))
    ds = MSVDDataset([str(d1), str(d2)], str(tmp_path / "ann.txt"),
                     split_type="train", mode="by_caption")
    kw = dict(max_frames=5, shuffle=False, prefetch=0)
    for bn, bp in zip(DataLoader(ds, 2, native=True, **kw),
                      DataLoader(ds, 2, native=False, **kw)):
        assert len(bn.feats) == 2
        assert bn.feats[0].shape[2] == E and bn.feats[1].shape[2] == E * 2
        for a, b in zip(bn.feats, bp.feats):
            np.testing.assert_array_equal(a, b)
        for a, b in zip(bn.masks, bp.masks):
            np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# float16 output (host->device transfer dtype; round-3)
# ---------------------------------------------------------------------------


def test_f16_output_parity_all_layouts(files):
    """dtype=float16 output == load -> float32 -> astype(float16) bitwise,
    across stored dtypes (f2/f4/f8), layouts, subsampling, padding."""
    max_t = 8
    paths = list(files.values())
    feats, mask = native.load_padded_batch(paths, max_t, E, dtype=np.float16)
    assert feats.dtype == np.float16
    for i, p in enumerate(paths):
        ref_feat, ref_mask = fit_time_axis(load_feature(p), max_t)
        np.testing.assert_array_equal(
            feats[i].view(np.uint16),
            ref_feat.astype(np.float16).view(np.uint16), err_msg=p)
        np.testing.assert_array_equal(mask[i], ref_mask, err_msg=p)


def test_f16_output_memcpy_path_verbatim(tmp_path):
    """f16-stored (T, E) features come back bit-identical (the memcpy fast
    path), including rounding-sensitive values."""
    rng = np.random.default_rng(3)
    arr = (rng.standard_normal((6, E)) * 100).astype(np.float16)
    arr[0, 0] = np.float16(65504)     # max half
    arr[0, 1] = np.float16(6e-8)      # subnormal
    p = tmp_path / "h.npy"
    np.save(p, arr)
    feats, _ = native.load_padded_batch([str(p)], 8, E, dtype=np.float16)
    np.testing.assert_array_equal(
        feats[0, :6].view(np.uint16), arr.view(np.uint16))


def test_f16_rounding_matches_numpy(tmp_path):
    """fp32 payloads: C++ round-to-nearest-even == numpy astype(float16) on
    adversarial values (ties, subnormals, overflow, negatives)."""
    vals = np.array([
        1.0009765625, 1.00048828125, 1.0004882812500002,  # tie and neighbors
        65504.0, 65520.0, 65519.99, -65520.0,             # overflow boundary
        5.960464477539063e-08, 2.9802322387695312e-08,    # subnormal / tie->0
        8.940696716308594e-08, 0.0, -0.0, 1e-45, -1e-45,
        3.14159265, -2.718281828, 1e4, -1e-4,
    ], dtype=np.float32)
    arr = np.zeros((2, E), np.float32)
    arr[0, :len(vals)] = vals
    arr[1, :len(vals)] = -vals
    p = tmp_path / "r.npy"
    np.save(p, arr)
    feats, _ = native.load_padded_batch([str(p)], 2, E, dtype=np.float16)
    np.testing.assert_array_equal(
        feats[0].view(np.uint16), arr.astype(np.float16).view(np.uint16))


def test_loader_feat_dtype_f16(tmp_path):
    """DataLoader(feat_dtype=float16): native and Python fallback paths
    produce identical half batches."""
    from vct_tpu.data.datasets import MSVDDataset
    from vct_tpu.data.loader import DataLoader

    feat_dir = tmp_path / "f"
    feat_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(6):
        np.save(feat_dir / f"v{i}.npy",
                rng.standard_normal((5, E)).astype(np.float32))
        lines.append(f"v{i} a caption {i}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))
    ds = MSVDDataset([str(feat_dir)], str(ann), mode="by_video",
                     split_type="validate")

    batches = {}
    for use_native in (True, False):
        loader = DataLoader(ds, 6, max_frames=8, prefetch=0,
                            native=use_native, feat_dtype=np.float16)
        (batch,) = list(loader)
        assert batch.feats[0].dtype == np.float16
        batches[use_native] = batch
    np.testing.assert_array_equal(
        batches[True].feats[0].view(np.uint16),
        batches[False].feats[0].view(np.uint16))
    np.testing.assert_array_equal(batches[True].masks[0], batches[False].masks[0])
