"""ctypes bridge to the native batch loader (``native/npyloader.cpp``).

The C library reads a batch's ``.npy`` feature files in parallel and fills a
preallocated padded rectangle + pad mask in one call — replacing the
per-item ``np.load`` + Python pad/stack loop (and standing in for the worker
processes of the reference's torch ``DataLoader``, ``dataloader.py:513-532``).
Falls back silently to the pure-Python path when the library can't be built
(no compiler): ``available()`` gates every use.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "npyloader.cpp"
_LIB = _NATIVE_DIR / "libnpyloader.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class NativeLoaderTooOld(RuntimeError):
    """A prebuilt libnpyloader.so predates an entry point the caller needs;
    the Python path is equivalent — callers should fall back, not crash."""


def _build() -> bool:
    if not _SRC.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        stale = (
            not _LIB.exists()
            or (_SRC.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime)
        )
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        common = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int64,  # n
            ctypes.c_int64,  # max_t
            ctypes.c_int64,  # e
            None,  # out (per dtype)
            ctypes.POINTER(ctypes.c_uint8),  # mask
            ctypes.POINTER(ctypes.c_int32),  # lengths
            ctypes.c_int,  # n_threads
            ctypes.c_char_p,  # err_buf
            ctypes.c_int,  # err_len
        ]
        lib.nl_load_padded.restype = ctypes.c_int
        lib.nl_load_padded.argtypes = [
            ctypes.POINTER(ctypes.c_float) if a is None else a for a in common
        ]
        try:
            lib.nl_load_padded_f16.restype = ctypes.c_int
            lib.nl_load_padded_f16.argtypes = [
                ctypes.POINTER(ctypes.c_uint16) if a is None else a
                for a in common
            ]
        except AttributeError:  # stale .so without the f16 entry point
            pass
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_padded_batch(
    paths: Sequence[str], max_t: int, e: int, n_threads: int = 0,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """paths (one .npy per item) -> (feats [N, max_t, e] ``dtype``,
    mask [N, max_t] bool True=pad). Exact ``fit_time_axis`` semantics.

    ``dtype=np.float16`` emits half-precision batches straight from C++
    (f16-stored features are memcpy'd; wider dtypes round-to-nearest-even,
    matching ``load -> float32 -> astype(float16)``) — halves/quarters the
    bytes the host ships to the device, which is the e2e eval bottleneck on
    narrow host->device links (round-3 measurement: a relay-attached chip
    moves ~25 MB/s, so a [2048, 12, 512] fp32 batch costs ~4 s in transfer
    alone)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    dtype = np.dtype(dtype)
    if dtype == np.float16 and not hasattr(lib, "nl_load_padded_f16"):
        raise NativeLoaderTooOld("native loader too old for float16 output")
    if dtype not in (np.dtype(np.float32), np.dtype(np.float16)):
        raise ValueError(f"dtype must be float32 or float16, got {dtype}")
    n = len(paths)
    out = np.empty((n, max_t, e), dtype)
    mask = np.empty((n, max_t), np.uint8)
    lengths = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    err = ctypes.create_string_buffer(512)
    if dtype == np.float16:
        rc = lib.nl_load_padded_f16(
            c_paths, n, max_t, e,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads, err, len(err),
        )
    else:
        rc = lib.nl_load_padded(
            c_paths, n, max_t, e,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_threads, err, len(err),
        )
    if rc != 0:
        raise IOError(f"native loader: {err.value.decode()}")
    return out, mask.astype(bool)


def collate_from_dataset(dataset, indices, *, batch_size: int, max_frames: int,
                         preprocessor=None, feat_dtype=np.float32):
    """Native-path equivalent of ``collate(items, ...)``: resolves (caption,
    vid, paths) host-side, loads + pads all files of the batch in C++."""
    from vct_tpu.data.collate import Batch

    # the dataset's own mode dispatch — identical rows to CoreDataset[i]
    rows: List[Tuple[str, str]] = [dataset.row(int(i)) for i in indices]
    n_valid = len(rows)
    pad = batch_size - n_valid
    rows = rows + [rows[0]] * pad

    feats: List[np.ndarray] = []
    masks: List[np.ndarray] = []
    dims = dataset.feature_dims if hasattr(dataset, "feature_dims") else None
    # one path resolution per REAL row; filler rows repeat row 0 in memory
    # below instead of re-reading its file (batch_size - n_valid) times
    row_paths = [dataset.feature_paths(vid) for _, vid in rows[:n_valid]]
    if dims is None:
        # E is constant per modality for the whole epoch — peek each
        # modality's header once and memo it on the dataset
        dims = getattr(dataset, "_native_peeked_dims", None)
        if dims is None:
            dims = [_peek_dim(row_paths[0][m]) for m in range(dataset.num_modal)]
            dataset._native_peeked_dims = dims
    for m in range(dataset.num_modal):
        paths = [p[m] for p in row_paths]
        f, msk = load_padded_batch(paths, max_frames, dims[m], dtype=feat_dtype)
        if pad:
            # bit-identical to re-loading row 0's file: same bytes
            f = np.concatenate([f, np.repeat(f[:1], pad, axis=0)])
            msk = np.concatenate([msk, np.repeat(msk[:1], pad, axis=0)])
        feats.append(f)
        masks.append(msk)

    captions = tuple(c for c, _ in rows)
    vids = tuple(v for _, v in rows)
    token_ids = token_mask = None
    if preprocessor is not None:
        token_ids, token_mask = preprocessor(captions)
    return Batch(feats, masks, captions, vids, token_ids, token_mask, n_valid)


def _peek_dim(path: str) -> int:
    """Feature dim of one file (header-only read; E = the larger dim under
    the reference's T<E orientation rule)."""
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format._read_array_header(f, version)
    except AttributeError:  # private API moved — mmap the header instead
        shape = np.load(path, mmap_mode="r").shape
    dims = [d for d in shape if d != 1]
    return max(dims) if len(dims) == 2 else dims[-1]
