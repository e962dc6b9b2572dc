"""Offline feature extraction CLI — the reference's training-data prep step.

The reference tells users to produce per-video ``.npy`` CLIP features with the
``video_features`` submodule before training (``README.md:94-96``; offline
variant of ``predict_video.py:21-38``). This driver does it in-process: decode
+ sample frames on host, batch them through the jitted Flax CLIP ViT-B/32
tower on TPU, write one ``(T, 512)`` ``.npy`` per video — the exact format
``vct_tpu.data.datasets`` (and the reference dataloader) consume.

    python -m vct_tpu.cli.extract --videos ./raw_vids --out ./feats \
        --ext_type uni_12 --clip_weights ViT-B-32.pt
"""

from __future__ import annotations

import argparse
import pathlib
from typing import List

import numpy as np

from vct_tpu.cli.common import add_device_args, configure_hardware

VIDEO_EXTS = (".mp4", ".avi", ".mkv", ".webm", ".mov", ".mpg", ".mpeg")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Extract CLIP features for a video dir")
    p.add_argument("--videos", required=True, type=str,
                   help="directory of raw videos (or a single video file)")
    p.add_argument("--out", required=True, type=str, help="output .npy directory")
    p.add_argument("--ext_type", type=str, default="uni_12",
                   help="frame sampling: [type]_[param] (uni_12 fps_2 fix_20 tsn_12)")
    p.add_argument("--clip_weights", required=True, type=str,
                   help="CLIP ViT-B/32 weights (OpenAI .pt / HF .bin / .npz)")
    p.add_argument("--batch_frames", type=int, default=256,
                   help="frames per device batch (videos are packed together)")
    p.add_argument("--overwrite", action="store_true")
    add_device_args(p)
    return p


def list_videos(path: str) -> List[pathlib.Path]:
    p = pathlib.Path(path)
    if p.is_file():
        return [p]
    vids = sorted(q for q in p.iterdir() if q.suffix.lower() in VIDEO_EXTS)
    if not vids:
        raise SystemExit(f"no videos under {path!r} (looked for {VIDEO_EXTS})")
    stems = {}
    for v in vids:
        if v.stem in stems:
            raise SystemExit(
                f"output collision: {stems[v.stem].name} and {v.name} would both "
                f"write {v.stem}.npy — rename one"
            )
        stems[v.stem] = v
    return vids


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    configure_hardware(args)

    import jax
    import jax.numpy as jnp

    from vct_tpu.cli.predict import load_clip_params
    from vct_tpu.clip import CLIPVisionTower, preprocess_frames, sample_frames

    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    clip_params = load_clip_params(args.clip_weights)
    tower = CLIPVisionTower()
    # one compiled shape (frame batch padded to batch_frames); params stay a
    # runtime argument so they are not baked into the program as constants
    jitted = jax.jit(lambda params, px: tower.apply({"params": params}, px))
    apply = lambda px: jitted(clip_params, px)  # noqa: E731

    def encode_frames(pixels: np.ndarray) -> np.ndarray:
        n = len(pixels)
        feats = []
        for start in range(0, n, args.batch_frames):
            chunk = pixels[start : start + args.batch_frames]
            pad = args.batch_frames - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                        chunk.dtype)])
            feats.append(np.asarray(apply(jnp.asarray(chunk)))[: min(args.batch_frames, n - start)])
        return np.concatenate(feats)

    vids = list_videos(args.videos)
    done = skipped = 0
    for vp in vids:
        out_path = out_dir / f"{vp.stem}.npy"
        if out_path.exists() and not args.overwrite:
            skipped += 1
            continue
        frames = sample_frames(str(vp), args.ext_type)
        feats = encode_frames(preprocess_frames(frames))
        np.save(out_path, feats.astype(np.float32))
        done += 1
        print(f"{vp.name}: {feats.shape} -> {out_path}")
    print(f"extracted {done} videos ({skipped} skipped) to {out_dir}")


if __name__ == "__main__":
    main()
