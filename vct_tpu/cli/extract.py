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
                   help="frame sampling: [type]_[param] (uni_12 fps_2 fix_20 tsn_12); "
                        "I3D ignores this and uses 64-frame stacks at stride 64")
    p.add_argument("--feat_type", type=str, default="CLIP4CLIP-ViT-B-32",
                   choices=["CLIP", "CLIP4CLIP-ViT-B-32", "I3D"],
                   help="feature extractor (reference predict_video.py:157); "
                        "CLIP* -> (T, 512) frame features, I3D -> (n_stacks, 1024)")
    p.add_argument("--clip_weights", type=str, default=None,
                   help="CLIP ViT-B/32 weights (OpenAI .pt / HF .bin / .npz)")
    p.add_argument("--i3d_stream", choices=["rgb", "flow", "both"],
                   default="rgb",
                   help="I3D stream: rgb (default), flow (host-side optical "
                        "flow into the flow tower; estimator note in "
                        "vct_tpu/i3d/flow.py), or both — one pass writing "
                        "RGB features to --out and flow features to "
                        "--out_flow, decoding and cropping each video once "
                        "instead of twice.")
    p.add_argument("--i3d_weights", type=str, default=None,
                   help="Kinetics I3D weights for --feat_type I3D, matching "
                        "--i3d_stream (RGB weights for rgb/both, flow weights "
                        "for flow; torch InceptionI3d state dict .pt/.pth or "
                        ".npz)")
    p.add_argument("--i3d_flow_weights", type=str, default=None,
                   help="Kinetics I3D FLOW weights (--i3d_stream both)")
    p.add_argument("--out_flow", type=str, default=None,
                   help="output .npy directory for the flow features with "
                        "--i3d_stream both (RGB goes to --out)")
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
    both = args.feat_type == "I3D" and args.i3d_stream == "both"
    out_flow_dir = None
    if both:
        if args.out_flow is None:
            raise SystemExit("--i3d_stream both needs --out_flow "
                             "(flow .npy dir; RGB features go to --out)")
        out_flow_dir = pathlib.Path(args.out_flow)
        out_flow_dir.mkdir(parents=True, exist_ok=True)

    if args.feat_type == "I3D":
        video_feats = _make_i3d_encoder(args)
    else:
        clip_params = load_clip_params(args.clip_weights)
        tower = CLIPVisionTower()
        # one compiled shape (frame batch padded to batch_frames); params stay
        # a runtime argument so they are not baked into the program as constants
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

        def video_feats(vp: pathlib.Path) -> np.ndarray:
            frames = sample_frames(str(vp), args.ext_type)
            return encode_frames(preprocess_frames(frames))

    vids = list_videos(args.videos)
    done = skipped = 0
    for vp in vids:
        out_paths = [out_dir / f"{vp.stem}.npy"]
        if both:
            out_paths.append(out_flow_dir / f"{vp.stem}.npy")
        # per-file skip: without --overwrite an existing output is never
        # rewritten, even when its sibling stream is missing and the video
        # has to be recomputed
        targets = (out_paths if args.overwrite
                   else [p for p in out_paths if not p.exists()])
        if not targets:
            skipped += 1
            continue
        feats = video_feats(vp) if both else [video_feats(vp)]
        for out_path, f in zip(out_paths, feats):
            if out_path not in targets:
                continue
            np.save(out_path, f.astype(np.float32))
            print(f"{vp.name}: {f.shape} -> {out_path}")
        done += 1
    dirs = f"{out_dir} + {out_flow_dir}" if both else f"{out_dir}"
    print(f"extracted {done} videos ({skipped} skipped) to {dirs}")


def _make_i3d_encoder(args):
    """Per-video I3D features: decode ALL frames, 64-frame stacks at stride
    64 (the video_features I3D recipe the reference delegates to), jitted
    Flax tower, one (n_stacks, 1024) array per video."""
    import jax
    import jax.numpy as jnp

    from vct_tpu.clip import sample_frames
    from vct_tpu.i3d import (
        I3DTower,
        convert_i3d,
        i3d_stacks,
        load_i3d_state_dict,
        preprocess_i3d_flow,
        preprocess_i3d_frames,
    )

    if args.i3d_weights is None:
        what = "RGB" if args.i3d_stream == "both" else args.i3d_stream.upper()
        raise SystemExit(f"--feat_type I3D needs --i3d_weights "
                         f"(Kinetics InceptionI3d {what} state dict)")
    tower = I3DTower()
    jitted = jax.jit(lambda p, clips: tower.apply({"params": p}, clips))

    def load(path):
        return jax.tree_util.tree_map(
            jnp.asarray, convert_i3d(load_i3d_state_dict(path)))

    def tower_feats(params, x) -> np.ndarray:
        clips = i3d_stacks(x)
        # one clip per launch: stack counts vary per video and padding a
        # [n, 64, 224, 224, 3] batch would recompile per shape anyway
        return np.concatenate([np.asarray(jitted(params, clips[i:i + 1]))
                               for i in range(len(clips))])

    if args.i3d_stream == "both":
        # one pass: decode + geometric transform ONCE per video, then both
        # towers. Bit-identical to two single-stream runs — the shared crop
        # is exactly what preprocess_i3d_frames/_flow each start from, and
        # the scaling/flow formulas are the same shared helpers.
        if args.i3d_flow_weights is None:
            raise SystemExit("--i3d_stream both needs --i3d_flow_weights "
                             "(Kinetics InceptionI3d FLOW state dict)")
        from vct_tpu.i3d import flow_from_cropped, resize_center_crop, scale_i3d_frames

        params_rgb, params_flow = load(args.i3d_weights), load(args.i3d_flow_weights)

        def video_feats(vp):
            frames = sample_frames(str(vp), "fix_1")  # every frame
            cropped = resize_center_crop(frames)
            return (tower_feats(params_rgb, scale_i3d_frames(cropped)),
                    tower_feats(params_flow, flow_from_cropped(cropped)))

        return video_feats

    params = load(args.i3d_weights)
    prep = (preprocess_i3d_flow if args.i3d_stream == "flow"
            else preprocess_i3d_frames)

    def video_feats(vp) -> np.ndarray:
        # degenerate 1-frame videos are handled inside the preprocessors
        # (flow_from_cropped duplicates the frame; i3d_stacks loops frames)
        return tower_feats(params, prep(sample_frames(str(vp), "fix_1")))

    return video_feats


if __name__ == "__main__":
    main()
