"""Single-video prediction CLI — the reference ``predict_video.py``.

Contract (``predict_video.py:145-188``): ``-c`` config + ``-m`` checkpoint,
then either ``-v`` a raw video or ``-f`` precomputed ``.npy`` features;
``--ext_type`` frame sampling (``uni_12`` etc.); ``--greedy`` or ``--beam N``
(works here — the reference stubs it, ``predict_video.py:170``);
``--vis_attn`` renders the decoder cross-attention heatmap.

The raw-video path runs entirely in-process: host decode + sampling
(``vct_tpu.clip.frames``) feeding the jitted Flax CLIP ViT-B/32 tower — no
``video_features`` submodule, no subprocess. CLIP weights come from
``--clip_weights`` (OpenAI ``.pt`` state_dict, HF ``.bin``, or ``.npz``).
"""

from __future__ import annotations

import argparse

import numpy as np

from vct_tpu.cli.common import (
    add_device_args,
    configure_hardware,
    load_checkpoint_into,
    load_config,
    load_feature_files,
    make_trainer_pieces,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Caption a single video")
    p.add_argument("-c", "--config", required=True, type=str,
                   help="The path of '.json' config file")
    p.add_argument("-m", "--model", required=True, type=str,
                   help="The path of model checkpoint (.pth or orbax dir)")
    inp = p.add_mutually_exclusive_group(required=True)
    inp.add_argument("-v", "--video", type=str, help="The path of input video")
    inp.add_argument("-f", "--features", nargs="+", type=str,
                     help="The paths of input features of a video (.npy, (T, E))")
    p.add_argument("--feat_type", nargs="+", type=str,
                   choices=["CLIP", "I3D", "CLIP4CLIP-ViT-B-32"],
                   default=["CLIP4CLIP-ViT-B-32"],
                   help="feature extractor for -v (reference predict_video.py:157): "
                        "CLIP* = ViT-B/32 image tower (T, 512); I3D = Kinetics "
                        "InceptionI3d RGB (n_stacks, 1024)")
    p.add_argument("--ext_type", type=str, default="uni_12",
                   help="frame sampling: [type]_[param], e.g. uni_12 fps_2 fix_20 tsn_12 "
                        "(I3D ignores this: 64-frame stacks at stride 64)")
    p.add_argument("--clip_weights", type=str, default=None,
                   help="CLIP ViT-B/32 weights for -v (OpenAI .pt / HF .bin / .npz)")
    p.add_argument("--i3d_weights", type=str, default=None,
                   help="Kinetics I3D RGB weights for -v with --feat_type I3D")
    p.add_argument("--i3d_stream", choices=["rgb", "flow", "both"],
                   default="rgb",
                   help="I3D stream(s): rgb (default), flow (host-side "
                        "optical flow into the flow tower; estimator note in "
                        "vct_tpu/i3d/flow.py), or both (two modalities)")
    p.add_argument("--i3d_flow_weights", type=str, default=None,
                   help="Kinetics I3D FLOW weights (--i3d_stream flow/both)")
    gen = p.add_mutually_exclusive_group()
    gen.add_argument("--greedy", action="store_true", help="greedy decode (default)")
    gen.add_argument("--beam", type=int, help="beam search decode")
    p.add_argument("--vis_attn", action="store_true",
                   help="save decoder cross-attention heatmap to attn.png")
    p.add_argument("--attn_out", type=str, default="attn.png")
    add_device_args(p)
    return p


def load_clip_params(clip_weights: str):
    from vct_tpu.clip.convert import convert_clip, load_clip_state_dict

    if clip_weights is None:
        raise SystemExit("-v needs --clip_weights (CLIP ViT-B/32 state dict); "
                         "or precompute features and use -f")
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        jnp.asarray, convert_clip(load_clip_state_dict(clip_weights))
    )


def _order_i3d_streams(streams, modal_names, log=print):
    """Align ``--i3d_stream both`` with the checkpoint's modality order.

    Both I3D streams are dim-1024, so the shape check cannot catch a
    swapped order (it would silently feed RGB features into the flow slot).
    When the config's modal names say which slot is which ('flow' / 'rgb'
    substrings), follow them; otherwise state the positional [rgb, flow]
    assumption out loud."""
    if len(streams) != 2:
        return streams
    names = [str(m).lower() for m in modal_names]
    flow_slots = [i for i, m in enumerate(names) if "flow" in m]
    rgb_slots = [i for i, m in enumerate(names) if "rgb" in m or m == "i3d"]
    # one identifiable slot pins the other, so one-sided evidence (e.g.
    # modal=['flow', 'motion'] or ['motion', 'rgb']) is enough to order by
    flow_idx = None
    if len(flow_slots) == 1 and flow_slots[0] not in rgb_slots:
        flow_idx = flow_slots[0]
    elif not flow_slots and len(rgb_slots) == 1:
        flow_idx = 1 - rgb_slots[0]
    if flow_idx == 0:
        log(f"modal names put flow first: feeding streams as ['flow', 'rgb'] "
            f"to match {list(modal_names)}")
        return ["flow", "rgb"]
    if flow_idx is None:
        log(f"WARNING: cannot tell which of modal={list(modal_names)} is the "
            "flow slot (both streams are dim 1024); assuming the training "
            "order was [rgb, flow]")
    return streams


def predict(cfg, args, log=print) -> str:
    """Programmatic entry (reference ``predict``, ``predict_video.py:110-142``).
    Returns the caption string; attention maps at ``predict.attn`` when
    ``args.vis_attn``."""
    import jax.numpy as jnp

    from vct_tpu.decode import detokenize_batch as detokenize_list
    from vct_tpu.decode import (
        make_auto_beam_fn,
        make_auto_greedy_fn,
        make_greedy_fn,
    )

    model, tokenizer, variables = make_trainer_pieces(cfg)
    variables = load_checkpoint_into(variables, args.model, log=log, cfg=cfg)

    feats = None
    if args.video and args.feat_type[0] == "I3D":
        # I3D arm (reference --feat_type I3D, predict_video.py:157): stacks
        # are variable-count per video, so features are computed by the jitted
        # I3D tower first and the caption rides the normal features path.
        from vct_tpu.i3d import (
            FEATURE_DIM,
            I3DTower,
            convert_i3d,
            i3d_stacks,
            load_i3d_state_dict,
            preprocess_i3d_flow,
            preprocess_i3d_frames,
        )

        streams = (["rgb", "flow"] if args.i3d_stream == "both"
                   else [args.i3d_stream])
        if "rgb" in streams and args.i3d_weights is None:
            raise SystemExit("-v with --feat_type I3D needs --i3d_weights")
        if "flow" in streams and args.i3d_flow_weights is None:
            raise SystemExit(f"--i3d_stream {args.i3d_stream} needs "
                             "--i3d_flow_weights")
        if (len(cfg.model.modal) != len(streams)
                or any(d != FEATURE_DIM for d in cfg.model.modal_shape)):
            raise SystemExit(
                f"I3D streams {streams} produce {len(streams)} modalit"
                f"{'y' if len(streams) == 1 else 'ies'} of dim {FEATURE_DIM}; "
                f"config has modal={cfg.model.modal} "
                f"modal_shape={cfg.model.modal_shape}"
            )
        streams = _order_i3d_streams(streams, cfg.model.modal, log)
        import jax

        from vct_tpu.clip import sample_frames

        tower = I3DTower()
        jitted = jax.jit(lambda p, clips: tower.apply({"params": p}, clips))
        frames = sample_frames(args.video, "fix_1")
        feats = []
        weights = {"rgb": args.i3d_weights, "flow": args.i3d_flow_weights}
        # degenerate 1-frame videos are handled inside the preprocessors
        # (flow_from_cropped duplicates the frame; i3d_stacks loops frames)
        prep = {"rgb": preprocess_i3d_frames, "flow": preprocess_i3d_flow}
        for stream in streams:
            params = jax.tree_util.tree_map(
                jnp.asarray, convert_i3d(load_i3d_state_dict(weights[stream])))
            clips = i3d_stacks(prep[stream](frames))
            stacked = np.concatenate(
                [np.asarray(jitted(params, clips[i:i + 1]))
                 for i in range(len(clips))])
            feats.append(stacked[None].astype(np.float32))  # [1, n, 1024]
    elif args.video:
        # fused pixels->caption: CLIP tower + captioner in ONE jitted program
        import jax
        import jax.numpy as jnp

        from vct_tpu.clip import CLIPVisionTower, preprocess_frames, sample_frames
        from vct_tpu.pipeline import make_video_caption_fn

        beam = getattr(args, "beam", None)
        if beam and args.vis_attn:
            raise SystemExit("--vis_attn requires --greedy (per-step attention)")
        tower_dim = 512  # CLIP ViT-B/32 joint-space dim
        if len(cfg.model.modal) != 1 or cfg.model.modal_shape[0] != tower_dim:
            raise SystemExit(
                f"-v produces one CLIP modality of dim {tower_dim}; config has "
                f"modal={cfg.model.modal} modal_shape={cfg.model.modal_shape}"
            )
        clip_params = load_clip_params(args.clip_weights)
        frames = sample_frames(args.video, args.ext_type)
        pixels = jnp.asarray(preprocess_frames(frames))[None]
        fn = make_video_caption_fn(
            model, CLIPVisionTower(), max_len=cfg.test.max_length,
            start_id=tokenizer.start_id, end_id=tokenizer.end_id,
            collect_attn=bool(args.vis_attn), beam_size=int(beam or 0),
        )
        tokens, aux = fn(variables, clip_params, pixels)
        caption = detokenize_list(tokenizer, tokens)[0]
        attn = None if beam else aux
        predict.attn = np.asarray(attn) if (args.vis_attn and attn is not None) else None
        predict.tokens = np.asarray(tokens)[0]
        return caption
    if feats is None:
        feats, _ = load_feature_files(args.features)
    if len(feats) != len(cfg.model.modal):
        raise SystemExit(f"config expects {len(cfg.model.modal)} modalities, "
                         f"got {len(feats)} feature inputs")
    masks = [np.zeros(f.shape[:2], bool) for f in feats]

    collect_attn = bool(args.vis_attn)
    beam = getattr(args, "beam", None)
    if beam:
        if collect_attn:
            raise SystemExit("--vis_attn requires --greedy (per-step attention)")
        # auto dispatch: fused beam kernels on TPU when eligible, module
        # graph elsewhere — same path as eval/serving
        fn = make_auto_beam_fn(model, cfg.test.max_length,
                               tokenizer.start_id, tokenizer.end_id, beam)
    elif collect_attn:
        # attention capture needs the module graph (per-step weights)
        fn = make_greedy_fn(model, cfg.test.max_length,
                            tokenizer.start_id, tokenizer.end_id,
                            collect_attn=True)
    else:
        # B=1 rides the whole-step fused kernel on TPU (p50 ~35 ms)
        fn = make_auto_greedy_fn(model, cfg.test.max_length,
                                 tokenizer.start_id, tokenizer.end_id)

    out = fn(variables, [jnp.asarray(f) for f in feats], [jnp.asarray(m) for m in masks])
    tokens, attn = out[0], (out[1] if len(out) > 1 else None)
    caption = detokenize_list(tokenizer, tokens)[0]
    predict.attn = np.asarray(attn) if (collect_attn and attn is not None) else None
    predict.tokens = np.asarray(tokens)[0]
    return caption


def visualize_attention(attn: np.ndarray, tokens, tokenizer, out_path: str,
                        feat_lens=None) -> None:
    """Mean cross-attention heatmap (reference ``visualize``,
    ``predict_video.py:82-107``): generated tokens x memory positions,
    averaged over layers and heads."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # attn: [steps, layers, B, H, 1, Tk] or [layers, B, H, S, Tk] — normalize
    a = np.asarray(attn, np.float32)
    a = a.reshape(a.shape[0], -1, a.shape[-1]).mean(axis=1)  # [steps, Tk]

    words = tokenizer.convert_ids_to_tokens(tokens[1:len(a) + 1])
    end = next((i for i, w in enumerate(words) if w == "[SEP]"), len(words))
    a, words = a[:end], words[:end]

    fig, ax = plt.subplots(figsize=(max(6, a.shape[1] * 0.5), max(4, len(words) * 0.4)))
    im = ax.imshow(a, aspect="auto", cmap="viridis")
    ax.set_yticks(range(len(words)), words)
    ax.set_xlabel("memory position (global + frames)")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    configure_hardware(args)

    from vct_tpu.text.tokenizer import make_tokenizer
    from vct_tpu.utils import setup_seed

    cfg = load_config(args.config)
    setup_seed(cfg.tpu.seed)

    caption = predict(cfg, args)
    print(f"caption: {caption}")

    if args.vis_attn and predict.attn is not None:
        tokenizer = make_tokenizer(cfg.tpu.vocab_path, cfg.model.tokenizer)
        visualize_attention(predict.attn, predict.tokens, tokenizer, args.attn_out)
        print(f"attention heatmap saved to {args.attn_out}")


if __name__ == "__main__":
    main()
