"""One-command BASELINE.md parity reproduction (round-3 VERDICT item #4).

The published bar (``/root/reference/README.md:50-53``): MSVD test split
Bleu_4 58.0 / METEOR 39.9 / ROUGE_L 77.0 / CIDEr 113.8 from the released
checkpoint; MSRVTT 48.1 / 31.1 / 65.1 / 60.2. Neither the datasets nor the
released ``.pth`` files exist in this environment, so this script has two
modes:

``real``  — the day the assets exist, this is the ONE command:

    python tools/repro_parity.py real \
        --ckpt /path/to/msvd_released.pth \
        --data_root /path/to/assets \
        --baseline msvd

  It loads ``configs/<baseline>.json``, re-roots every relative data path
  (feat dirs, annotation files, vocab) under ``--data_root``, then runs the
  full chain the reference runs (``/root/reference/eval.py:145-191``):
  ``.pth`` conversion (Appendix-B key map, ``vct_tpu/convert.py``) ->
  by_video fused decode -> COCOScorer -> ``--baseline`` diff, and writes
  ``parity_metrics.json`` + ``parity_predictions.json`` next to the ckpt.

  Expected asset layout under ``--data_root`` (matching configs/msvd.json's
  relative paths — override with ``--config`` for a custom layout)::

      data/msvd_clip4clip_feats/val/*.npy   per-video CLIP4Clip features
      data/msvd-annotations/val.txt         "<vid> <caption>" lines
      data/bert-base-uncased-vocab.txt      WordPiece vocab

``rehearse`` — executable today: builds a small synthetic MSVD-style split,
  then drives the IDENTICAL CLI chain end-to-end as real subprocesses —
  ``vct_tpu.cli.train`` (fresh) -> ``--resume auto`` (extended epochs) ->
  ``vct_tpu.cli.eval -m <ckpt> --baseline msvd`` — proving every link the
  real run needs (config load, training, earlystop state, orbax resume,
  checkpoint load, decode, scoring, baseline diff) works before the assets
  arrive. The metric *values* against synthetic captions are meaningless;
  the exit code asserts only that the chain produced them.

    python tools/repro_parity.py rehearse [--cpu] [--workdir DIR]

Run from anywhere; subprocesses get the repo root on PYTHONPATH.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# real mode
# ---------------------------------------------------------------------------

def reroot_config(cfg: dict, data_root: str) -> dict:
    """Rewrite every relative data path in a raw config dict to live under
    ``data_root`` (absolute paths pass through). Pure function — pinned by
    tests/test_cli.py."""

    def join(p: str) -> str:
        return p if os.path.isabs(p) else os.path.normpath(
            os.path.join(data_root, p))

    out = json.loads(json.dumps(cfg))  # deep copy
    for split in out.get("data", {}).values():
        if "feat_dir" in split:
            split["feat_dir"] = [join(p) for p in split["feat_dir"]]
        if "annotation_path" in split:
            split["annotation_path"] = join(split["annotation_path"])
    tpu = out.get("tpu", {})
    if "vocab_path" in tpu:
        tpu["vocab_path"] = join(tpu["vocab_path"])
    return out


def run_real(args) -> int:
    cfg_path = args.config or str(REPO / "configs" / f"{args.baseline}.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    raw = reroot_config(raw, args.data_root)
    ckpt = os.path.abspath(args.ckpt)
    outdir = pathlib.Path(args.out_dir or os.path.dirname(ckpt) or ".")
    outdir.mkdir(parents=True, exist_ok=True)
    resolved = outdir / f"parity_config_{args.baseline}.json"
    with open(resolved, "w") as f:
        json.dump(raw, f, indent=2)
    print(f"resolved config -> {resolved}")

    from vct_tpu.cli import eval as eval_cli

    argv = ["-c", str(resolved), "-m", ckpt,
            "--baseline", args.baseline,
            "--out", str(outdir / "parity_predictions.json"),
            "--metrics_out", str(outdir / "parity_metrics.json")]
    if args.beam:
        argv += ["--beam", str(args.beam)]
    if args.cpu:
        argv += ["--cpu"]
    eval_cli.main(argv)
    print(f"\nparity artifacts in {outdir}: parity_metrics.json (x1 scale), "
          f"parity_predictions.json")
    return 0


# ---------------------------------------------------------------------------
# rehearse mode
# ---------------------------------------------------------------------------

N_VID, T, E_FEAT = 8, 5, 16


def _make_synthetic_assets(root: pathlib.Path) -> None:
    import numpy as np

    feat = root / "feats"
    feat.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    lines = []
    for i in range(N_VID):
        np.save(feat / f"vid{i}.npy",
                rng.standard_normal((T, E_FEAT)).astype(np.float32))
        for j in range(3):
            lines.append(f"vid{i} a person does action {i} variant {j}")
    (root / "ann.txt").write_text("\n".join(lines))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "person", "does", "action", "variant"]
    vocab += [str(i) for i in range(8)]
    (root / "vocab.txt").write_text("\n".join(vocab))


def _rehearse_config(root: pathlib.Path, epochs: int) -> dict:
    split = {"feat_dir": [str(root / "feats")],
             "annotation_path": str(root / "ann.txt"),
             "dataset": "msvd", "mode": "by_caption",
             "split_mode": "train", "batch_size": 4}
    eval_split = dict(split, mode="by_video", split_mode="validate",
                      batch_size=4)
    return {
        "data": {"train": split, "validation": dict(split),
                 "eval": eval_split},
        "train": {
            "task": "caption",
            "optimizer": {"name": "adam", "learning_rate": 1e-3,
                          "beta": [0.9, 0.999],
                          "lr_scheduler": {"name": "CosineAnnealingLR",
                                           "T_max": 8, "eta_min": 1e-5}},
            "earlystop": 10, "epoch": epochs, "save_frequency": 100,
            "save_dir": str(root / "ckpt"), "log_dir": str(root / "log"),
            "tag": "rehearse", "metric_earlystop": True,
        },
        "test": {"max_length": 12},
        "model": {
            "modal": ["CLIP4Clip"], "modal_shape": [E_FEAT],
            "tokenizer": "bert-base-uncased", "text_enc_type": "CLIP",
            "embed_dim": 32, "dropout": 0.1, "loss_beta": 0.5,
            "matching": {"enable_tem": False, "matching_loss": "CSL"},
            "activation": "gelu",
            "video_encoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                              "mme": {"temporal": "encoding",
                                      "modal_different": True,
                                      "do_norm": False,
                                      "aggregation": "avg"}},
            "caption_decoder": {"layer": 1, "nhead": 2, "feedforward": 64,
                                "sce_loss_alpha": 0.5},
        },
        "tpu": {"max_frames": T, "max_caption_len": 12, "dtype": "float32",
                "mesh_data": 1, "vocab_path": str(root / "vocab.txt")},
    }


def _cli(module: str, *argv: str, cpu: bool) -> None:
    cmd = [sys.executable, "-m", module, *argv] + (["--cpu"] if cpu else [])
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    print(f"$ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=str(REPO))


def run_rehearse(args) -> int:
    root = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="vct_parity_"))
    root.mkdir(parents=True, exist_ok=True)
    print(f"rehearsal workspace: {root}")
    _make_synthetic_assets(root)

    cfg_path = root / "cfg.json"

    # leg 1: fresh training run (2 epochs), periodic _latest saves
    cfg_path.write_text(json.dumps(_rehearse_config(root, epochs=2)))
    _cli("vct_tpu.cli.train", "-c", str(cfg_path), "--no_tensorboard",
         cpu=args.cpu)

    # leg 2: extend to 3 epochs and resume from <save_dir>/<tag>_latest —
    # exercises orbax restore incl. optimizer/epoch/earlystop state
    cfg_path.write_text(json.dumps(_rehearse_config(root, epochs=3)))
    _cli("vct_tpu.cli.train", "-c", str(cfg_path), "--no_tensorboard",
         "--resume", "auto", cpu=args.cpu)

    # leg 3: the exact parity command `real` mode issues, against the
    # resumed checkpoint
    ckpt = root / "ckpt" / "rehearse_latest"
    assert ckpt.exists(), f"resume leg did not leave {ckpt}"
    metrics = root / "metrics.json"
    _cli("vct_tpu.cli.eval", "-c", str(cfg_path), "-m", str(ckpt),
         "--baseline", "msvd", "--metrics_out", str(metrics), cpu=args.cpu)

    scores = json.loads(metrics.read_text())
    for k in ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in scores, f"scorer output missing {k}: {scores}"
    print(f"\nREHEARSAL PASS — train -> resume -> eval -> baseline-diff all "
          f"ran; metrics at {metrics}")
    print("(values are synthetic-split noise; only the chain is under test)")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="mode", required=True)

    pr = sub.add_parser("real", help="reproduce BASELINE.md on real assets")
    pr.add_argument("--ckpt", required=True,
                    help="released reference .pth (or an orbax dir)")
    pr.add_argument("--data_root", required=True,
                    help="directory the config's relative data paths resolve "
                         "under")
    pr.add_argument("--baseline", choices=["msvd", "msrvtt"], default="msvd")
    pr.add_argument("--config", default=None,
                    help="config JSON (default configs/<baseline>.json)")
    pr.add_argument("--beam", type=int, default=0)
    pr.add_argument("--out_dir", default=None)
    pr.add_argument("--cpu", action="store_true")
    pr.set_defaults(fn=run_real)

    ph = sub.add_parser("rehearse",
                        help="drive the identical CLI chain on synthetic "
                             "assets")
    ph.add_argument("--workdir", default=None)
    ph.add_argument("--cpu", action="store_true")
    ph.set_defaults(fn=run_rehearse)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
