"""Evaluation CLI — the reference ``eval.py`` entry point.

Contract (``eval.py:171-191``): ``-c`` config + ``-m`` checkpoint, decode the
eval split, score Bleu1-4 / METEOR / ROUGE_L / CIDEr. Differences by design:

* decoding is one jitted KV-cached program over the whole batch — not the
  reference's batch-size-1 full-prefix re-runs (``eval.py:154``,
  ``CapDecoder.py:62-79``),
* ``--beam N`` works (the reference declares it "not support yet"),
* checkpoints may be reference ``.pth`` (converted on load) or orbax dirs.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict

from vct_tpu.cli.common import (
    add_device_args,
    configure_hardware,
    load_checkpoint_into,
    load_config,
    make_trainer_pieces,
    print_scores,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate a checkpoint on the eval split")
    p.add_argument("-c", "--config", required=True, type=str,
                   help="The path of '.json' config file")
    p.add_argument("-m", "--model", required=True, type=str,
                   help="checkpoint: reference .pth or orbax dir")
    p.add_argument("--beam", type=int, default=0,
                   help="beam size (0 = greedy, the reference's only mode)")
    p.add_argument("--out", type=str, default=None,
                   help="write {vid: caption} predictions JSON here")
    p.add_argument("--metrics_out", type=str, default=None,
                   help="write the metric dict as JSON here (for harnesses)")
    p.add_argument("--per_video", action="store_true",
                   help="also print per-video scores (reference COCOScorer keeps them)")
    add_device_args(p)
    return p


def evaluate(cfg, ckpt_path: str, beam: int = 0, log=print) -> Dict[str, float]:
    """Programmatic entry (reference ``evaluate``, ``eval.py:145-168``).
    Returns the metric dict; predictions at ``evaluate.predictions``."""
    import jax.numpy as jnp

    from vct_tpu.data.loader import build_dataloader
    from vct_tpu.decode import (
        detokenize_batch,
        make_auto_greedy_fn,
        make_beam_fn,
        pipelined_map,
    )
    from vct_tpu.evalcap.scorer import COCOScorer, make_coco_sample

    model, tokenizer, variables = make_trainer_pieces(cfg)
    variables = load_checkpoint_into(variables, ckpt_path, log=log, cfg=cfg)

    ds, loader = build_dataloader(cfg.data.eval, cfg.tpu)
    if beam > 0:
        decode_fn = make_beam_fn(model, cfg.test.max_length,
                                 tokenizer.start_id, tokenizer.end_id, beam)
    else:
        decode_fn = make_auto_greedy_fn(model, cfg.test.max_length,
                                        tokenizer.start_id, tokenizer.end_id)

    def _launch(batch):
        feats = [jnp.asarray(f) for f in batch.feats]
        masks = [jnp.asarray(m) for m in batch.masks]
        return decode_fn(variables, feats, masks)[0]

    vid2result: Dict[str, str] = {}
    for batch, tokens in pipelined_map(_launch, loader):
        caps = detokenize_batch(tokenizer, tokens)
        for vid, cap in list(zip(batch.vids, caps))[: batch.n_valid]:
            vid2result[vid] = cap

    gts, samples, ids = make_coco_sample(vid2result, ds.video2caption)
    scorer = COCOScorer(verbose=False)
    scores = dict(scorer.score(gts, samples, ids))
    evaluate.predictions = vid2result
    evaluate.per_video = scorer.imgToEval
    return scores


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    configure_hardware(args)

    from vct_tpu.utils import setup_seed

    cfg = load_config(args.config)
    setup_seed(cfg.tpu.seed)

    scores = evaluate(cfg, args.model, beam=args.beam)
    print_scores(scores)
    if args.per_video:
        print(json.dumps(evaluate.per_video, indent=2, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(evaluate.predictions, f, indent=2, ensure_ascii=False)
        print(f"wrote predictions to {args.out}")
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            json.dump({k: float(v) for k, v in scores.items()}, f, indent=2)
        print(f"wrote metrics to {args.metrics_out}")


if __name__ == "__main__":
    main()
