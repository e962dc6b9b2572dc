"""Training orchestration — the re-design of ``/root/reference/train.py``.

Epoch structure mirrors ``mmt4caption_train`` (``train.py:208-289``):
train epoch -> scheduler step -> validation losses -> caption-metric eval ->
sample prediction -> TB logging -> metric/loss earlystop -> periodic save.

TPU re-design notes:
* the train step is one jitted GSPMD program over the ('data','model') mesh —
  no DDP wrapper, no rank bookkeeping, no barriers (``train.py:218,246-256``
  all disappear),
* eval decoding runs the jitted KV-cached greedy decoder over the *whole*
  mesh instead of the reference's rank-0-only decode bottleneck
  (``train.py:248-249``, SURVEY.md §5),
* checkpoints are full resumable train states (orbax) rather than bare
  state_dicts; ``Trainer.resume`` continues mid-run (capability the reference
  lacks),
* tokenization/text-encoding happen in the input pipeline, not inside the
  step (``MMT4Caption.py:118`` moved host-side).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.config import Config
from vct_tpu.convert import convert_state_dict, load_torch_state_dict
from vct_tpu.data.loader import DataLoader, build_dataloader
from vct_tpu.decode import (
    detokenize_batch,
    pipelined_map,
)
from vct_tpu.evalcap.scorer import COCOScorer, make_coco_sample
from vct_tpu.models.mmt4caption import MMT4Caption, text_encoder_dim
from vct_tpu.parallel.mesh import make_mesh, shard_batch_arrays, shard_train_state
from vct_tpu.text.tokenizer import CaptionPreprocessor, make_tokenizer
from vct_tpu.train.earlystop import EarlyStopping
from vct_tpu.train.optimizers import (
    build_optimizer,
    build_scheduler,
    set_learning_rate,
)
from vct_tpu.train.state import (
    make_train_state,
    restore_checkpoint,
    save_checkpoint,
)
from vct_tpu.train.step import (
    batch_to_arrays,
    combine_eval_parts,
    make_eval_step,
    make_train_step,
)

METRIC_KEYS = ("Bleu_4", "METEOR", "ROUGE_L", "CIDEr")  # earlystop sum (train.py:267)


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]


class Trainer:
    def __init__(
        self,
        cfg: Config,
        *,
        tokenizer=None,
        text_encoder: Optional[Callable[[List[str]], np.ndarray]] = None,
        mesh=None,
        writer=None,
        log: Callable[[str], None] = print,
    ):
        self.cfg = cfg
        self.log = log
        self.task = cfg.train.task
        self.tokenizer = tokenizer or make_tokenizer(cfg.tpu.vocab_path, cfg.model.tokenizer)
        self.preprocessor = CaptionPreprocessor(self.tokenizer, cfg.tpu.max_caption_len)
        self.text_encoder = text_encoder
        if self.task in ("match", "cross") and text_encoder is None:
            if cfg.tpu.clip_text_weights:
                from vct_tpu.clip.text import build_text_encoder

                self.text_encoder = build_text_encoder(
                    cfg.model.text_enc_type,
                    clip_weights=cfg.tpu.clip_text_weights,
                    vocab_json=cfg.tpu.clip_vocab_json,
                    merges_txt=cfg.tpu.clip_merges_txt,
                )
            else:
                raise ValueError(
                    "match/cross tasks need a text_encoder: pass one, or set "
                    "tpu.clip_text_weights/clip_vocab_json/clip_merges_txt"
                )

        import dataclasses

        model_cfg = cfg.model
        if model_cfg.vocab_size != self.tokenizer.vocab_size:
            model_cfg = dataclasses.replace(model_cfg, vocab_size=self.tokenizer.vocab_size)
        if model_cfg.pad_id != self.tokenizer.pad_id:
            # the reference wires pad_id from the tokenizer's [PAD] lookup
            # (model/MMT4Caption.py:38); keep loss masking + decode padding
            # consistent for vocabs where [PAD] is not index 0
            model_cfg = dataclasses.replace(model_cfg, pad_id=self.tokenizer.pad_id)

        # the mesh decides kernel/loss dispatch below, so build it first —
        # an explicitly-passed mesh must behave exactly like the same shape
        # requested through cfg.tpu.mesh_*
        self.mesh = mesh or make_mesh(cfg.tpu.mesh_data, cfg.tpu.mesh_model)
        tp = self.mesh.shape.get("model", 1)
        tpu_cfg = cfg.tpu
        if tp > 1 and tpu_cfg.use_fused_loss:
            # the vocab-chunked fused loss slices the generator kernel, which
            # under vocab-sharded TP would gather the shards back every chunk;
            # the materialized-logits path lets GSPMD keep the [N, V] logits
            # sharded over 'model' and psum only the reductions
            self.log("model-axis > 1: disabling the fused LM-head loss in "
                     "favor of GSPMD vocab-sharded logits")
            tpu_cfg = dataclasses.replace(tpu_cfg, use_fused_loss=False)
        if (self.mesh.size > 1 and tpu_cfg.use_fused_loss
                and tpu_cfg.fused_loss_pallas):
            if tpu_cfg.pallas_partition_kernels:
                # same opt-in as attention: the kernels run unmodified per
                # shard under shard_map over 'data', four psum'd sums out
                # (ops.fused_loss.linear_sce_parts_sharded) — keeps the
                # measured N<=4096/chip win on DP meshes (round-4 VERDICT #4)
                self.log("multi-device mesh: Mosaic loss kernels run under "
                         "shard_map over the 'data' axis")
            else:
                # the Mosaic loss kernels are single-device programs; on a
                # mesh the XLA scans shard freely under GSPMD, so fall back
                self.log("multi-device mesh: fused loss rides the XLA scans "
                         "(Mosaic loss kernels are single-device programs; "
                         "set tpu.pallas_partition_kernels to shard_map them)")
                tpu_cfg = dataclasses.replace(tpu_cfg, fused_loss_pallas=False)
        if tpu_cfg.pallas_partition_kernels:
            # every opted-in Trainer resets the registry to ITS mesh (or
            # clears it on a single-device mesh) so a Trainer built after a
            # multi-device one never inherits a stale mesh at trace time
            from vct_tpu.parallel.mesh import set_kernel_mesh

            set_kernel_mesh(self.mesh if self.mesh.size > 1 else None)
        if self.mesh.size > 1 and tpu_cfg.use_pallas_attention:
            if tpu_cfg.pallas_partition_kernels:
                self.log("multi-device mesh: Pallas attention runs under "
                         "shard_map over the 'data' axis")
            else:
                # Mosaic kernels cannot be auto-partitioned inside a
                # multi-device jit (jax raises at lowering unless the call is
                # shard_map-ped); default to the XLA attention path, which
                # GSPMD shards freely. tpu.pallas_partition_kernels opts into
                # the shard_map-ped kernel instead.
                self.log("multi-device mesh: routing attention through XLA "
                         "(Pallas kernels are single-device programs; set "
                         "tpu.pallas_partition_kernels to shard_map them)")
                tpu_cfg = dataclasses.replace(tpu_cfg, use_pallas_attention=False)
        self.model = MMT4Caption(model_cfg, tpu_cfg, dtype=_dtype(cfg.tpu.dtype))
        self.variables = self._init_variables()
        if cfg.model.caption_decoder.univl:
            # UniVL decoder import before pretrained_model, the reference's
            # load order (train.py:212-216)
            from vct_tpu.convert import import_univl_decoder

            self.variables = import_univl_decoder(
                self.variables, load_torch_state_dict(cfg.model.caption_decoder.univl)
            )
            self.log(f"imported UniVL decoder from {cfg.model.caption_decoder.univl}")
        if cfg.model.pretrained_model:
            self.load_pretrained(cfg.model.pretrained_model)

        self.optimizer = build_optimizer(cfg.train, self.variables["params"])
        self.scheduler = build_scheduler(cfg.train)
        self.state = make_train_state(self.variables, self.optimizer, seed=cfg.tpu.seed)
        self.state = jax.tree_util.tree_map(lambda x: x, self.state)  # materialize
        self.state = shard_train_state(self.mesh, self.state)

        self.train_step = make_train_step(self.model, self.optimizer, self.task)
        self.val_step = make_eval_step(self.model, self.task)
        if cfg.tpu.beam_size > 1:
            from vct_tpu.decode import make_auto_beam_fn

            self.greedy_fn = make_auto_beam_fn(
                self.model, cfg.test.max_length,
                self.tokenizer.start_id, self.tokenizer.end_id,
                cfg.tpu.beam_size, mesh=self.mesh,
            )
        else:
            # eval decoding rides the fused Pallas kernels on TPU: directly
            # on one chip, shard_mapped over 'data' on a multi-device mesh
            # (when the model opted in via tpu.pallas_partition_kernels and
            # the mesh carries no TP); module-graph GSPMD otherwise
            from vct_tpu.decode import make_auto_greedy_fn

            self.greedy_fn = make_auto_greedy_fn(
                self.model, cfg.test.max_length,
                self.tokenizer.start_id, self.tokenizer.end_id,
                mesh=self.mesh,
            )
        self.earlystop = EarlyStopping(patience=cfg.train.earlystop, trace_func=log)
        self.writer = writer
        self.start_epoch = 0

        self.loaders: Dict[str, DataLoader] = {}
        self.datasets: Dict[str, Any] = {}
        for name, split in (
            ("train", cfg.data.train),
            ("validation", cfg.data.validation),
            ("eval", cfg.data.eval),
        ):
            if split is None:
                continue
            prep = self.preprocessor if name != "eval" else None
            ds, loader = build_dataloader(split, cfg.tpu, preprocessor=prep)
            self.datasets[name], self.loaders[name] = ds, loader

    # ------------------------------------------------------------------

    def _init_variables(self):
        cfg = self.cfg
        b = max(self.mesh.shape["data"], 1)
        feats = [
            jnp.zeros((b, cfg.tpu.max_frames, d), jnp.float32)
            for d in cfg.model.modal_shape
        ]
        masks = [jnp.zeros((b, cfg.tpu.max_frames), bool) for _ in cfg.model.modal_shape]
        caps = jnp.zeros((b, cfg.tpu.max_caption_len), jnp.int32)
        # Initialize through the cross path whenever a matching head is
        # configured so every submodule's params exist (reference checkpoints
        # always carry matching.* keys regardless of task; torch modules are
        # built eagerly in MMT4Caption.__init__, MMT4Caption.py:86-91).
        if cfg.model.matching is not None:
            text = jnp.zeros((b, text_encoder_dim(cfg.model.text_enc_type)))
            return self.model.init(
                jax.random.PRNGKey(cfg.tpu.seed), feats, masks, caps, caps == 0, text,
                method=MMT4Caption.cross_loss,
            )
        return self.model.init(
            jax.random.PRNGKey(cfg.tpu.seed), feats, masks, caps, caps == 0,
            method=MMT4Caption.caption_loss,
        )

    def load_pretrained(self, path: str) -> None:
        """Load reference ``.pth`` (via converter) or orbax params."""
        if path.endswith((".pth", ".pt", ".bin")):
            sd = load_torch_state_dict(path)
            self.variables, report = convert_state_dict(self.variables, sd)
            self.log(f"loaded {path}: missing={len(report['missing'])} "
                     f"unexpected={len(report['unexpected'])}")
            from vct_tpu.cli.common import memory_mask_advisory

            advisory = memory_mask_advisory(self.cfg)
            if advisory:
                self.log(advisory)
        else:
            from vct_tpu.train.state import restore_params_only

            self.variables = restore_params_only(path, self.variables)
            self.log(f"loaded orbax params from {path}")

    # ------------------------------------------------------------------

    def _shard(self, arrays):
        return shard_batch_arrays(self.mesh, arrays)

    def _progress(self, loader, desc: str):
        """tqdm over batches when available (reference train.py:119,178)."""
        if not self.cfg.tpu.progress_bar:
            return loader
        try:
            from tqdm import tqdm

            return tqdm(loader, total=len(loader), desc=desc, leave=False)
        except ImportError:
            return loader

    def train_epoch(self, epoch: int) -> float:
        loader = self.loaders["train"]
        loader.set_epoch(epoch)
        # losses stay on device until epoch end: float(loss) every step would
        # block the host on each dispatch and serialize input loading against
        # device compute (JAX dispatch is async; one sync per epoch suffices)
        losses = []
        for batch in self._progress(loader, f"train e{epoch}"):
            arrays = self._shard(batch_to_arrays(batch, self.text_encoder))
            self.state, metrics = self.train_step(self.state, arrays)
            losses.append(metrics["loss"])
        if not losses:
            return 0.0
        # one host sync at epoch end; plain numpy mean (jnp.stack of thousands
        # of scalars would lower a huge concatenate, recompiled per epoch length)
        return float(np.mean(jax.device_get(losses)))

    def val_epoch(self) -> Dict[str, float]:
        """Validation losses. The step returns exact sum/count parts and the
        reduction happens here, so the result is independent of batching and
        collate filler rows contribute nothing (the reference's
        mean-of-batch-means over ragged batches has a small final-batch bias;
        this is the unbiased estimator of the same quantity)."""
        loader = self.loaders.get("validation")
        if loader is None:
            return {}
        variables = {"params": self.state.params, "buffers": self.state.buffers}
        # keep the parts on device and fetch ONCE at the end: a float(v) per
        # batch would pay a synchronous device->host round trip per scalar
        # (~35 ms each on a relay-attached chip) and serialize host batch
        # prep against device compute
        parts_list = []
        for batch in loader:
            arrays = self._shard(batch_to_arrays(batch, self.text_encoder))
            parts_list.append(self.val_step(variables, arrays))
        if not parts_list:
            return {}
        sums: Dict[str, float] = {}
        for parts in jax.device_get(parts_list):
            for k, v in parts.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        return combine_eval_parts(
            self.task, sums,
            sce_alpha=self.cfg.model.caption_decoder.sce_loss_alpha,
            loss_beta=self.cfg.model.loss_beta,
        )

    def eval_epoch(self, verbose: bool = False) -> Dict[str, float]:
        """Greedy-decode the eval split, score with the COCO scorers
        (reference ``eval_epoch``, ``train.py:172-185``)."""
        loader = self.loaders.get("eval")
        if loader is None:
            return {}
        vid2result = self.decode_split(loader)
        gts, samples, ids = make_coco_sample(
            vid2result, self.datasets["eval"].video2caption
        )
        scorer = COCOScorer(verbose=verbose)
        return dict(scorer.score(gts, samples, ids))

    def decode_split(self, loader: DataLoader) -> Dict[str, str]:
        """Decode data-parallel over the whole mesh — every chip decodes its
        batch shard, unlike the reference's rank-0-only eval bottleneck
        (``train.py:248-249``, SURVEY.md §5). Requires batch % mesh_data == 0,
        which ``collate``'s fixed rectangles guarantee."""
        variables = {"params": self.state.params, "buffers": self.state.buffers}
        vid2result: Dict[str, str] = {}

        def _launch(batch):
            feats = self._shard(list(batch.feats))
            masks = self._shard(list(batch.masks))
            return self.greedy_fn(variables, feats, masks)[0]

        for batch, tokens in pipelined_map(
            _launch, self._progress(loader, "decode")
        ):
            caps = detokenize_batch(self.tokenizer, tokens)
            for vid, cap in list(zip(batch.vids, caps))[: batch.n_valid]:
                vid2result[vid] = cap
        return vid2result

    # ------------------------------------------------------------------

    def _log_scalars(self, epoch: int, scalars: Dict[str, float]) -> None:
        line = " | ".join(f"{k}={v:.4f}" for k, v in scalars.items())
        self.log(f"[epoch {epoch}] {line}")
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, v, epoch)

    def _ckpt_path(self, suffix: str) -> str:
        d = os.path.join(self.cfg.train.save_dir, self.cfg.train.tag + suffix)
        os.makedirs(os.path.dirname(d) or ".", exist_ok=True)
        return d

    def _run_ctl(self) -> Dict[str, float]:
        """Flat run-control scalars: earlystop + scheduler internals, so a
        resumed run makes the same save/stop/LR decisions as an uninterrupted
        one (the reference restarts from scratch every time)."""
        ctl = {f"es_{k}": v for k, v in self.earlystop.state_dict().items()}
        ctl.update({f"sched_{k}": v for k, v in self.scheduler.state_dict().items()})
        return ctl

    def save(self, suffix: str, epoch: int) -> str:
        path = self._ckpt_path(suffix)
        save_checkpoint(path, jax.device_get(self.state), epoch=epoch,
                        run_ctl=self._run_ctl())
        return path

    def resume(self, path: str) -> None:
        self.state, self.start_epoch, run_ctl = restore_checkpoint(
            path, jax.device_get(self.state), run_ctl_template=self._run_ctl()
        )
        self.state = shard_train_state(self.mesh, self.state)
        if run_ctl is not None:
            self.earlystop.load_state_dict(
                {k[3:]: v for k, v in run_ctl.items() if k.startswith("es_")}
            )
            self.scheduler.load_state_dict(
                {k[6:]: v for k, v in run_ctl.items() if k.startswith("sched_")}
            )
            lr = self.scheduler.lr
            set_learning_rate(self.state.opt_state, lr)
            self.log(f"restored run control: earlystop counter="
                     f"{self.earlystop.counter} best={self.earlystop.best_score} lr={lr}")
        else:
            # pre-run_ctl checkpoint: best effort — replay the deterministic
            # cosine schedule (Plateau/earlystop state is unrecoverable)
            for _ in range(self.start_epoch):
                if hasattr(self.scheduler, "T_max"):
                    self.scheduler.step()
        self.log(f"resumed from {path} at epoch {self.start_epoch}")

    def fit(self) -> Dict[str, float]:
        cfg = self.cfg
        last_scores: Dict[str, float] = {}
        for epoch in range(self.start_epoch, cfg.train.epoch):
            t0 = time.time()
            train_loss = self.train_epoch(epoch)
            # scheduler stepped per epoch like train.py:239
            if type(self.scheduler).__name__ == "ReduceLROnPlateau":
                pass  # stepped below once the val loss is known
            else:
                set_learning_rate(self.state.opt_state, self.scheduler.step())

            val_metrics = self.val_epoch()
            if type(self.scheduler).__name__ == "ReduceLROnPlateau" and val_metrics:
                set_learning_rate(
                    self.state.opt_state, self.scheduler.step(val_metrics["loss"])
                )

            scores = self.eval_epoch()
            last_scores = scores

            scalars = {"train_loss": train_loss, "lr": self.scheduler.lr,
                       "epoch_seconds": time.time() - t0}
            scalars.update({f"val_{k}": v for k, v in val_metrics.items()})
            scalars.update(scores)
            self._log_scalars(epoch, scalars)
            self.print_sample()

            # earlystop: metric-sum (maximize) or val loss (minimize),
            # train.py:263-281
            if cfg.train.metric_earlystop and scores:
                value = -sum(scores.get(k, 0.0) for k in METRIC_KEYS)
            else:
                value = val_metrics.get("loss", train_loss)
            # epoch+1 everywhere a checkpoint is taken AFTER the epoch ran:
            # the stored value is "next epoch to train", so resuming from a
            # best/periodic snapshot never re-applies a completed epoch's
            # updates (the `_latest` save below always used this convention)
            self.earlystop(
                value, save_fn=lambda: self.save("_earlystop", epoch + 1)
            )
            if self.earlystop.early_stop:
                self.log(f"early stop at epoch {epoch}")
                # mark the run CONCLUDED in the rolling checkpoint: a
                # `--resume auto` relaunch must see nothing left to train,
                # not restart the remaining epochs of a finished run
                self.save("_latest", cfg.train.epoch)
                break

            if (epoch + 1) % cfg.train.save_frequency == 0:
                self.save(f"_epoch{epoch}", epoch + 1)
            # crash/preemption recovery (SURVEY.md §5: the reference has no
            # resume story): a rolling full train-state checkpoint every
            # epoch; `--resume auto` picks it up
            self.save("_latest", epoch + 1)
        return last_scores

    def print_sample(self) -> None:
        """Reference ``v2t_single`` (``train.py:198-205``): print one eval
        video's prediction + a ground truth."""
        ds = self.datasets.get("eval")
        if ds is None or not len(ds):
            return
        feats, _, vid = ds[0]
        from vct_tpu.data.collate import collate

        batch = collate([(feats, "", vid)], batch_size=1, max_frames=self.cfg.tpu.max_frames)
        variables = {"params": self.state.params, "buffers": self.state.buffers}
        tokens, _ = self.greedy_fn(
            variables, [jnp.asarray(f) for f in batch.feats],
            [jnp.asarray(m) for m in batch.masks],
        )
        pred = detokenize_batch(self.tokenizer, tokens)[0]
        gt = ds.video2caption.get(vid, [""])[0]
        self.log(f"sample [{vid}] pred: {pred!r} | gt: {gt!r}")
