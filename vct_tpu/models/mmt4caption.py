"""MMT4Caption — the top-level multi-modal multi-task captioning model.

Re-design of ``/root/reference/model/MMT4Caption.py`` as a Flax module. The
composition is the same — video encoder (mme | simple | hmme, selected by
config ``MMT4Caption.py:44-85``) + caption decoder + optional matching head —
but the task routing is different by design:

* The reference mutates ``self.f_type`` and routes inside ``forward``
  (``MMT4Caption.py:96-112``) and flips ``requires_grad`` flags for selective
  freezing (``mode``, ``MMT4Caption.py:189-211``). Under jit, a functionally
  pure model exposes one method per task (``caption_loss`` / ``match_loss`` /
  ``cross_loss``) and freezing is an *optimizer-side* mask
  (``vct_tpu.train.optimizers.freeze_mask``) — the idiomatic JAX split.
* Tokenization happens in the input pipeline, not inside the step: the
  reference calls the HF tokenizer inside ``caption_forward``
  (``MMT4Caption.py:118``), which is host work inside the hot loop. Here the
  step takes ``(token_ids, pad_mask)`` tensors.
* Text encoding for the matching task (frozen CLIP/BERT, a plain non-module
  class in the reference, ``TextEncoder.py:7``) likewise happens outside; the
  step takes precomputed ``text_feat``.
* Greedy/beam decoding live in ``vct_tpu.decode`` as jitted ``lax.while_loop``
  programs over this module's ``encode`` / ``decode_step``.

Cross-task loss: ``beta * cap + (1 - beta) * match`` (``MMT4Caption.py:143``).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vct_tpu.config import ModelConfig, TPUConfig
from vct_tpu.models.decoder import CapDecoder
from vct_tpu.models.encoder import HMMEncoder, MultiModalEncoder, SimpleSepEncoder
from vct_tpu.models.matching import Matching

Dtype = Any

# frozen CLIP ViT-B/32 text dim vs BERT CLS dim (reference TextEncoder.py:16,22)
_TEXT_DIMS = {"CLIP": 512, "bert": 768}


def text_encoder_dim(text_enc_type: str) -> int:
    if "CLIP" in text_enc_type:
        return _TEXT_DIMS["CLIP"]
    if "bert" in text_enc_type:
        return _TEXT_DIMS["bert"]
    raise ValueError(f"unsupported text_enc_type: {text_enc_type}")


class MMT4Caption(nn.Module):
    config: ModelConfig
    tpu: TPUConfig = TPUConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        ve = cfg.video_encoder
        common = dict(
            d_feats=cfg.modal_shape,
            d_model=cfg.embed_dim,
            nhead=ve.nhead,
            dim_feedforward=ve.feedforward,
            dropout_rate=cfg.dropout,
            activation=cfg.activation,
            dtype=self.dtype,
            use_pallas=self.tpu.use_pallas_attention,
            partition_kernels=self.tpu.pallas_partition_kernels,
            fast_math=self.tpu.fast_numerics,
        )
        if ve.type == "simple":
            self.video_encoder = SimpleSepEncoder(
                num_encoder_layers=ve.layer, name="video_encoder", **common
            )
        elif ve.type == "hmme":
            self.video_encoder = HMMEncoder(
                num_encoder_layers=tuple(ve.layer) if isinstance(ve.layer, (tuple, list)) else (ve.layer,),
                global_type=ve.mme.aggregation,
                modal_different=ve.mme.modal_different,
                temporal_type=ve.mme.temporal,
                do_norm=ve.mme.do_norm,
                quirk_unmasked_agg=self.tpu.quirk_unmasked_aggregation,
                name="video_encoder",
                **common,
            )
        else:
            self.video_encoder = MultiModalEncoder(
                num_encoder_layers=int(ve.layer),
                global_type=ve.mme.aggregation,
                modal_different=ve.mme.modal_different,
                temporal_type=ve.mme.temporal,
                do_norm=ve.mme.do_norm,
                quirk_unmasked_agg=self.tpu.quirk_unmasked_aggregation,
                name="video_encoder",
                **common,
            )
        self.cap_decoder = CapDecoder(
            num_layers=cfg.caption_decoder.layer,
            embed_dim=cfg.embed_dim,
            nhead=cfg.caption_decoder.nhead,
            dim_feedforward=cfg.caption_decoder.feedforward,
            dropout_rate=cfg.dropout,
            vocab_size=cfg.vocab_size,
            pad_id=cfg.pad_id,
            sce_loss_alpha=cfg.caption_decoder.sce_loss_alpha,
            activation=cfg.activation,
            quirk_no_memory_mask=self.tpu.quirk_no_memory_mask_in_decoder,
            use_pallas=self.tpu.use_pallas_attention,
            partition_kernels=self.tpu.pallas_partition_kernels,
            fast_math=self.tpu.fast_numerics,
            use_fused_loss=self.tpu.use_fused_loss,
            fused_loss_stash=self.tpu.fused_loss_stash,
            fused_loss_pallas=self.tpu.fused_loss_pallas,
            name="cap_decoder",
        )
        if cfg.matching is not None:
            self.matching = Matching(
                video_dim=cfg.embed_dim,
                text_dim=text_encoder_dim(cfg.text_enc_type),
                loss=cfg.matching.matching_loss,
                enable_tem=cfg.matching.enable_tem,
                fixed_tem=cfg.matching.temperature,
                dtype=self.dtype,
                name="matching",
            )

    # ---- task forwards (reference caption/match/cross_forward) --------------

    def caption_loss(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        token_ids: jnp.ndarray,
        token_pad_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
        row_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Caption task (``MMT4Caption.py:114-121``) -> scalar loss.
        ``row_valid`` [B] bool excludes collate filler rows."""
        memory, mem_mask, _ = self.video_encoder(
            video_feats, video_masks, deterministic=deterministic
        )
        _, loss, _ = self.cap_decoder(
            memory, token_ids, token_pad_mask, mem_mask,
            deterministic=deterministic, row_valid=row_valid, loss_only=True,
        )
        return loss

    def caption_loss_parts(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        token_ids: jnp.ndarray,
        token_pad_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
        row_valid: Optional[jnp.ndarray] = None,
    ):
        """-> (ce_sum, ce_n, rce_sum, rce_n) for exact cross-batch validation
        aggregation (the per-batch mean would bias toward small final
        batches)."""
        memory, mem_mask, _ = self.video_encoder(
            video_feats, video_masks, deterministic=deterministic
        )
        _, parts, _ = self.cap_decoder(
            memory, token_ids, token_pad_mask, mem_mask,
            deterministic=deterministic, row_valid=row_valid, return_parts=True,
            loss_only=True,
        )
        return parts

    def caption_logits(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        token_ids: jnp.ndarray,
        token_pad_mask: jnp.ndarray,
        *,
        deterministic: bool = True,
        return_attn: bool = False,
    ):
        memory, mem_mask, _ = self.video_encoder(
            video_feats, video_masks, deterministic=deterministic
        )
        return self.cap_decoder(
            memory,
            token_ids,
            token_pad_mask,
            mem_mask,
            deterministic=deterministic,
            return_attn=return_attn,
        )

    def match_loss(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        text_feat: jnp.ndarray,
        *,
        deterministic: bool = True,
        row_valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Match task (``MMT4Caption.py:123-130``): contrastive loss between
        precomputed frozen text features and the encoder's agg feature.
        ``row_valid`` restricts anchors AND negatives to the real sub-batch."""
        _, _, agg = self.video_encoder(video_feats, video_masks, deterministic=deterministic)
        return self.matching(text_feat, agg, valid=row_valid)

    def cross_loss(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        token_ids: jnp.ndarray,
        token_pad_mask: jnp.ndarray,
        text_feat: jnp.ndarray,
        *,
        deterministic: bool = True,
        row_valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Cross task (``MMT4Caption.py:132-144``) -> (loss, cap_loss, match_loss)."""
        memory, mem_mask, agg = self.video_encoder(
            video_feats, video_masks, deterministic=deterministic
        )
        _, cap_loss, _ = self.cap_decoder(
            memory, token_ids, token_pad_mask, mem_mask,
            deterministic=deterministic, row_valid=row_valid, loss_only=True,
        )
        match_loss = self.matching(text_feat, agg, valid=row_valid)
        beta = self.config.loss_beta
        return beta * cap_loss + (1.0 - beta) * match_loss, cap_loss, match_loss

    def cross_loss_parts(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]],
        token_ids: jnp.ndarray,
        token_pad_mask: jnp.ndarray,
        text_feat: jnp.ndarray,
        *,
        deterministic: bool = True,
        row_valid: Optional[jnp.ndarray] = None,
    ):
        """-> (ce_sum, ce_n, rce_sum, rce_n, match_loss) for validation."""
        memory, mem_mask, agg = self.video_encoder(
            video_feats, video_masks, deterministic=deterministic
        )
        _, parts, _ = self.cap_decoder(
            memory, token_ids, token_pad_mask, mem_mask,
            deterministic=deterministic, row_valid=row_valid, return_parts=True,
            loss_only=True,
        )
        match_loss = self.matching(text_feat, agg, valid=row_valid)
        return parts + (match_loss,)

    # ---- decoding primitives (driven by vct_tpu.decode) ----------------------

    def encode(
        self,
        video_feats: List[jnp.ndarray],
        video_masks: Optional[List[jnp.ndarray]] = None,
    ):
        """Encoder-only forward -> (memory, memory_pad_mask, agg)."""
        return self.video_encoder(video_feats, video_masks, deterministic=True)

    def init_cache(self, batch: int, max_len: int, memory: jnp.ndarray):
        return self.cap_decoder.init_cache(batch, max_len, memory)

    def decode_step(
        self,
        tokens: jnp.ndarray,
        caches,
        idx: jnp.ndarray,
        memory_padding_mask: Optional[jnp.ndarray] = None,
        *,
        return_attn: bool = False,
    ):
        return self.cap_decoder.decode_step(
            tokens, caches, idx, memory_padding_mask, return_attn=return_attn
        )

    def decode_word(
        self,
        memory: jnp.ndarray,
        tgt: jnp.ndarray,
        memory_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Reference-style full-prefix scoring (baseline path, no cache)."""
        return self.cap_decoder.decode_word(memory, tgt, memory_padding_mask)
