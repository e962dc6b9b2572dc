"""Video-text joint-embedding matching head (``/root/reference/model/Matching.py``).

Optional ``v_proj`` Linear when video/text dims differ (``Matching.py:21``),
then a CLIP symmetric contrastive loss (CSL or CSL_WDS). The learnable
temperature lives here as a parameter (the reference buries it inside the loss
module, ``loss.py:13-16``); a fixed temperature comes from config.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vct_tpu.models.losses import clip_symmetric_loss, clip_symmetric_loss_wds

Dtype = Any


class Matching(nn.Module):
    video_dim: int
    text_dim: int
    loss: str = "CSL"  # CSL | CSL_WDS
    enable_tem: bool = False
    fixed_tem: Optional[float] = None
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.loss not in ("CSL", "CSL_WDS"):
            raise ValueError(f"unsupported matching loss: {self.loss}")
        if self.video_dim != self.text_dim:
            self.v_proj = nn.Dense(
                self.text_dim, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj"
            )
        if self.enable_tem:
            self.temperature = self.param(
                "temperature", nn.initializers.ones, (1,), jnp.float32
            )

    def __call__(
        self,
        text_feat: jnp.ndarray,
        vid_feat: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``valid`` [B] bool restricts the contrastive batch to real rows —
        collate filler rows (duplicates of row 0) would otherwise appear as
        false negatives of their own positive pair."""
        if self.video_dim != self.text_dim:
            vid_feat = self.v_proj(vid_feat.astype(self.dtype))
        if self.enable_tem:
            tem = self.temperature
        elif self.fixed_tem is not None:
            tem = jnp.asarray([self.fixed_tem], jnp.float32)
        else:
            tem = None
        fn = clip_symmetric_loss if self.loss == "CSL" else clip_symmetric_loss_wds
        return fn(vid_feat, text_feat, tem, valid)
