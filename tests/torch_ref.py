"""Torch fixture models for parity tests.

These re-state the reference architecture using torch built-ins (the reference
itself is just thin wrappers around ``nn.TransformerEncoder/Decoder``; see
``/root/reference/model/MMEncoder.py:236-238``, ``CapDecoder.py:17-27``) so
vct_tpu outputs can be golden-tested against real torch numerics on CPU.
Not imported by the framework — test-only.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def sinusoid_table_torch(max_len: int, dim: int) -> torch.Tensor:
    den = torch.exp(-torch.arange(0, dim, 2).float() * (math.log(10000.0) / dim))
    pos = torch.arange(0, max_len).float().unsqueeze(1)
    t = torch.zeros(max_len, dim)
    t[:, 0::2] = torch.sin(pos * den)
    t[:, 1::2] = torch.cos(pos * den)
    return t


def make_encoder(d_model, nhead, ff, num_layers, activation="gelu"):
    layer = nn.TransformerEncoderLayer(
        d_model, nhead, ff, dropout=0.0, activation=activation, batch_first=True
    )
    # enable_nested_tensor=False: torch>=2 otherwise takes a nested-tensor fast
    # path in eval mode that leaves *padded* positions unset; the reference was
    # written against the math path, which vct_tpu reproduces.
    return nn.TransformerEncoder(
        layer, num_layers, nn.LayerNorm(d_model), enable_nested_tensor=False
    )


def make_decoder(d_model, nhead, ff, num_layers, activation="gelu"):
    layer = nn.TransformerDecoderLayer(
        d_model, nhead, ff, dropout=0.0, activation=activation, batch_first=True
    )
    return nn.TransformerDecoder(layer, num_layers, nn.LayerNorm(d_model))


def causal_mask(sz: int) -> torch.Tensor:
    """utils.generate_square_subsequent_mask (utils.py:63-66)."""
    mask = (torch.triu(torch.ones((sz, sz))) == 1).transpose(0, 1)
    return mask.float().masked_fill(mask == 0, float("-inf")).masked_fill(mask == 1, 0.0)


def sce_loss_torch(pred, labels, alpha, beta, num_classes, ignore_index=0):
    """SCELoss math per /root/reference/model/loss.py:69-92."""
    ce = nn.CrossEntropyLoss(ignore_index=ignore_index)(pred, labels)
    p = F.softmax(pred, dim=1).clamp(min=1e-7, max=1.0)
    onehot = F.one_hot(labels, num_classes).float().clamp(min=1e-4, max=1.0)
    rce = -torch.sum(p * torch.log(onehot), dim=1)
    return alpha * ce + beta * rce.mean()


def csl_torch(video, text, temperature=None):
    """ClipSymmetricalLoss math per loss.py:18-35 (temperature optional)."""
    video = video / torch.linalg.norm(video, dim=-1, keepdim=True)
    text = text / torch.linalg.norm(text, dim=-1, keepdim=True)
    sim = video @ text.T
    if temperature is not None:
        sim = sim * torch.exp(torch.tensor(float(temperature)))
    target = torch.arange(len(video))
    ce = nn.CrossEntropyLoss()
    return (ce(sim, target) + ce(sim.T, target)) / 2


def csl_wds_torch(video, text, temperature=1.0):
    """ClipSymmetricalLoss_WithDualSoftmax math per loss.py:52-66."""
    video = video / torch.linalg.norm(video, dim=-1, keepdim=True)
    text = text / torch.linalg.norm(text, dim=-1, keepdim=True)
    sim = video @ text.T
    sim = sim * F.softmax(sim / temperature, dim=0) * len(sim)
    target = torch.arange(len(video))
    ce = nn.CrossEntropyLoss()
    return (ce(sim, target) + ce(sim.T, target)) / 2


class RefMMEncoder(nn.Module):
    """Torch restatement of the reference MultiModalEncoder forward
    (MMEncoder.py:205-277) for the shipped single-modality config:
    unify Linear -> prepend avg-pool agg token -> sinusoidal temporal PE
    (zero at the agg slot) -> TransformerEncoder(+final LN)."""

    def __init__(self, d_feat, d_model, nhead, ff, num_layers, agg="avg"):
        super().__init__()
        self.unify = nn.Linear(d_feat, d_model)
        self.agg = agg
        self.encoder = make_encoder(d_model, nhead, ff, num_layers)
        self.d_model = d_model

    def forward(self, src, pad_mask=None):
        f = self.unify(src)  # B,T,E
        if self.agg == "avg":
            if pad_mask is None:
                g = f.mean(dim=1, keepdim=True)
            else:
                keep = (~pad_mask).unsqueeze(-1).float()
                g = (f * keep).sum(1, keepdim=True) / keep.sum(1, keepdim=True)
        else:
            raise NotImplementedError
        x = torch.cat([g, f], dim=1)  # B,1+T,E
        t = x.shape[1] - 1
        pe = sinusoid_table_torch(512, self.d_model)
        temp = torch.zeros(t + 1, self.d_model)
        import numpy as _np
        idx = _np.linspace(0, t - 1, t).astype(_np.int32)  # D == t (1 modality)
        temp[1:] = pe[idx]
        x = x + temp.unsqueeze(0)
        if pad_mask is not None:
            full_mask = torch.cat([torch.zeros(x.shape[0], 1, dtype=torch.bool), pad_mask], dim=1)
        else:
            full_mask = None
        mem = self.encoder(x, None, full_mask)
        return mem, full_mask, mem[:, 0]


class RefCapDecoder(nn.Module):
    """Torch restatement of CapDecoder (CapDecoder.py:11-79): Embedding with
    padding_idx -> +sinusoidal PE buffer -> TransformerDecoder(+final LN) ->
    generator; teacher-forced shift; SCE loss. memory mask NOT passed in the
    reference (CapDecoder.py:49-52); optional here for the corrected path."""

    def __init__(self, num_layers, d_model, nhead, ff, vocab, pad_id=0, alpha=0.5):
        super().__init__()
        self.decoder = make_decoder(d_model, nhead, ff, num_layers)
        self.generator = nn.Linear(d_model, vocab)
        self.tgt_to_emb = nn.Embedding(vocab, d_model, padding_idx=pad_id)
        self.register_buffer("pos_embedding", sinusoid_table_torch(5000, d_model))
        self.vocab, self.pad_id, self.alpha = vocab, pad_id, alpha

    def embed(self, tgt):
        return self.tgt_to_emb(tgt) + self.pos_embedding[: tgt.shape[1]]

    def forward(self, memory, tgt, tgt_pad, memory_pad=None):
        tgt_input, tgt_out = tgt[:, :-1], tgt[:, 1:]
        outs = self.decoder(
            self.embed(tgt_input), memory,
            tgt_mask=causal_mask(tgt_input.shape[1]),
            tgt_key_padding_mask=tgt_pad[:, :-1],
            memory_key_padding_mask=memory_pad,
        )
        logits = self.generator(outs)
        loss = sce_loss_torch(
            logits.reshape(-1, self.vocab), tgt_out.reshape(-1),
            self.alpha, 1 - self.alpha, self.vocab, self.pad_id,
        )
        return logits, loss
