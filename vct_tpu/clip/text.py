"""Flax CLIP text tower + self-contained CLIP BPE tokenizer.

The reference's matching/cross tasks use a *frozen* sentence encoder
(``TextEncoder.py:7-55``): CLIP ViT-B/32 ``encode_text`` (dim 512) or BERT CLS
(dim 768), with the weights never entering checkpoints. This module provides
the CLIP path natively: a jittable Flax text transformer (width 512, 12
layers, 8 heads, causal mask, EOT-token pooling, projection to 512) plus the
byte-level BPE tokenizer (`clip.tokenize` equivalent, context length 77),
loading standard `vocab.json`+`merges.txt` files — no torch, no downloads.

The BERT path stays host-side via locally cached HF weights (it is secondary:
every shipped config uses ``"text_enc_type": "CLIP"``).
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import re
from typing import Any, Callable, Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.clip.vision import CLIPBlock

Dtype = Any

CONTEXT_LENGTH = 77  # clip.tokenize default
NEG_INF = -1e30


class CLIPTextTower(nn.Module):
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = CONTEXT_LENGTH
    out_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [B, context_length] int32 -> [B, out_dim] (EOT-pooled)."""
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.width), jnp.float32,
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width), jnp.float32,
        )
        x = tok_emb[tokens].astype(self.dtype) + pos_emb[None].astype(self.dtype)

        t = tokens.shape[1]
        causal = jnp.where(
            jnp.tril(jnp.ones((t, t), bool)), 0.0, NEG_INF
        ).astype(jnp.float32)
        for i in range(self.layers):
            x = CLIPBlock(self.width, self.heads, self.dtype, name=f"resblocks_{i}")(
                x, causal
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final", dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        # pool at the EOT token = highest token id per row (OpenAI CLIP.encode_text)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5),
            (self.width, self.out_dim), jnp.float32,
        )
        return pooled @ proj.astype(self.dtype)


# ---------------------------------------------------------------------------
# BPE tokenizer (clip.simple_tokenizer semantics)
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


# clip.simple_tokenizer uses the ``regex`` module's \p{L}/\p{N} classes; the
# stdlib-re equivalent below matches it exactly on ASCII text (MSR-VTT/MSVD
# captions are ASCII; VATEX-zh goes through the WordPiece path instead).
_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
    re.IGNORECASE,
)


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPBPETokenizer:
    """Byte-level BPE matching ``clip.simple_tokenizer.SimpleTokenizer``.

    Construct from HF-format ``vocab.json`` + ``merges.txt``, or the OpenAI
    ``bpe_simple_vocab_16e6.txt.gz`` merges file.
    """

    def __init__(self, vocab: Dict[str, int], merges: List[tuple]):
        self.encoder = vocab
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = _bytes_to_unicode()
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.sot = vocab["<|startoftext|>"]
        self.eot = vocab["<|endoftext|>"]

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_hf_files(cls, vocab_json: str, merges_txt: str) -> "CLIPBPETokenizer":
        with open(vocab_json) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_txt) as f:
            for i, line in enumerate(f.read().split("\n")):
                # only the first line may be the '#version: ...' header; real
                # CLIP merges include '#'-initial entries (hashtag byte pairs)
                if not line or (i == 0 and line.startswith("#version")):
                    continue
                merges.append(tuple(line.split()))
        return cls(vocab, merges)

    @classmethod
    def from_openai_merges(cls, bpe_path: str) -> "CLIPBPETokenizer":
        """OpenAI ``bpe_simple_vocab_16e6.txt.gz``: merges define the vocab
        (``clip.simple_tokenizer.SimpleTokenizer.__init__``)."""
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merge_lines = f.read().split("\n")[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merge_lines]
        chars = list(_bytes_to_unicode().values())
        vocab_list = chars + [c + "</w>" for c in chars]
        vocab_list += ["".join(m) for m in merges]
        vocab_list += ["<|startoftext|>", "<|endoftext|>"]
        return cls({t: i for i, t in enumerate(vocab_list)}, merges)

    # -- BPE core ----------------------------------------------------------

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        for token in re.findall(_PAT, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def tokenize(self, texts: List[str], context_length: int = CONTEXT_LENGTH,
                 truncate: bool = True) -> np.ndarray:
        """``clip.tokenize`` equivalent -> [B, context_length] int32."""
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"input too long for context {context_length}")
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# weight conversion (OpenAI / HF CLIP text state_dicts)
# ---------------------------------------------------------------------------


def convert_clip_text(sd: Dict[str, np.ndarray], layers: int = 12) -> Dict:
    if "token_embedding.weight" not in sd and any(
        k.startswith("text_model.") for k in sd
    ):
        sd = _hf_text_to_openai(sd)
    g = lambda k: np.asarray(sd[k], np.float32)  # noqa: E731
    params = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblocks_{i}"] = {
            "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
            "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
            "attn": {
                "in_proj_kernel": g(f"{p}.attn.in_proj_weight").T,
                "in_proj_bias": g(f"{p}.attn.in_proj_bias"),
                "out_proj": {
                    "kernel": g(f"{p}.attn.out_proj.weight").T,
                    "bias": g(f"{p}.attn.out_proj.bias"),
                },
            },
            "mlp_fc": {"kernel": g(f"{p}.mlp.c_fc.weight").T, "bias": g(f"{p}.mlp.c_fc.bias")},
            "mlp_proj": {"kernel": g(f"{p}.mlp.c_proj.weight").T, "bias": g(f"{p}.mlp.c_proj.bias")},
        }
    return params


def _hf_text_to_openai(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    ren = {
        "text_model.embeddings.token_embedding.weight": "token_embedding.weight",
        "text_model.embeddings.position_embedding.weight": "positional_embedding",
        "text_model.final_layer_norm.weight": "ln_final.weight",
        "text_model.final_layer_norm.bias": "ln_final.bias",
    }
    qkv: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        v = np.asarray(v)
        if k in ren:
            out[ren[k]] = v
            continue
        if k == "text_projection.weight":
            out["text_projection"] = v.T
            continue
        if k.startswith("text_model.encoder.layers."):
            parts = k.split(".")
            i, rest = parts[3], ".".join(parts[4:])
            p = f"transformer.resblocks.{i}"
            leaf = {
                "layer_norm1.weight": f"{p}.ln_1.weight",
                "layer_norm1.bias": f"{p}.ln_1.bias",
                "layer_norm2.weight": f"{p}.ln_2.weight",
                "layer_norm2.bias": f"{p}.ln_2.bias",
                "mlp.fc1.weight": f"{p}.mlp.c_fc.weight",
                "mlp.fc1.bias": f"{p}.mlp.c_fc.bias",
                "mlp.fc2.weight": f"{p}.mlp.c_proj.weight",
                "mlp.fc2.bias": f"{p}.mlp.c_proj.bias",
                "self_attn.out_proj.weight": f"{p}.attn.out_proj.weight",
                "self_attn.out_proj.bias": f"{p}.attn.out_proj.bias",
            }
            if rest in leaf:
                out[leaf[rest]] = v
            elif rest.startswith("self_attn."):
                which, leaf_name = rest.split(".")[1], rest.split(".")[2]
                qkv.setdefault(f"{p}|{leaf_name}", {})[which] = v
    for key, parts in qkv.items():
        p, leaf_name = key.split("|")
        stacked = np.concatenate(
            [parts["q_proj"], parts["k_proj"], parts["v_proj"]], axis=0
        )
        out[f"{p}.attn.in_proj_{'weight' if leaf_name == 'weight' else 'bias'}"] = stacked
    return out


# ---------------------------------------------------------------------------
# the Trainer-facing frozen text_encoder factory
# ---------------------------------------------------------------------------


def infer_text_tower_kwargs(sd: Dict[str, np.ndarray]) -> dict:
    """Tower shape from a (OpenAI-format) text state_dict: works for ViT-B/32
    and any resized variant (tests use tiny towers). Heads follow the CLIP
    convention d_head=64, floor 1."""
    if "token_embedding.weight" not in sd and any(
        k.startswith("text_model.") for k in sd
    ):
        sd = _hf_text_to_openai(sd)
    vocab, width = sd["token_embedding.weight"].shape
    layers = 0
    while f"transformer.resblocks.{layers}.ln_1.weight" in sd:
        layers += 1
    return dict(
        vocab_size=int(vocab),
        width=int(width),
        layers=layers,
        heads=max(1, int(width) // 64),
        context_length=int(sd["positional_embedding"].shape[0]),
        out_dim=int(sd["text_projection"].shape[1]),
    )


def build_text_encoder(
    text_enc_type: str,
    *,
    clip_weights: Optional[str] = None,
    vocab_json: Optional[str] = None,
    merges_txt: Optional[str] = None,
    batch_pad: int = 64,
    tower_kwargs: Optional[dict] = None,
) -> Callable[[List[str]], np.ndarray]:
    """-> callable ``List[str] -> [B, dim] float32`` (reference
    ``TextEncoder.__call__``). CLIP runs jitted on-device with the batch
    padded to ``batch_pad`` for a single compiled shape. ``tower_kwargs``
    overrides the ViT-B/32 text-tower shape (tests use tiny towers)."""
    if "CLIP" in text_enc_type:
        if not (clip_weights and vocab_json and merges_txt):
            raise ValueError(
                "CLIP text encoder needs clip_weights + vocab_json + merges_txt"
            )
        from vct_tpu.clip.convert import load_clip_state_dict

        tokenizer = CLIPBPETokenizer.from_hf_files(vocab_json, merges_txt)
        sd = load_clip_state_dict(clip_weights)
        if tower_kwargs is None:
            tower_kwargs = infer_text_tower_kwargs(sd)
        tower = CLIPTextTower(**tower_kwargs)
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_clip_text(sd, layers=tower.layers)
        )
        apply = jax.jit(lambda toks: tower.apply({"params": params}, toks))

        def encode(captions: List[str]) -> np.ndarray:
            toks = tokenizer.tokenize(captions)
            n = len(captions)
            pad = (-n) % batch_pad
            if pad:
                toks = np.concatenate([toks, np.tile(toks[:1], (pad, 1))])
            return np.asarray(apply(jnp.asarray(toks)))[:n]

        return encode

    if "bert" in text_enc_type:
        # Secondary path (no shipped config uses it): host-side torch BERT CLS
        # from a locally cached model, mirroring TextEncoder.py:37-52.
        import torch
        from transformers import AutoTokenizer, BertModel

        tk = AutoTokenizer.from_pretrained(text_enc_type, local_files_only=True)
        enc = BertModel.from_pretrained(text_enc_type, local_files_only=True).eval()

        def encode_bert(captions: List[str]) -> np.ndarray:
            with torch.no_grad():
                batch = tk(captions, padding=True, return_tensors="pt")
                out = enc(batch["input_ids"], batch["attention_mask"])
            return out.last_hidden_state[:, 0].numpy()

        return encode_bert

    raise ValueError(f"unsupported text_enc_type: {text_enc_type}")
