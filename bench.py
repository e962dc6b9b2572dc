"""Benchmark: caption decoding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured: captions/sec/chip for batched greedy decoding (max_len 30,
full-length worst case) on the flagship MSVD-config model (embed 768, 1-layer
encoder, 3-layer decoder, vocab 30522, uni_12 features) in bfloat16 — the
reference repo's latency-critical path (``eval.py`` decodes the whole split
every epoch, ``train.py:248``). The reference publishes no throughput numbers
(SURVEY.md §6), so the baseline here is a faithful re-statement of the
reference's *algorithm* on the same stack and chip: full-prefix decoder
re-run per token with no KV cache and a host argmax round-trip per step
(``MMT4Caption.py:146-184``, ``CapDecoder.py:62-79``). vs_baseline is the
speedup of the vct_tpu decode path (jitted lax.while_loop + KV cache) over
that — an apples-to-apples algorithmic comparison, hardware held fixed.

Timing notes: every timed iteration materializes the result on host
(np.asarray) — on this TPU relay, block_until_ready alone is not a reliable
completion barrier until the first host transfer has warmed the path up.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.decode import make_greedy_fn
from vct_tpu.models.mmt4caption import MMT4Caption

# B=1024 amortizes the fixed per-dispatch cost (measured sweep on v5e:
# 64->1645, 128->3050, 256->5151, 512->6453, 1024->7489, 2048->8238
# captions/s; the decode is latency- not FLOP-bound at this model size, and
# past 1024 the extra latency outweighs the marginal throughput).
B = 1024
T = 12
MAX_LEN = 30
VOCAB = 30522
END_ID = -1  # never fires -> full 30-token generation (worst case; with real
# weights the early-exit only helps further)


def latency_mode() -> None:
    """--latency: p50/p90 single-video pixels->caption latency through the
    FUSED CLIP ViT-B/32 + captioner program (BASELINE.json north-star metric;
    not part of the driver's headline line)."""
    from vct_tpu.clip.vision import CLIPVisionTower
    from vct_tpu.pipeline import make_video_caption_fn

    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(1, T, 8, 512, VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
        method=MMT4Caption.caption_loss,
    )
    tower = CLIPVisionTower(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.standard_normal((1, T, 224, 224, 3)), jnp.float32)
    clip_params = tower.init(jax.random.PRNGKey(1), pixels[0])["params"]
    fn = make_video_caption_fn(model, tower, max_len=MAX_LEN, start_id=101,
                               end_id=END_ID)
    np.asarray(fn(variables, clip_params, pixels)[0])  # compile + warm
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(fn(variables, clip_params, pixels)[0])
        lat.append(time.perf_counter() - t0)
    lat.sort()
    print(json.dumps({
        "metric": "video_to_caption_latency_p50",
        "value": round(lat[len(lat) // 2] * 1000, 2),
        "unit": "ms",
        "p90_ms": round(lat[max(0, -(-9 * len(lat) // 10) - 1)] * 1000, 2),
    }))


def main() -> None:
    # warm the device + transfer path (first host transfer can take ~60s on
    # the tunneled TPU; everything after is steady-state)
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
        method=MMT4Caption.caption_loss,
    )

    # ---- vct_tpu path: jitted KV-cached greedy -----------------------------
    greedy = make_greedy_fn(model, MAX_LEN, 101, END_ID)
    np.asarray(greedy(variables, feats, masks)[0])  # compile + warm
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        tokens = np.asarray(greedy(variables, feats, masks)[0])
    ours_cps = B * iters / (time.perf_counter() - t0)

    # ---- reference algorithm: no cache, full re-run, host argmax loop ------
    encode = jax.jit(lambda v, f, m: model.apply(v, f, m, method=MMT4Caption.encode))
    word_fns = {}

    def decode_word(variables, memory, ys, mem_mask):
        s = ys.shape[1]
        if s not in word_fns:
            word_fns[s] = jax.jit(
                lambda v, mem, y, mm: model.apply(
                    v, mem, y, mm, method=MMT4Caption.decode_word
                )
            )
        return word_fns[s](variables, memory, ys, mem_mask)

    def reference_decode():
        memory, mem_mask, _ = encode(variables, feats, masks)
        ys = np.full((B, 1), 101, np.int32)
        end = np.zeros(B, bool)
        for _ in range(MAX_LEN - 1):
            logits = decode_word(variables, memory, jnp.asarray(ys), mem_mask)
            nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
            ys = np.concatenate([ys, nxt[:, None]], axis=1)
            end |= nxt == END_ID
            if end.all():
                break
        return ys

    reference_decode()  # compile all prefix lengths
    iters_ref = 3
    t0 = time.perf_counter()
    for _ in range(iters_ref):
        reference_decode()
    ref_cps = B * iters_ref / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "greedy_caption_throughput",
                "value": round(ours_cps, 2),
                "unit": "captions/sec/chip",
                "vs_baseline": round(ours_cps / ref_cps, 2),
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--latency" in sys.argv:
        latency_mode()
    else:
        main()
