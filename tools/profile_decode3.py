"""Hypothesis test: carrying loop-INVARIANT cross-attn caches (ck/cv) in the
while-loop state costs ~1ms/step in copies. Variant A: full dict carry
(status quo). Variant B: carry only mutable k/v; close over ck/cv."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.ops.attention import padding_bias

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522
N1, N2 = 32, 160


def slope(name, make_fn, *args):
    f1, f2 = make_fn(N1), make_fn(N2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    ts = []
    for f, n in ((f1, N1), (f2, N2), (f1, N1), (f2, N2)):
        t0 = time.perf_counter(); np.asarray(f(*args)); ts.append((n, time.perf_counter() - t0))
    d1 = min(t for n, t in ts if n == N1); d2 = min(t for n, t in ts if n == N2)
    print(f"{name:46s} {(d2-d1)/(N2-N1)*1000:8.3f} ms/iter")


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)
    e = model.config.embed_dim

    def mk_A(n):
        @jax.jit
        def f(variables, feats, masks):
            memory, mem_mask, _ = model.apply(variables, feats, masks, method=MMT4Caption.encode)
            caches = model.apply(variables, B, MAX_LEN, memory, method=MMT4Caption.init_cache)
            cap = model.bind(variables).cap_decoder
            mb = padding_bias(mem_mask)
            def body(i, state):
                tok, caches = state
                idx = i % (MAX_LEN - 1)
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
                out, caches, _ = cap.decoder.decode_step(x, caches, idx, mb)
                logits = cap.generator(out[:, 0])
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    def mk_B(n):
        @jax.jit
        def f(variables, feats, masks):
            memory, mem_mask, _ = model.apply(variables, feats, masks, method=MMT4Caption.encode)
            caches = model.apply(variables, B, MAX_LEN, memory, method=MMT4Caption.init_cache)
            cap = model.bind(variables).cap_decoder
            mb = padding_bias(mem_mask)
            cross = tuple({"ck": c["ck"], "cv": c["cv"]} for c in caches)  # closed over
            kv0 = tuple({"k": c["k"], "v": c["v"]} for c in caches)
            def body(i, state):
                tok, kv = state
                idx = i % (MAX_LEN - 1)
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
                merged = tuple({**a, **b} for a, b in zip(kv, cross))
                out, merged, _ = cap.decoder.decode_step(x, merged, idx, mb)
                kv = tuple({"k": c["k"], "v": c["v"]} for c in merged)
                logits = cap.generator(out[:, 0])
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), kv
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, kv0))
            return jnp.sum(tok)
        return f

    slope("A: carry full cache dicts (status quo)", mk_A, variables, feats, masks)
    slope("B: carry k/v only, close over ck/cv", mk_B, variables, feats, masks)


if __name__ == "__main__":
    main()
