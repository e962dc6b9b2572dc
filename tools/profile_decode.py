"""Decode-step cost breakdown on the real TPU (round-2 VERDICT next-#1a).

Methodology (the relay makes naive timing lie):
* every piece runs inside ONE jitted lax.fori_loop, so no host dispatch is
  inside the measurement,
* per-iteration cost = SLOPE between two iteration counts (N1, N2) — this
  cancels the fixed per-call relay/dispatch overhead,
* every jit returns a SCALAR (sums), so no multi-MB device->host transfer
  pollutes the clock,
* an empty-body loop measures the per-iteration while-loop overhead itself.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522
N1, N2 = 32, 160


def slope(name, make_fn, *args):
    f1, f2 = make_fn(N1), make_fn(N2)
    np.asarray(f1(*args))
    np.asarray(f2(*args))
    ts = []
    for f, n in ((f1, N1), (f2, N2), (f1, N1), (f2, N2)):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append((n, time.perf_counter() - t0))
    d1 = min(t for n, t in ts if n == N1)
    d2 = min(t for n, t in ts if n == N2)
    ms = (d2 - d1) / (N2 - N1) * 1000
    print(f"{name:44s} {ms:8.3f} ms/iter")
    return ms


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(
        jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
        method=MMT4Caption.caption_loss,
    )
    encode = jax.jit(lambda v, f, m: model.apply(v, f, m, method=MMT4Caption.encode))
    memory, mem_mask, _ = encode(variables, feats, masks)
    caches = model.apply(variables, B, MAX_LEN, memory, method=MMT4Caption.init_cache)
    e = model.config.embed_dim

    def mk_empty(n):
        @jax.jit
        def f(tok):
            return jnp.sum(jax.lax.fori_loop(
                0, n, lambda i, t: (t + 1) % VOCAB, tok))
        return f

    def mk_full(n):
        @jax.jit
        def f(variables, caches, mem_mask):
            def body(i, state):
                tok, caches = state
                logits, caches, _ = model.apply(
                    variables, tok, caches, i % (MAX_LEN - 1), mem_mask,
                    method=MMT4Caption.decode_step,
                )
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, caches2 = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok) + jnp.sum(caches2[0]["k"][:, 0, 0, 0].astype(jnp.float32))
        return f

    def mk_layers(n):
        @jax.jit
        def f(variables, caches):
            cap = model.bind(variables).cap_decoder

            def body(i, state):
                x, caches = state
                out, caches, _ = cap.decoder.decode_step(
                    x, caches, i % (MAX_LEN - 1), None
                )
                return out.astype(jnp.bfloat16), caches
            x0 = jnp.zeros((B, 1, e), jnp.bfloat16)
            x, caches2 = jax.lax.fori_loop(0, n, body, (x0, caches))
            return jnp.sum(x.astype(jnp.float32))
        return f

    def mk_one_layer(n):
        @jax.jit
        def f(variables, caches):
            cap = model.bind(variables).cap_decoder
            layer = cap.decoder.layers[0]

            def body(i, state):
                x, cache = state
                out, cache, _ = layer.decode_step(x, cache, i % (MAX_LEN - 1), None)
                return out.astype(jnp.bfloat16), cache
            x0 = jnp.zeros((B, 1, e), jnp.bfloat16)
            x, _ = jax.lax.fori_loop(0, n, body, (x0, caches[0]))
            return jnp.sum(x.astype(jnp.float32))
        return f

    def mk_gen(n):
        @jax.jit
        def f(variables):
            cap = model.bind(variables).cap_decoder

            def body(i, state):
                x, acc = state
                logits = cap.generator(x[:, 0])
                nxt = jnp.argmax(logits, axis=-1)
                return x, acc + jnp.sum(nxt)
            x0 = jnp.zeros((B, 1, e), jnp.bfloat16)
            # x constant -> guard against hoisting by folding acc into x read
            def body2(i, state):
                x, acc = state
                logits = cap.generator(x[:, 0] + (acc % 3).astype(jnp.bfloat16) * 1e-8)
                nxt = jnp.argmax(logits, axis=-1)
                return x, acc + jnp.sum(nxt)
            _, acc = jax.lax.fori_loop(0, n, body2, (x0, jnp.asarray(0, jnp.int64)))
            return acc
        return f

    def mk_embed(n):
        @jax.jit
        def f(variables):
            cap = model.bind(variables).cap_decoder

            def body(i, state):
                tok, acc = state
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), i)
                return tok, acc + jnp.sum(x.astype(jnp.float32))
            tok0 = jnp.full((B,), 101, jnp.int32)
            _, acc = jax.lax.fori_loop(0, n, body, (tok0, jnp.asarray(0.0)))
            return acc
        return f

    def mk_cache(n):
        @jax.jit
        def f(caches):
            def body(i, state):
                caches, acc = state
                new = []
                for c in caches:
                    k1 = jnp.full((B, 1) + c["k"].shape[2:],
                                  (acc % 7).astype(jnp.float32) * 1e-3, c["k"].dtype)
                    k = jax.lax.dynamic_update_slice_in_dim(c["k"], k1, i % MAX_LEN, axis=1)
                    v = jax.lax.dynamic_update_slice_in_dim(c["v"], k1, i % MAX_LEN, axis=1)
                    new.append({**c, "k": k, "v": v})
                acc = acc + jnp.sum(new[0]["k"][0, 0, 0, 0].astype(jnp.float32))
                return tuple(new), acc
            _, acc = jax.lax.fori_loop(0, n, body, (caches, jnp.asarray(0.0)))
            return acc
        return f

    t_empty = slope("empty loop (per-iteration overhead)", mk_empty, jnp.asarray(0, jnp.int32))
    t_full = slope("full step (3 layers+gen+argmax+embed)", mk_full, variables, caches, mem_mask)
    t_layers = slope("3-layer decode_step", mk_layers, variables, caches)
    t_one = slope("single-layer decode_step", mk_one_layer, variables, caches)
    t_gen = slope("generator matmul + argmax", mk_gen, variables)
    t_emb = slope("token embed + positional", mk_embed, variables)
    t_cache = slope("cache dynamic_update x3 layers", mk_cache, caches)
    print("-" * 58)
    print(f"{'sum of pieces (layers+gen+embed)':44s} {t_layers + t_gen + t_emb:8.3f}")
    print(f"{'full - pieces':44s} {t_full - t_layers - t_gen - t_emb:8.3f}")


if __name__ == "__main__":
    main()
