"""Is the decode loop per-iteration/per-op overhead-bound?  Measures an
empty while body, glue pieces, and K-step-unrolled bodies (glue and full)."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode_fast import extract_fast_weights, pick_block_b
from vct_tpu.ops.pallas_decode import fused_layer_step, fused_norm_generator_argmax

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522
STEPS = MAX_LEN - 1  # 29


def timeit(name, fn, *args, iters=8):
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:7.1f} ms/batch {dt/STEPS*1000:6.2f} ms/step "
          f"{B/dt:8.0f} caps/s", flush=True)
    return dt


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)
    fw = extract_fast_weights(model, variables)
    heads = fw["heads"]
    e = model.config.embed_dim
    dt_ = model.dtype
    bb = pick_block_b(B)

    memory, mem_mask, _ = jax.jit(lambda v, f, m: model.apply(
        v, f, m, method=MMT4Caption.encode))(variables, feats, masks)
    tm = memory.shape[1]
    caches = model.apply(variables, B, MAX_LEN, memory,
                         method=MMT4Caption.init_cache)
    tm_pad = (tm + 7) // 8 * 8
    cross = []
    for c in caches:
        ck = c["ck"].reshape(B, tm, e).astype(dt_).transpose(1, 0, 2)
        cv = c["cv"].reshape(B, tm, e).astype(dt_).transpose(1, 0, 2)
        ck = jnp.pad(ck, ((0, tm_pad - tm), (0, 0), (0, 0)))
        cv = jnp.pad(cv, ((0, tm_pad - tm), (0, 0), (0, 0)))
        cross.append((ck, cv))
    mem_bias = jnp.pad(jnp.zeros((B, tm), jnp.float32),
                       ((0, 0), (0, tm_pad - tm)), constant_values=-1e30)
    l_pad = (MAX_LEN + 7) // 8 * 8
    emb, pe = fw["emb"], fw["pe"]

    # 1. empty body
    @jax.jit
    def empty(tokens):
        def body(state):
            i, tok = state
            return i + 1, tok
        _, tok = jax.lax.while_loop(lambda s: s[0] < STEPS, body,
                                    (jnp.asarray(0, jnp.int32), tokens))
        return tok

    tokens0 = jnp.full((B, MAX_LEN), 0, jnp.int32).at[:, 0].set(101)
    timeit("empty while body", empty, tokens0)

    # 2. token write only
    @jax.jit
    def tokwrite(tokens):
        def body(state):
            i, tok = state
            cur = jax.lax.dynamic_slice_in_dim(tok, i, 1, axis=1)[:, 0]
            tok = jax.lax.dynamic_update_slice_in_dim(
                tok, (cur + 1)[:, None], i + 1, axis=1)
            return i + 1, tok
        _, tok = jax.lax.while_loop(lambda s: s[0] < STEPS, body,
                                    (jnp.asarray(0, jnp.int32), tokens))
        return tok

    timeit("token slice+write only", tokwrite, tokens0)

    # 3. + embedding gather + pe
    @jax.jit
    def glue(tokens):
        def body(state):
            i, tok = state
            cur = jax.lax.dynamic_slice_in_dim(tok, i, 1, axis=1)[:, 0]
            x = jnp.take(emb, cur, axis=0)
            x = jnp.where((cur == 0)[:, None], 0.0, x)
            x = (x + jax.lax.dynamic_slice_in_dim(pe, i, 1, axis=0)).astype(dt_)
            nxt = (jnp.sum(x.astype(jnp.float32), axis=-1) > 0).astype(jnp.int32)
            tok = jax.lax.dynamic_update_slice_in_dim(
                tok, nxt[:, None], i + 1, axis=1)
            return i + 1, tok
        _, tok = jax.lax.while_loop(lambda s: s[0] < STEPS, body,
                                    (jnp.asarray(0, jnp.int32), tokens))
        return tok

    timeit("glue (emb+pe+write)", glue, tokens0)

    # 4. full body, K steps unrolled per while iteration
    def make_full(k):
        @jax.jit
        def fn(tokens):
            kv = tuple((jnp.zeros((l_pad, B, e), dt_),
                        jnp.zeros((l_pad, B, e), dt_)) for _ in fw["layers"])
            done = jnp.zeros((B,), bool)

            def one_step(i, tokens, done, kv):
                cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)[:, 0]
                x = jnp.take(emb, cur, axis=0)
                x = jnp.where((cur == 0)[:, None], 0.0, x)
                x = (x + jax.lax.dynamic_slice_in_dim(pe, i, 1, axis=0)).astype(dt_)
                new_kv = []
                for (kc, vc), (ck, cv), w in zip(kv, cross, fw["layers"]):
                    x, kc, vc = fused_layer_step(x, kc, vc, ck, cv, mem_bias,
                                                 w, i, heads=heads, block_b=bb)
                    new_kv.append((kc, vc))
                nxt = fused_norm_generator_argmax(
                    x, fw["norm_s"], fw["norm_b"], fw["wg"], fw["bg"])
                tokens = jax.lax.dynamic_update_slice_in_dim(
                    tokens, nxt[:, None], i + 1, axis=1)
                done = jnp.logical_or(done, nxt == 102)
                return tokens, done, tuple(new_kv)

            def body(state):
                i, tokens, done, kv = state
                for j in range(k):
                    tokens, done, kv = one_step(i + j, tokens, done, kv)
                return i + k, tokens, done, kv

            def cond(state):
                i, _, done, _ = state
                return jnp.logical_and(i < STEPS, ~jnp.all(done))

            # STEPS=29: pad the unrolled loop to a multiple of k by letting the
            # last chunk overrun into clamped positions (write at min(i, 28))
            # -- for profiling, just run ceil and clamp indices
            n_chunks = -(-STEPS // k)

            def body_clamped(state):
                i, tokens, done, kv = state
                for j in range(k):
                    idx = jnp.minimum(i + j, STEPS - 1)
                    tokens, done, kv = one_step(idx, tokens, done, kv)
                return i + k, tokens, done, kv

            state = (jnp.asarray(0, jnp.int32), tokens, done, kv)
            _, tokens, _, _ = jax.lax.while_loop(
                lambda s: jnp.logical_and(s[0] < n_chunks * k,
                                          ~jnp.all(s[2])),
                body_clamped, state)
            return tokens

        return fn

    for k in (1, 2, 4, 8):
        timeit(f"full fused, unroll K={k}", make_full(k), tokens0)


if __name__ == "__main__":
    main()
