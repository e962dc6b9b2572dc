"""Follow-up: isolate the 1.2 ms/step gap — mem-bias cross-attention vs none,
and intra-layer pieces."""
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
    encode = jax.jit(lambda v, f, m: model.apply(v, f, m, method=MMT4Caption.encode))
    memory, mem_mask, _ = encode(variables, feats, masks)
    caches = model.apply(variables, B, MAX_LEN, memory, method=MMT4Caption.init_cache)
    e = model.config.embed_dim

    def mk_layers(bias_mode):
        def make(n):
            @jax.jit
            def f(variables, caches, mem_mask):
                cap = model.bind(variables).cap_decoder
                mb = padding_bias(mem_mask) if bias_mode == "inside" else None
                mb_out = padding_bias(mem_mask) if bias_mode == "hoisted" else None
                def body(i, state):
                    x, caches = state
                    bias = mb if bias_mode == "inside" else mb_out
                    out, caches, _ = cap.decoder.decode_step(x, caches, i % (MAX_LEN - 1), bias)
                    return out.astype(jnp.bfloat16), caches
                x0 = jnp.zeros((B, 1, e), jnp.bfloat16)
                x, _ = jax.lax.fori_loop(0, n, body, (x0, caches))
                return jnp.sum(x.astype(jnp.float32))
            return f
        return make

    def mk_full_tok(n):
        # the REAL greedy body: embed(tok) -> layers -> generator -> argmax
        @jax.jit
        def f(variables, caches, mem_mask):
            cap = model.bind(variables).cap_decoder
            def body(i, state):
                tok, caches = state
                idx = i % (MAX_LEN - 1)
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
                out, caches, _ = cap.decoder.decode_step(x, caches, idx, padding_bias(mem_mask))
                logits = cap.generator(out[:, 0])
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    def mk_full_nobias(n):
        @jax.jit
        def f(variables, caches):
            cap = model.bind(variables).cap_decoder
            def body(i, state):
                tok, caches = state
                idx = i % (MAX_LEN - 1)
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
                out, caches, _ = cap.decoder.decode_step(x, caches, idx, None)
                logits = cap.generator(out[:, 0])
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    def mk_gen_from_tok(n):
        # generator consuming a value that CHANGES per iteration (like real)
        @jax.jit
        def f(variables):
            cap = model.bind(variables).cap_decoder
            def body(i, state):
                tok, acc = state
                x = cap.embed(tok[:, None])
                logits = cap.generator(x[:, 0])
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, acc + tok[0]
            tok0 = jnp.full((B,), 101, jnp.int32)
            _, acc = jax.lax.fori_loop(0, n, body, (tok0, jnp.asarray(0, jnp.int32)))
            return acc
        return f

    slope("layers, mem bias None", mk_layers("none"), variables, caches, mem_mask)
    slope("layers, mem bias inside body", mk_layers("inside"), variables, caches, mem_mask)
    slope("layers, mem bias hoisted", mk_layers("hoisted"), variables, caches, mem_mask)
    slope("REAL body (embed+layers+gen+argmax, bias)", mk_full_tok, variables, caches, mem_mask)
    slope("REAL body without bias", mk_full_nobias, variables, caches)
    slope("embed+generator+argmax (tok-coupled)", mk_gen_from_tok, variables)


if __name__ == "__main__":
    main()
