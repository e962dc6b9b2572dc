"""Subtractive profiling of the REAL greedy body + while-vs-fori comparison."""
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
    print(f"{name:52s} {(d2-d1)/(N2-N1)*1000:8.3f} ms/iter")

def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)
    encode = jax.jit(lambda v, f, m: model.apply(v, f, m, method=MMT4Caption.encode))
    memory, mem_mask, _ = encode(variables, feats, masks)
    caches0 = model.apply(variables, B, MAX_LEN, memory, method=MMT4Caption.init_cache)

    def real_body(cap, mb, gen=True):
        def body(i, state):
            tok, caches = state
            idx = i % (MAX_LEN - 1)
            x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
            out, caches, _ = cap.decoder.decode_step(x, caches, idx, mb)
            if gen:
                logits = cap.generator(out[:, 0])
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                tok = (jnp.sum(out[:, 0], axis=-1) * 0).astype(jnp.int32) + 101
            return tok, caches
        return body

    def mk_fori(n):
        @jax.jit
        def f(variables, caches, mem_mask):
            cap = model.bind(variables).cap_decoder
            body = real_body(cap, padding_bias(mem_mask))
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    def mk_while(n):
        # replicate greedy_generate's loop structure: cond checks done-flags
        @jax.jit
        def f(variables, caches, mem_mask):
            cap = model.bind(variables).cap_decoder
            inner = real_body(cap, padding_bias(mem_mask))
            def cond(state):
                i, tok, done, caches = state
                return jnp.logical_and(i < n, ~jnp.all(done))
            def body(state):
                i, tok, done, caches = state
                tok, caches = inner(i, (tok, caches))
                done = jnp.logical_or(done, tok == -1)
                return i + 1, tok, done, caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            done0 = jnp.zeros((B,), bool)
            _, tok, _, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), tok0, done0, caches))
            return jnp.sum(tok)
        return f

    def mk_nogen(n):
        @jax.jit
        def f(variables, caches, mem_mask):
            cap = model.bind(variables).cap_decoder
            body = real_body(cap, padding_bias(mem_mask), gen=False)
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    def mk_fp32gen(n):
        # generator input cast fp32 (what the final stack norm emits)
        @jax.jit
        def f(variables, caches, mem_mask):
            cap = model.bind(variables).cap_decoder
            def body(i, state):
                tok, caches = state
                idx = i % (MAX_LEN - 1)
                x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), idx)
                out, caches, _ = cap.decoder.decode_step(x, caches, idx, padding_bias(mem_mask))
                logits = cap.generator(out[:, 0].astype(jnp.bfloat16))
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), caches
            tok0 = jnp.full((B,), 101, jnp.int32)
            tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
            return jnp.sum(tok)
        return f

    slope("REAL fori (baseline)", mk_fori, variables, caches0, mem_mask)
    slope("REAL while+done-cond (greedy structure)", mk_while, variables, caches0, mem_mask)
    slope("REAL minus generator/argmax", mk_nogen, variables, caches0, mem_mask)
    slope("REAL with generator input pre-cast bf16", mk_fp32gen, variables, caches0, mem_mask)

if __name__ == "__main__":
    main()
