"""Why does generator+argmax cost 1.4ms in the real loop but 0.3ms alone?
Variants: carry caches (unused), vary vocab, split matmul/argmax."""
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

    def mk_gen(carry_caches, do_argmax=True, touch_cache=False):
        def make(n):
            @jax.jit
            def f(variables, caches):
                cap = model.bind(variables).cap_decoder
                def body(i, state):
                    if carry_caches:
                        tok, caches = state
                    else:
                        tok = state
                    x = cap.positional_encoding.at_position(cap.embed(tok[:, None]), i % 29)
                    logits = cap.generator(x[:, 0])
                    if do_argmax:
                        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    else:
                        tok = jnp.sum(logits, axis=-1).astype(jnp.int32) % VOCAB
                    if carry_caches:
                        if touch_cache:
                            c0 = caches[0]
                            k1 = x.reshape(B, 1, 8, 96).astype(c0["k"].dtype)
                            k = jax.lax.dynamic_update_slice_in_dim(c0["k"], k1, i % MAX_LEN, axis=1)
                            caches = ({**c0, "k": k},) + caches[1:]
                        return tok, caches
                    return tok
                tok0 = jnp.full((B,), 101, jnp.int32)
                if carry_caches:
                    tok, _ = jax.lax.fori_loop(0, n, body, (tok0, caches))
                else:
                    tok = jax.lax.fori_loop(0, n, body, tok0)
                return jnp.sum(tok)
            return f
        return make

    slope("gen+argmax, no cache carry", mk_gen(False), variables, caches0)
    slope("gen+argmax, caches carried UNUSED", mk_gen(True), variables, caches0)
    slope("gen+argmax, caches carried + 1 update", mk_gen(True, touch_cache=True), variables, caches0)
    slope("gen+SUM (no argmax), no cache carry", mk_gen(False, do_argmax=False), variables, caches0)
    slope("gen+SUM, caches carried UNUSED", mk_gen(True, do_argmax=False), variables, caches0)

if __name__ == "__main__":
    main()
