"""Decompose the fused decode step's 2.4 ms/token: glue-only loop, per-layer
kernel cost in-loop, generator kernel cost in-loop. Run alone on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode_fast import extract_fast_weights, pick_block_b
from vct_tpu.ops.pallas_decode import fused_layer_step, fused_norm_generator_argmax

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522


def build(model, variables, *, n_layers, with_gen, block_b):
    fw = extract_fast_weights(model, variables)
    heads = fw["heads"]
    e = model.config.embed_dim
    dt = model.dtype

    @jax.jit
    def fn(variables, feats, masks):
        memory, mem_mask, _ = model.apply(variables, list(feats), list(masks),
                                          method=MMT4Caption.encode)
        b, tm = memory.shape[0], memory.shape[1]
        caches = model.apply(variables, b, MAX_LEN, memory,
                             method=MMT4Caption.init_cache)
        tm_pad = (tm + 7) // 8 * 8
        cross = []
        for c in caches:
            ck = c["ck"].reshape(b, tm, e).astype(dt).transpose(1, 0, 2)
            cv = c["cv"].reshape(b, tm, e).astype(dt).transpose(1, 0, 2)
            if tm_pad != tm:
                ck = jnp.pad(ck, ((0, tm_pad - tm), (0, 0), (0, 0)))
                cv = jnp.pad(cv, ((0, tm_pad - tm), (0, 0), (0, 0)))
            cross.append((ck, cv))
        mem_bias = jnp.zeros((b, tm), jnp.float32)
        if tm_pad != tm:
            mem_bias = jnp.pad(mem_bias, ((0, 0), (0, tm_pad - tm)),
                               constant_values=-1e30)
        l_pad = (MAX_LEN + 7) // 8 * 8
        kv = tuple((jnp.zeros((l_pad, b, e), dt), jnp.zeros((l_pad, b, e), dt))
                   for _ in fw["layers"][:n_layers])
        tokens = jnp.full((b, MAX_LEN), 0, jnp.int32).at[:, 0].set(101)
        emb, pe = fw["emb"], fw["pe"]

        def body(state):
            i, tokens, kv = state
            cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)[:, 0]
            x = jnp.take(emb, cur, axis=0)
            x = jnp.where((cur == 0)[:, None], 0.0, x)
            x = (x + jax.lax.dynamic_slice_in_dim(pe, i, 1, axis=0)).astype(dt)
            new_kv = []
            for (k, v), (ck, cv), w in zip(kv, cross[:n_layers],
                                           fw["layers"][:n_layers]):
                x, k, v = fused_layer_step(x, k, v, ck, cv, mem_bias, w, i,
                                           heads=heads, block_b=block_b)
                new_kv.append((k, v))
            if with_gen:
                nxt = fused_norm_generator_argmax(
                    x, fw["norm_s"], fw["norm_b"], fw["wg"], fw["bg"])
            else:
                nxt = (jnp.sum(x.astype(jnp.float32), axis=-1) > 0).astype(jnp.int32) + 5
            tokens = jax.lax.dynamic_update_slice_in_dim(
                tokens, nxt[:, None], i + 1, axis=1)
            return i + 1, tokens, tuple(new_kv)

        def cond(state):
            return state[0] < MAX_LEN - 1

        _, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), tokens, kv))
        return tokens

    return fn


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)
    bb = pick_block_b(B)

    for name, n_layers, with_gen in (
        ("glue only (0 layers, no gen)", 0, False),
        ("1 layer, no gen", 1, False),
        ("2 layers, no gen", 2, False),
        ("3 layers, no gen", 3, False),
        ("gen only (0 layers + gen)", 0, True),
        ("full (3 layers + gen)", 3, True),
    ):
        fn = build(model, variables, n_layers=n_layers, with_gen=with_gen,
                   block_b=bb)
        np.asarray(fn(variables, feats, masks))
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            tok = np.asarray(fn(variables, feats, masks))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1000:7.1f} ms/batch "
              f"{dt/(MAX_LEN-1)*1000:6.2f} ms/step  {B/dt:8.0f} caps/s")


if __name__ == "__main__":
    main()
