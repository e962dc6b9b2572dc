"""fused_layers_step (one launch for the whole decoder stack) vs the
per-layer kernels: full greedy loop at B=1024, double-buffered steady state,
block_b sweep."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode import make_auto_greedy_fn, pipelined_map
from vct_tpu.decode_fast import extract_fast_weights, pick_block_b
from vct_tpu.ops.pallas_decode import fused_layers_step, fused_norm_generator_argmax

B, T, MAX_LEN, VOCAB = 12, 12, 30, 30522
B = 1024
STEPS = MAX_LEN - 1


def steady(name, launch, iters=12):
    np.asarray(launch(0))
    t0 = time.perf_counter()
    for _ in pipelined_map(launch, range(iters)):
        pass
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:7.1f} ms/batch {B/dt:8.0f} caps/s", flush=True)


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)

    greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    steady("per-layer kernels (prod)", lambda _i: greedy(variables, feats, masks)[0])

    fw = extract_fast_weights(model, variables)
    heads, e, dt_ = fw["heads"], model.config.embed_dim, model.dtype
    nl = len(fw["layers"])
    stacked = {k: jnp.stack([lw[k] for lw in fw["layers"]])
               for k in fw["layers"][0]}
    emb, pe = fw["emb"], fw["pe"]
    l_pad = (MAX_LEN + 7) // 8 * 8

    def make_fn(bb):
        @jax.jit
        def fn(variables, feats, masks, stacked):
            memory, mem_mask, _ = model.apply(variables, feats, masks,
                                              method=MMT4Caption.encode)
            b, tm = memory.shape[0], memory.shape[1]
            caches = model.apply(variables, b, MAX_LEN, memory,
                                 method=MMT4Caption.init_cache)
            tm_pad = (tm + 7) // 8 * 8
            cks, cvs = [], []
            for c in caches:
                ck = c["ck"].reshape(b, tm, e).astype(dt_).transpose(1, 0, 2)
                cv = c["cv"].reshape(b, tm, e).astype(dt_).transpose(1, 0, 2)
                cks.append(jnp.pad(ck, ((0, tm_pad - tm), (0, 0), (0, 0))))
                cvs.append(jnp.pad(cv, ((0, tm_pad - tm), (0, 0), (0, 0))))
            cks, cvs = jnp.stack(cks), jnp.stack(cvs)
            mem_bias = jnp.where(mem_mask, -1e30, 0.0).astype(jnp.float32)
            mem_bias = jnp.pad(mem_bias, ((0, 0), (0, tm_pad - tm)),
                               constant_values=-1e30)
            ks = jnp.zeros((nl, l_pad, b, e), dt_)
            vs = jnp.zeros((nl, l_pad, b, e), dt_)
            tokens = jnp.full((b, MAX_LEN), 0, jnp.int32).at[:, 0].set(101)
            done = jnp.zeros((b,), bool)

            def cond(s):
                i, _, done, _, _ = s
                return jnp.logical_and(i < STEPS, ~jnp.all(done))

            def body(s):
                i, tokens, done, ks, vs = s
                cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)[:, 0]
                x = jnp.take(emb, cur, axis=0)
                x = jnp.where((cur == 0)[:, None], 0.0, x)
                x = (x + jax.lax.dynamic_slice_in_dim(pe, i, 1, axis=0)).astype(dt_)
                x, ks, vs = fused_layers_step(x, ks, vs, cks, cvs, mem_bias,
                                              stacked, i, heads=heads, block_b=bb)
                nxt = fused_norm_generator_argmax(
                    x, fw["norm_s"], fw["norm_b"], fw["wg"], fw["bg"])
                tokens = jax.lax.dynamic_update_slice_in_dim(
                    tokens, nxt[:, None], i + 1, axis=1)
                done = jnp.logical_or(done, nxt == -1)
                return i + 1, tokens, done, ks, vs

            _, tokens, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), tokens, done, ks, vs))
            return tokens
        return fn

    for bb in (32, 64, 128):
        try:
            fn = make_fn(bb)
            steady(f"stacked kernel block_b={bb}",
                   lambda _i: fn(variables, feats, masks, stacked))
        except Exception as ex:
            print(f"stacked block_b={bb} FAILED: {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)


if __name__ == "__main__":
    main()
