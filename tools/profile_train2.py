"""Follow-up train profiling: (1) what does dropout actually cost — mask
generation vs the rest; (2) fused-loss block_v / unroll sweep."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption

T, VOCAB, S = 12, 30522, 32


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:58s} {dt*1000:8.2f} ms")
    return dt


def bernoulli_cost(B):
    """All the bernoulli masks one dropout train step draws, alone."""
    shapes = (
        [(B, 8, 31, 31)] * 3 + [(B, 8, 31, 13)] * 3 + [(B, 8, 13, 13)]  # attn
        + [(B, 31, 2048)] * 3 + [(B, 13, 2048)]                          # ffn
        + [(B, 31, 768)] * 7 + [(B, 13, 768)] * 3                        # resid/emb
    )

    @jax.jit
    def draw(key):
        keys = jax.random.split(key, len(shapes))
        return [jax.random.bernoulli(k, 0.7, s) for k, s in zip(keys, shapes)]

    n = sum(int(np.prod(s)) for s in shapes)
    dt = timeit(f"B={B} bernoulli x{len(shapes)} ({n/1e6:.0f}M draws)",
                draw, jax.random.PRNGKey(0))
    return dt


def step_with_dropout_rate(B, rate, feats, masks, caps, cap_mask):
    import dataclasses
    model = _flagship(dtype=jnp.bfloat16)
    cfg = dataclasses.replace(model.config, dropout=rate)
    model = MMT4Caption(cfg, model.tpu, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                           method=MMT4Caption.caption_loss)
    opt = optax.adam(1e-4)
    opt_state = opt.init(variables["params"])

    def lf(params, key):
        v = {"params": params, "buffers": variables["buffers"]}
        return model.apply(v, feats, masks, caps, cap_mask, deterministic=False,
                           rngs={"dropout": key}, method=MMT4Caption.caption_loss)

    @jax.jit
    def step(params, opt_state, key):
        key, sub = jax.random.split(key)
        loss, grads = jax.value_and_grad(lf)(params, sub)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, key, loss

    p, o, k = variables["params"], opt_state, jax.random.PRNGKey(1)
    p, o, k, _ = step(p, o, k)

    def run():
        nonlocal p, o, k
        p, o, k, loss = step(p, o, k)
        return loss

    return run


def fused_loss_sweep(B):
    from vct_tpu.ops.fused_loss import linear_sce_parts

    n, e = B * 31, 768
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, e)).astype(np.float32), jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((e, VOCAB)).astype(np.float32) * 0.02)
    bg = jnp.zeros((VOCAB,), jnp.float32)
    labels = jnp.asarray(rng.integers(0, VOCAB, (n,)).astype(np.int32))
    keep = jnp.ones((n,), jnp.float32)
    m = jnp.ones((n,), jnp.float32)

    for bv in (1024, 2048, 4096, 8192):
        @jax.jit
        def g(x, wg, bg, _bv=bv):
            def loss(x, wg, bg):
                c, cn, r, rn = linear_sce_parts(
                    x, wg, bg, labels, keep, m, jnp.bfloat16, _bv, True)
                return c / cn + r / rn
            return jax.grad(loss, argnums=(0, 1, 2))(x, wg, bg)

        timeit(f"B={B} fused linear+SCE grad block_v={bv}", g, x, wg, bg)

    # unfused equivalent for the same shapes
    @jax.jit
    def g_unfused(x, wg, bg):
        def loss(x, wg, bg):
            from vct_tpu.models.losses import sce_loss_parts
            logits = (jnp.dot(x, wg.astype(jnp.bfloat16))
                      + bg.astype(jnp.bfloat16))
            c, cn, r, rn = sce_loss_parts(logits, labels, ignore_index=0)
            return c / cn + r / rn
        return jax.grad(loss, argnums=(0, 1, 2))(x, wg, bg)

    timeit(f"B={B} unfused linear+SCE grad", g_unfused, x, wg, bg)


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    for B in (64, 256):
        feats, masks, caps, cap_mask = _batch(B, T, S, 512, VOCAB)
        bernoulli_cost(B)
        for rate in (0.3, 0.0):
            run = step_with_dropout_rate(B, rate, feats, masks, caps, cap_mask)
            dt = timeit(f"B={B} grad+adam dropout rate={rate} det=False", run)
            print(f"    -> {B/dt:9.0f} samples/s")
        fused_loss_sweep(B)


if __name__ == "__main__":
    main()
