"""Current train-step decomposition (post fused-loss + rbg-dropout):
full step vs fwd-only vs fwd+bwd vs optimizer-only, dropout on/off, B sweep.
Chained (pipelined) timing — steps depend on state, matching production."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.config import TrainConfig
from vct_tpu.train.optimizers import build_optimizer
from vct_tpu.train.state import make_train_state
from vct_tpu.train.step import make_train_step

T, VOCAB, S = 12, 30522, 32


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)

    for B in (64, 256, 512):
        feats, masks, caps, cap_mask = _batch(B, T, S, 512, VOCAB)
        variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                               cap_mask, method=MMT4Caption.caption_loss)
        batch = {"feats": feats, "masks": masks, "token_ids": caps,
                 "token_mask": cap_mask}
        optimizer = build_optimizer(TrainConfig(), variables["params"])

        # full production step (dropout on) — the step donates its state, so
        # hand it a copy and keep `variables` alive for the later sections
        state = make_train_state(jax.tree_util.tree_map(jnp.copy, variables),
                                 optimizer)
        step = make_train_step(model, optimizer, "caption")
        for _ in range(3):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        iters = 16
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        dt_full = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} full step           {dt_full*1000:8.2f} ms "
              f"{B/dt_full:8.0f} samples/s", flush=True)

        # fwd-only (deterministic) loss
        @jax.jit
        def fwd(params):
            v = {"params": params, "buffers": variables["buffers"]}
            return model.apply(v, feats, masks, caps, cap_mask,
                               deterministic=True,
                               method=MMT4Caption.caption_loss)
        p = variables["params"]
        np.asarray(fwd(p))
        t0 = time.perf_counter()
        out = 0.0
        for _ in range(iters):
            out = fwd(p)
        np.asarray(out)
        dt_fwd = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} fwd only (det)      {dt_fwd*1000:8.2f} ms", flush=True)

        # fwd+bwd (deterministic, no optimizer)
        @jax.jit
        def fwdbwd(params):
            def lf(p):
                v = {"params": p, "buffers": variables["buffers"]}
                return model.apply(v, feats, masks, caps, cap_mask,
                                   deterministic=True,
                                   method=MMT4Caption.caption_loss)
            l, g = jax.value_and_grad(lf)(params)
            return l, g
        np.asarray(fwdbwd(p)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwdbwd(p)
        np.asarray(out[0])
        dt_fb = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} fwd+bwd (det)       {dt_fb*1000:8.2f} ms", flush=True)

        # fwd+bwd with dropout (rng from counter)
        @jax.jit
        def fwdbwd_do(params, key):
            def lf(p):
                v = {"params": p, "buffers": variables["buffers"]}
                return model.apply(v, feats, masks, caps, cap_mask,
                                   deterministic=False,
                                   rngs={"dropout": key},
                                   method=MMT4Caption.caption_loss)
            return jax.value_and_grad(lf)(params)
        key = jax.random.PRNGKey(1)
        np.asarray(fwdbwd_do(p, key)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwdbwd_do(p, key)
        np.asarray(out[0])
        dt_fbd = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} fwd+bwd (dropout)   {dt_fbd*1000:8.2f} ms", flush=True)

        # optimizer update alone (grads = params scaled)
        _, grads = jax.jit(fwdbwd)(p)
        opt_state = optimizer.init(p)

        @jax.jit
        def opt_only(p, os, g):
            updates, os2 = optimizer.update(g, os, p)
            import optax
            return optax.apply_updates(p, updates), os2
        p2, os2 = opt_only(p, opt_state, grads)
        np.asarray(jax.tree_util.tree_leaves(p2)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            p2, os2 = opt_only(p2, os2, grads)
        np.asarray(jax.tree_util.tree_leaves(p2)[0])
        dt_opt = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} optimizer only      {dt_opt*1000:8.2f} ms", flush=True)
        del feats, masks, caps, cap_mask, variables, state


if __name__ == "__main__":
    main()
