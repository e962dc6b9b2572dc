"""Where does the train step spend its time?  Variants isolate the loss
machinery (full SCE vs CE-only vs raw logit-sum vs no-generator) and the
batch-size scaling, to size the headroom for a fused linear+loss kernel.

Run on the real TPU (sequentially -- one TPU process at a time).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption

T, VOCAB = 12, 30522


def timeit(name, fn, *args, iters=20):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:58s} {dt*1000:8.2f} ms")
    return dt


def loss_variant(model, variables, feats, masks, caps, cap_mask, kind):
    """kind: sce (fused default) | sce_unfused | ce_only | logit_sum | no_gen"""
    if kind == "sce_unfused":
        import dataclasses
        from vct_tpu.models.mmt4caption import MMT4Caption as M
        model = M(model.config, dataclasses.replace(model.tpu, use_fused_loss=False),
                  dtype=model.dtype)
        kind = "sce"

    def fn(params):
        v = {"params": params, "buffers": variables["buffers"]}
        if kind == "sce":
            return model.apply(
                v, feats, masks, caps, cap_mask, deterministic=True,
                method=MMT4Caption.caption_loss)
        m = model.bind(v)
        memory, mem_mask, _ = m.encode(feats, masks)
        cap = m.cap_decoder
        tgt_input = caps[:, :-1]
        from vct_tpu.ops.attention import causal_bias, combine_bias, padding_bias
        tgt_bias = combine_bias(causal_bias(tgt_input.shape[1]),
                                padding_bias(cap_mask[:, :-1]))
        mem_bias = padding_bias(mem_mask) if mem_mask is not None else None
        x = cap.positional_encoding(cap.embed(tgt_input), deterministic=True)
        outs, _ = cap.decoder(x, memory, tgt_bias, mem_bias, deterministic=True)
        if kind == "no_gen":
            return jnp.sum(outs.astype(jnp.float32) ** 2)
        logits = cap.generator(outs)
        flat = logits.reshape(-1, VOCAB).astype(jnp.float32)
        if kind == "logit_sum":
            return jnp.sum(flat ** 2) * 1e-6
        labels = caps[:, 1:].reshape(-1)
        logp = jax.nn.log_softmax(flat, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        keep = (labels != 0).astype(jnp.float32)
        return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)
    return fn


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)

    for B in (64, 256):
        feats, masks, caps, cap_mask = _batch(B, T, 32, 512, VOCAB)
        variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                               cap_mask, method=MMT4Caption.caption_loss)
        params = variables["params"]
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)

        # the REAL train step (dropout on, donation, rng split, metrics)
        from vct_tpu.config import TrainConfig
        from vct_tpu.train.optimizers import build_optimizer
        from vct_tpu.train.state import make_train_state
        from vct_tpu.train.step import make_train_step

        optr = build_optimizer(TrainConfig(), variables["params"])
        # the real step donates its state; give it a private copy so the
        # shared `variables` stay alive for the later variants
        state = make_train_state(jax.tree.map(jnp.copy, variables), optr)
        real_step = make_train_step(model, optr, "caption")
        tbatch = {"feats": feats, "masks": masks, "token_ids": caps,
                  "token_mask": cap_mask}
        state, m0 = real_step(state, tbatch)  # compile
        np.asarray(m0["loss"])
        t0 = time.perf_counter()
        for _ in range(20):
            state, m0 = real_step(state, tbatch)
        np.asarray(m0["loss"])
        dt = (time.perf_counter() - t0) / 20
        print(f"{'B=%d REAL train step (dropout on)' % B:58s} {dt*1000:8.2f} ms")
        print(f"    -> {B/dt:9.0f} samples/s")

        # handrolled grad+adam WITH dropout rngs (no donation/state machinery)
        def make_dropout_loss():
            def fn(params, key):
                v = {"params": params, "buffers": variables["buffers"]}
                return model.apply(
                    v, feats, masks, caps, cap_mask, deterministic=False,
                    rngs={"dropout": key}, method=MMT4Caption.caption_loss)
            return fn

        lfd = make_dropout_loss()
        opt = optax.adam(1e-4)
        opt_state2 = opt.init(variables["params"])

        @jax.jit
        def step_d(params, opt_state, key):
            key, sub = jax.random.split(key)
            loss, grads = jax.value_and_grad(lfd)(params, sub)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, key, loss

        key = jax.random.PRNGKey(0)
        p2, o2, key, _ = step_d(variables["params"], opt_state2, key)
        np.asarray(_)
        t0 = time.perf_counter()
        for _ in range(20):
            p2, o2, key, l2 = step_d(p2, o2, key)
        np.asarray(l2)
        dt = (time.perf_counter() - t0) / 20
        print(f"{'B=%d grad+adam sce dropout-on' % B:58s} {dt*1000:8.2f} ms")
        print(f"    -> {B/dt:9.0f} samples/s")

        for kind in ("sce", "sce_unfused", "ce_only", "logit_sum", "no_gen"):
            lf = loss_variant(model, variables, feats, masks, caps, cap_mask, kind)

            @jax.jit
            def step(params, opt_state):
                loss, grads = jax.value_and_grad(lf)(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            dt = timeit(f"B={B} grad+adam {kind}", step, params, opt_state)
            print(f"    -> {B/dt:9.0f} samples/s")

        fwd = jax.jit(loss_variant(model, variables, feats, masks, caps, cap_mask, "sce"))
        timeit(f"B={B} forward-only sce", fwd, params)


if __name__ == "__main__":
    main()
