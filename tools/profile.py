"""Parameterized profiler for the flagship model on the real TPU.

Collapses the round-2 scratch experiments (profile_decode2..12,
profile_train2..4 — findings live in their commits and in the kernel
docstrings) into one entry point:

  python tools/profile.py decode-sweep        # steady-state caps/s vs batch
  python tools/profile.py train               # train-step decomposition
  python tools/profile.py latency             # B=1 sync vs pipelined split
  python tools/profile.py trace --out /tmp/tr # jax.profiler trace of one
                                              # train step + one decode batch

Run from the repo root. Measured lessons already baked into the framework:
a fixed ~35-41 ms per-synchronous-fetch relay cost (hidden by
decode.pipelined_map), fused whole-stack decode kernels (ops/pallas_decode),
rbg dropout + fused LM-head loss in the train step.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

# Script bootstrap: Python puts THIS file's dir (tools/) at sys.path[0],
# which (a) hides the repo root the imports below need and (b) shadows the
# stdlib `profile` module for anything imported later (the round-5 suite
# poisoning). Swap it for the repo root so the documented
# `python tools/profile.py <mode>` works from any cwd.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOOLS = os.path.join(_REPO, "tools")
sys.path[:] = [p for p in sys.path
               if os.path.abspath(p or os.getcwd()) != _TOOLS]
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption

T, MAX_LEN, VOCAB, S = 12, 30, 30522, 32


def _warm():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))


def _init(model, b, s=8):
    feats, masks, caps, cap_mask = _batch(b, T, s, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                           cap_mask, method=MMT4Caption.caption_loss)
    return feats, masks, caps, cap_mask, variables


def decode_sweep(batches=(1024, 2048, 4096, 8192), iters=10):
    """Steady-state (double-buffered) production decode throughput."""
    from vct_tpu.decode import make_auto_greedy_fn, pipelined_map

    model = _flagship(dtype=jnp.bfloat16)
    greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    for b in batches:
        feats, masks, _, _, variables = _init(model, b)
        launch = lambda _i: greedy(variables, feats, masks)[0]  # noqa: E731
        np.asarray(launch(0))
        t0 = time.perf_counter()
        for _ in pipelined_map(launch, range(iters)):
            pass
        dt = (time.perf_counter() - t0) / iters
        print(f"B={b:5d} steady: {dt*1000:7.1f} ms/batch {b/dt:8.0f} caps/s",
              flush=True)
        del feats, masks, variables


def latency(iters=24):
    """B=1 fused decode: synchronous (pays a relay round trip per call) vs
    pipelined (hides it) — the difference is the transport floor."""
    from vct_tpu.decode import make_auto_greedy_fn, pipelined_map

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, _, _, variables = _init(model, 1)
    fn = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    np.asarray(fn(variables, feats, masks)[0])
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(variables, feats, masks)[0])
        lat.append(time.perf_counter() - t0)
    lat.sort()
    t0 = time.perf_counter()
    for _ in pipelined_map(lambda _i: fn(variables, feats, masks)[0],
                           range(iters)):
        pass
    piped = (time.perf_counter() - t0) / iters
    print(f"sync p50 {lat[len(lat)//2]*1000:.1f} ms  "
          f"pipelined {piped*1000:.1f} ms  "
          f"transport ~{(lat[len(lat)//2]-piped)*1000:.1f} ms")


def train(batches=(64, 256, 512), iters=16):
    """Train-step decomposition: full step / fwd / fwd+bwd / +dropout /
    optimizer-only (the round-2 profile_train3 harness)."""
    from vct_tpu.config import TrainConfig
    from vct_tpu.train.optimizers import build_optimizer
    from vct_tpu.train.state import make_train_state
    from vct_tpu.train.step import make_train_step

    model = _flagship(dtype=jnp.bfloat16)
    for b in batches:
        feats, masks, caps, cap_mask, variables = _init(model, b, S)
        batch = {"feats": feats, "masks": masks, "token_ids": caps,
                 "token_mask": cap_mask}
        optimizer = build_optimizer(TrainConfig(), variables["params"])
        state = make_train_state(jax.tree_util.tree_map(jnp.copy, variables),
                                 optimizer)
        step = make_train_step(model, optimizer, "caption")
        for _ in range(3):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        dt_full = (time.perf_counter() - t0) / iters
        print(f"B={b:4d} full step         {dt_full*1000:8.2f} ms "
              f"{b/dt_full:8.0f} samples/s", flush=True)

        p = variables["params"]

        def timed(fn, *args, label=""):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) / iters
            print(f"B={b:4d} {label:<17s} {dt*1000:8.2f} ms", flush=True)

        @jax.jit
        def fwd(params):
            v = {"params": params, "buffers": variables["buffers"]}
            return model.apply(v, feats, masks, caps, cap_mask,
                               deterministic=True,
                               method=MMT4Caption.caption_loss)

        @jax.jit
        def fwdbwd(params):
            def lf(pp):
                v = {"params": pp, "buffers": variables["buffers"]}
                return model.apply(v, feats, masks, caps, cap_mask,
                                   deterministic=True,
                                   method=MMT4Caption.caption_loss)
            return jax.value_and_grad(lf)(params)

        @jax.jit
        def fwdbwd_do(params, key):
            def lf(pp):
                v = {"params": pp, "buffers": variables["buffers"]}
                return model.apply(v, feats, masks, caps, cap_mask,
                                   deterministic=False,
                                   rngs={"dropout": key},
                                   method=MMT4Caption.caption_loss)
            return jax.value_and_grad(lf)(params)

        timed(fwd, p, label="fwd (det)")
        timed(fwdbwd, p, label="fwd+bwd (det)")
        timed(fwdbwd_do, p, jax.random.PRNGKey(1), label="fwd+bwd (dropout)")

        _, grads = fwdbwd(p)
        opt_state = optimizer.init(p)

        @jax.jit
        def opt_only(pp, os, g):
            import optax

            updates, os2 = optimizer.update(g, os, pp)
            return optax.apply_updates(pp, updates), os2

        timed(lambda: opt_only(p, opt_state, grads), label="optimizer only")
        del feats, masks, caps, cap_mask, variables, state


def loss_ab(batches=(64, 256, 512), iters=16, arm="both"):
    """A/B the Pallas fused-loss kernels (ops/pallas_loss) against the XLA
    vocab-chunk scans on the FULL production train step — the VERDICT round-3
    item #2 measurement (trace showed the scans at ~12.6 ms of a 49.8 ms
    B=256 step before the shape-aware attention fix)."""
    import dataclasses

    from vct_tpu.config import TrainConfig
    from vct_tpu.train.optimizers import build_optimizer
    from vct_tpu.train.state import make_train_state
    from vct_tpu.train.step import make_train_step

    arms = {"both": (False, True), "scan": (False,), "pallas": (True,)}[arm]
    for use_pallas in arms:
        model = _flagship(dtype=jnp.bfloat16)
        model = dataclasses.replace(
            model, tpu=dataclasses.replace(model.tpu,
                                           fused_loss_pallas=use_pallas))
        tag = "pallas" if use_pallas else "scan  "
        for b in batches:
            feats, masks, caps, cap_mask, variables = _init(model, b, S)
            batch = {"feats": feats, "masks": masks, "token_ids": caps,
                     "token_mask": cap_mask}
            optimizer = build_optimizer(TrainConfig(), variables["params"])
            state = make_train_state(
                jax.tree_util.tree_map(jnp.copy, variables), optimizer)
            step = make_train_step(model, optimizer, "caption")
            for _ in range(3):
                state, m = step(state, batch)
            loss0 = float(np.asarray(m["loss"]))
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            np.asarray(m["loss"])
            dt = (time.perf_counter() - t0) / iters
            print(f"[{tag}] B={b:4d} {dt*1000:8.2f} ms/step "
                  f"{b/dt:8.0f} samples/s  loss@3={loss0:.5f}", flush=True)
            del feats, masks, caps, cap_mask, variables, state


def latency_decomp(iters=24):
    """Pin the B=1 per-token budget by kernel-section ablation (round-3
    VERDICT #6): fused_multi_step's bisect flags ({gen, dma, patch} + the
    round-4 'layers') subtract one section at a time. end_id=-1 makes the
    greedy loop run ALL windows regardless of the garbage tokens ablated
    sections emit, so every case times the identical launch count."""
    import functools

    from vct_tpu.decode import make_auto_greedy_fn
    from vct_tpu.decode_fast import greedy_generate_multi

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, _, _, variables = _init(model, 1)

    def p50(fn):
        np.asarray(fn())  # compile + warm
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn())
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return lat[len(lat) // 2] * 1000.0

    base = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    t = {"whole-step": p50(lambda: base(variables, feats, masks)[0])}
    print(f"whole-step (default B=1 path)   p50 {t['whole-step']:7.2f} ms",
          flush=True)

    cases = [
        ("u1", 1, frozenset()),
        ("u4", 4, frozenset()),
        ("u1-patch", 1, frozenset({"patch"})),
        ("u1-gen", 1, frozenset({"gen"})),
        ("u1-gen-dma", 1, frozenset({"gen", "dma"})),
        ("u1-gen-dma-layers", 1, frozenset({"gen", "dma", "layers"})),
    ]
    for label, u, abl in cases:
        g = jax.jit(functools.partial(
            greedy_generate_multi, model, max_len=MAX_LEN, start_id=101,
            end_id=-1, unroll=u, ablate=abl))
        t[label] = p50(lambda: g(variables, feats, masks)[0])
        print(f"multi {label:<22s}      p50 {t[label]:7.2f} ms", flush=True)

    # dispatch-vs-device split: the SAME decode twice in ONE dispatch
    # (different inputs defeat CSE). t2 - t1 = one extra device decode;
    # 2*t1 - t2 = the per-dispatch relay/host glue.
    feats2 = [f + 1.0 for f in feats]

    def _one(v, f, m):
        return greedy_generate_multi(
            model, v, f, m, max_len=MAX_LEN, start_id=101, end_id=-1,
            unroll=1)[0]

    g2 = jax.jit(lambda v, fa, fb, m: _one(v, fa, m) + _one(v, fb, m))
    t["2x-one-dispatch"] = p50(lambda: g2(variables, feats, feats2, masks))
    print(f"2x decode, ONE dispatch         p50 {t['2x-one-dispatch']:7.2f} ms",
          flush=True)

    # weight-stream scaling: vocab 30522 -> 2048 cuts the generator operand
    # 47 MB -> 3 MB; any DMA-bound share of the floor must move with it
    model_sv = _flagship(vocab_size=2048, dtype=jnp.bfloat16)
    sfeats, smasks, scaps, scap_mask = _batch(1, T, 8, 512, 2048)
    svars = model_sv.init(jax.random.PRNGKey(0), sfeats, smasks, scaps,
                          scap_mask, method=MMT4Caption.caption_loss)
    gsv = jax.jit(functools.partial(
        greedy_generate_multi, model_sv, max_len=MAX_LEN, start_id=101,
        end_id=-1, unroll=1))
    t["u1-vocab2048"] = p50(lambda: gsv(svars, sfeats, smasks)[0])
    print(f"multi u1, vocab 2048            p50 {t['u1-vocab2048']:7.2f} ms",
          flush=True)

    n_tok = MAX_LEN - 1
    print("\n-- decomposition (u=1, per 29 tokens | per token) --")
    rows = [
        ("generator GEMM+argmax", t["u1"] - t["u1-gen"]),
        ("fresh-KV attention patch", t["u1"] - t["u1-patch"]),
        ("embedding-row DMA gather", t["u1-gen"] - t["u1-gen-dma"]),
        ("decoder-stack compute", t["u1-gen-dma"] - t["u1-gen-dma-layers"]),
        ("launch + weight DMA + glue floor", t["u1-gen-dma-layers"]),
    ]
    for name, ms in rows:
        print(f"{name:<34s} {ms:7.2f} ms | {ms/n_tok*1000:7.0f} us/tok")
    print(f"{'u=4 launch amortization (u1-u4)':<34s} "
          f"{t['u1'] - t['u4']:7.2f} ms")
    dev = t["2x-one-dispatch"] - t["u1"]
    print(f"{'device decode (2x minus 1x)':<34s} {dev:7.2f} ms | "
          f"{dev/n_tok*1000:7.0f} us/tok")
    print(f"{'per-dispatch relay/host glue':<34s} "
          f"{2*t['u1'] - t['2x-one-dispatch']:7.2f} ms")
    print(f"{'generator-weight DMA (dV=44MB)':<34s} "
          f"{t['u1'] - t['u1-vocab2048']:7.2f} ms")


def numerics_ab(batches=(64, 256), iters=24):
    """A/B the torch-parity numerics tax (round-4 VERDICT #5): full train
    step with the default fp32 softmax-logits + fp32 LayerNorm statistics vs
    ``tpu.fast_numerics`` (compute-dtype both). Loss printed for each arm so
    the numeric drift is visible next to the time delta."""
    from vct_tpu.config import TrainConfig
    from vct_tpu.train.optimizers import build_optimizer
    from vct_tpu.train.state import make_train_state
    from vct_tpu.train.step import make_train_step

    results = {}
    for fast in (False, True):
        model = _flagship(dtype=jnp.bfloat16,
                          tpu_overrides={"fast_numerics": fast})
        for b in batches:
            feats, masks, caps, cap_mask, variables = _init(model, b, S)
            batch = {"feats": feats, "masks": masks, "token_ids": caps,
                     "token_mask": cap_mask}
            optimizer = build_optimizer(TrainConfig(), variables["params"])
            state = make_train_state(
                jax.tree_util.tree_map(jnp.copy, variables), optimizer)
            step = make_train_step(model, optimizer, "caption")
            for _ in range(3):
                state, m = step(state, batch)
            np.asarray(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch)
            loss = float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0) / iters
            results[(fast, b)] = dt
            label = "fast_numerics" if fast else "parity (fp32) "
            print(f"B={b:4d} {label} {dt*1000:8.2f} ms "
                  f"{b/dt:8.0f} samples/s loss={loss:.4f}", flush=True)
    for b in batches:
        base, fast = results[(False, b)], results[(True, b)]
        print(f"B={b:4d} parity tax: {(base-fast)/base*100:+.1f}% "
              f"({base*1000:.2f} -> {fast*1000:.2f} ms)", flush=True)


def opt_ab(iters=32):
    """Optimizer-section A/B (round-4: the fixed ~5.7 ms optimizer is 35% of
    the B=64 reference-recipe step). Times, with production-style donation:

      prod      multi_transform(inject_hyperparams(adam)) — what the step runs
      bare-adam optax.adam alone — isolates the wrapper tax
      mu-bf16   adam with mu_dtype=bfloat16 — -2 fp32 passes of 7 on the
                first moment (numerics change: opt-in candidate only)
      sgd-floor p - lr*g — the 3-pass pure-bandwidth floor

    Analytic fp32-adam floor for the 77M-param flagship: 7 passes x 4 B =
    ~2.2 GB -> ~2.6 ms at v5e peak HBM.
    """
    import optax

    from vct_tpu.config import TrainConfig
    from vct_tpu.train.optimizers import build_optimizer

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask, variables = _init(model, 64, S)
    params = variables["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params/1e6:.1f}M "
          f"(fp32 adam floor ~{n_params*28/819e9*1e3:.2f} ms)", flush=True)

    @jax.jit
    def fwdbwd(pp):
        def lf(p2):
            v = {"params": p2, "buffers": variables["buffers"]}
            return model.apply(v, feats, masks, caps, cap_mask,
                               deterministic=True,
                               method=MMT4Caption.caption_loss)
        return jax.value_and_grad(lf)(pp)

    _, grads = fwdbwd(params)
    np.asarray(jax.tree_util.tree_leaves(grads)[0])

    from vct_tpu.train.optimizers import _base_optimizer, freeze_labels

    labels = freeze_labels(params, "caption")
    arms = {
        "prod": build_optimizer(TrainConfig(), params),
        "inject-adam": _base_optimizer(TrainConfig()),
        "mt-adam": optax.multi_transform(
            {"train": optax.adam(1e-4), "frozen": optax.set_to_zero()}, labels),
        "bare-adam": optax.adam(1e-4),
        "mu-bf16": optax.adam(1e-4, mu_dtype=jnp.bfloat16),
        "sgd-floor": optax.sgd(1e-4),
    }
    # Build every arm's jitted update + live state up front, then time them
    # ROUND-ROBIN: host-load drift on this shared rig is larger than the
    # arm-to-arm deltas (first two runs measured prod at 6.6 then 4.3 ms),
    # so sequential per-arm loops alias the drift into the comparison.
    # Interleaved rounds put every arm under the same load profile; the
    # median round is the per-arm number.
    live = {}
    for name, opt in arms.items():
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def upd(pp, os, g, _opt=opt):
            updates, os2 = _opt.update(g, os, pp)
            return optax.apply_updates(pp, updates), os2

        p = jax.tree_util.tree_map(jnp.copy, params)
        os_ = jax.jit(opt.init)(p)
        p, os_ = upd(p, os_, grads)  # compile + warm
        np.asarray(jax.tree_util.tree_leaves(p)[0])
        live[name] = [upd, p, os_]

    rounds, inner = max(iters // 4, 3), 4
    times = {name: [] for name in arms}
    for _ in range(rounds):
        for name, slot in live.items():
            upd, p, os_ = slot
            t0 = time.perf_counter()
            for _ in range(inner):
                p, os_ = upd(p, os_, grads)
            np.asarray(jax.tree_util.tree_leaves(p)[0])
            times[name].append((time.perf_counter() - t0) / inner)
            slot[1], slot[2] = p, os_
    for name, ts in times.items():
        ts.sort()
        print(f"{name:<11s} median {ts[len(ts)//2]*1000:7.2f} ms   "
              f"min {ts[0]*1000:7.2f}  max {ts[-1]*1000:7.2f}", flush=True)


def trace(out_dir: str):
    """One jax.profiler trace covering a train step (B=256) and a decode
    batch (B=2048) — open in XProf/Perfetto for the op-level roofline."""
    from vct_tpu.config import TrainConfig
    from vct_tpu.decode import make_auto_greedy_fn
    from vct_tpu.train.optimizers import build_optimizer
    from vct_tpu.train.state import make_train_state
    from vct_tpu.train.step import make_train_step

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask, variables = _init(model, 256, S)
    batch = {"feats": feats, "masks": masks, "token_ids": caps,
             "token_mask": cap_mask}
    optimizer = build_optimizer(TrainConfig(), variables["params"])
    state = make_train_state(variables, optimizer)
    step = make_train_step(model, optimizer, "caption")
    for _ in range(3):
        state, m = step(state, batch)
    np.asarray(m["loss"])

    dfeats, dmasks, _, _, dvars = _init(model, 2048)
    greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    np.asarray(greedy(dvars, dfeats, dmasks)[0])

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, m = step(state, batch)
        np.asarray(m["loss"])
        np.asarray(greedy(dvars, dfeats, dmasks)[0])
    print(f"trace written to {out_dir}")


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("mode", choices=["decode-sweep", "train", "loss-ab",
                                    "opt-ab", "numerics-ab", "latency",
                                    "latency-decomp", "trace"])
    p.add_argument("--out", default="/tmp/vct_trace", help="trace output dir")
    p.add_argument("--batches", type=int, nargs="*", default=None)
    p.add_argument("--arm", choices=["both", "scan", "pallas"], default="both",
                   help="loss-ab: which implementation(s) to time")
    args = p.parse_args()
    _warm()
    if args.mode == "decode-sweep":
        decode_sweep(tuple(args.batches) if args.batches else (1024, 2048, 4096, 8192))
    elif args.mode == "train":
        train(tuple(args.batches) if args.batches else (64, 256, 512))
    elif args.mode == "loss-ab":
        loss_ab(tuple(args.batches) if args.batches else (64, 256, 512),
                arm=args.arm)
    elif args.mode == "opt-ab":
        opt_ab()
    elif args.mode == "numerics-ab":
        numerics_ab(tuple(args.batches) if args.batches else (64, 256))
    elif args.mode == "latency":
        latency()
    elif args.mode == "latency-decomp":
        latency_decomp()
    else:
        trace(args.out)


if __name__ == "__main__":
    main()
