"""Does async dispatch hide the ~41 ms fixed per-execution relay cost?

Sequential (materialize each batch before launching the next — what bench.py
times today) vs pipelined (launch D executions back-to-back, then materialize
all).  Also a batch-size sweep to amortize the fixed cost the other way."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode import make_auto_greedy_fn

T, MAX_LEN, VOCAB = 12, 30, 30522


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)

    # trivial program, pipelined: is dispatch overlappable at all?
    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((1024, 30), jnp.int32)
    np.asarray(triv(x))
    for d in (1, 4, 16):
        t0 = time.perf_counter()
        outs = [triv(x) for _ in range(d)]
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        print(f"trivial x{d:2d} pipelined: {dt*1000:7.1f} ms total "
              f"{dt/d*1000:6.1f} ms/call", flush=True)

    for B in (1024, 2048, 4096):
        feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
        variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                               cap_mask, method=MMT4Caption.caption_loss)
        greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
        np.asarray(greedy(variables, feats, masks)[0])  # compile + warm

        # sequential
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(greedy(variables, feats, masks)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"B={B:4d} sequential : {dt*1000:7.1f} ms/batch "
              f"{B/dt:8.0f} caps/s", flush=True)

        # pipelined, depth sweep
        for d in (2, 4, 8):
            t0 = time.perf_counter()
            outs = [greedy(variables, feats, masks)[0] for _ in range(d)]
            toks = [np.asarray(o) for o in outs]
            dt = (time.perf_counter() - t0) / d
            print(f"B={B:4d} pipelined x{d}: {dt*1000:7.1f} ms/batch "
                  f"{B/dt:8.0f} caps/s", flush=True)
        del feats, masks, caps, cap_mask, variables


if __name__ == "__main__":
    main()
