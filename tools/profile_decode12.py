"""Steady-state (double-buffered) decode throughput vs batch size, prod path."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode import make_auto_greedy_fn, pipelined_map

T, MAX_LEN, VOCAB = 12, 30, 30522


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    for B in (2048, 4096, 8192):
        feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
        variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                               cap_mask, method=MMT4Caption.caption_loss)
        launch = lambda _i: greedy(variables, feats, masks)[0]
        np.asarray(launch(0))
        iters = 10
        t0 = time.perf_counter()
        for _ in pipelined_map(launch, range(iters)):
            pass
        dt = (time.perf_counter() - t0) / iters
        print(f"B={B:5d} steady: {dt*1000:7.1f} ms/batch {B/dt:8.0f} caps/s",
              flush=True)
        del feats, masks, caps, cap_mask, variables


if __name__ == "__main__":
    main()
