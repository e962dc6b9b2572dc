"""Is the fixed cost per-EXECUTION or per-TRANSFER?  Measure bare transfers,
then pipelined decode with a single device-side stack + one fetch."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode import make_auto_greedy_fn

T, MAX_LEN, VOCAB = 12, 30, 30522
B = 1024


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

    # bare transfer cost by size
    for shape in ((8, 128), (1024, 30), (8, 1024, 30), (64, 1024, 30)):
        x = jnp.zeros(shape, jnp.int32) + 1
        np.asarray(x)
        t0 = time.perf_counter()
        for _ in range(8):
            np.asarray(x)
        dt = (time.perf_counter() - t0) / 8
        mb = np.prod(shape) * 4 / 1e6
        print(f"fetch {str(shape):16s} {mb:7.2f} MB {dt*1000:7.1f} ms "
              f"{mb/dt:7.1f} MB/s", flush=True)

    model = _flagship(dtype=jnp.bfloat16)
    feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
    variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                           cap_mask, method=MMT4Caption.caption_loss)
    greedy = make_auto_greedy_fn(model, MAX_LEN, 101, -1)
    np.asarray(greedy(variables, feats, masks)[0])  # compile + warm

    stack = jax.jit(lambda ts: jnp.stack(ts))

    for d in (4, 8, 16):
        t0 = time.perf_counter()
        outs = [greedy(variables, feats, masks)[0] for _ in range(d)]
        toks = np.asarray(stack(outs))
        dt = (time.perf_counter() - t0) / d
        print(f"B={B} pipelined x{d:2d}, one fetch: {dt*1000:7.1f} ms/batch "
              f"{B/dt:8.0f} caps/s", flush=True)

    # double-buffered steady state: fetch batch i-1 while batch i runs
    for d in (8, 16):
        outs = []
        t0 = time.perf_counter()
        prev = None
        for i in range(d):
            cur = greedy(variables, feats, masks)[0]
            if prev is not None:
                outs.append(np.asarray(prev))
            prev = cur
        outs.append(np.asarray(prev))
        dt = (time.perf_counter() - t0) / d
        print(f"B={B} double-buffered x{d:2d}: {dt*1000:7.1f} ms/batch "
              f"{B/dt:8.0f} caps/s", flush=True)


if __name__ == "__main__":
    main()
