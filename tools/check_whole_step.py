"""Real-TPU compile+run check of the whole-step kernel at serving shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _batch, _flagship
from vct_tpu.models.mmt4caption import MMT4Caption
from vct_tpu.decode_fast import greedy_generate_fused

def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    model = _flagship(dtype=jnp.bfloat16)
    for b in (32, 64):
        feats, masks, caps, cap_mask = _batch(b, 12, 8, 512, 30522)
        variables = model.init(jax.random.PRNGKey(0), feats, masks, caps,
                               cap_mask, method=MMT4Caption.caption_loss)
        for sk in (True, False):
            t0 = time.perf_counter()
            toks = greedy_generate_fused(model, variables, feats, masks,
                                         max_len=30, start_id=101, end_id=-1,
                                         single_kernel=sk)[0]
            toks = np.asarray(toks)
            dt = time.perf_counter() - t0
            print(f"b={b} single_kernel={sk}: ok first-run {dt:.1f}s "
                  f"tokens {toks.shape}", flush=True)
            # token equality between paths
            if sk:
                ref = toks
            else:
                print(f"b={b} paths token-equal: {np.array_equal(ref, toks)}",
                      flush=True)

if __name__ == "__main__":
    main()
