"""Fused-kernel greedy vs module-graph greedy on the real chip."""
import time
import numpy as np
import jax, jax.numpy as jnp
from __graft_entry__ import _batch, _flagship
from vct_tpu.decode import make_greedy_fn
from vct_tpu.decode_fast import make_fused_greedy_fn
from vct_tpu.models.mmt4caption import MMT4Caption

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522

np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
model = _flagship(dtype=jnp.bfloat16)
feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                       method=MMT4Caption.caption_loss)

ref = make_greedy_fn(model, MAX_LEN, 101, -1)
t_ref = np.asarray(ref(variables, feats, masks)[0])
fused = make_fused_greedy_fn(model, MAX_LEN, 101, -1, block_b=32)
t_fused = np.asarray(fused(variables, feats, masks)[0])
agree = (t_ref == t_fused).mean()
print(f"token agreement (bf16): {agree:.4f}")

for name, fn in (("module", ref), ("fused", fused)):
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        tok = np.asarray(fn(variables, feats, masks)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:8s}: {dt*1000:7.1f} ms/batch  {B/dt:8.0f} captions/s")
