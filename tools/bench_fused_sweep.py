import time
import numpy as np
import jax, jax.numpy as jnp
from __graft_entry__ import _batch, _flagship
from vct_tpu.decode import make_greedy_fn
from vct_tpu.decode_fast import make_fused_greedy_fn
from vct_tpu.models.mmt4caption import MMT4Caption

B, T, MAX_LEN, VOCAB = 1024, 12, 30, 30522
np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))

# fp32 agreement check (small B to keep compile fast)
model32 = _flagship(dtype=jnp.float32)
f32, m32, c32, cm32 = _batch(256, T, 8, 512, VOCAB)
v32 = model32.init(jax.random.PRNGKey(0), f32, m32, c32, cm32, method=MMT4Caption.caption_loss)
ref32 = np.asarray(make_greedy_fn(model32, MAX_LEN, 101, -1)(v32, f32, m32)[0])
fus32 = np.asarray(make_fused_greedy_fn(model32, MAX_LEN, 101, -1, block_b=32)(v32, f32, m32)[0])
print(f"fp32 token agreement: {(ref32 == fus32).mean():.4f}")

model = _flagship(dtype=jnp.bfloat16)
feats, masks, caps, cap_mask = _batch(B, T, 8, 512, VOCAB)
variables = model.init(jax.random.PRNGKey(0), feats, masks, caps, cap_mask,
                       method=MMT4Caption.caption_loss)
for bb in (32, 64, 128, 256):
    fn = make_fused_greedy_fn(model, MAX_LEN, 101, -1, block_b=bb)
    try:
        np.asarray(fn(variables, feats, masks)[0])
    except Exception as ex:
        print(f"block_b={bb:4d}: FAILED {type(ex).__name__}")
        continue
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        tok = np.asarray(fn(variables, feats, masks)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"block_b={bb:4d}: {dt*1000:7.1f} ms/batch  {B/dt:8.0f} captions/s")
