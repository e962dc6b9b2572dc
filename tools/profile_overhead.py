"""Measure per-fusion overhead inside an on-device loop: chain N small
matmuls (same total work per chain position) and fit cost vs N."""
import time
import numpy as np
import jax
import jax.numpy as jnp

N1, N2 = 32, 160

def slope(name, make_fn, *args):
    f1, f2 = make_fn(N1), make_fn(N2)
    np.asarray(f1(*args)); np.asarray(f2(*args))
    ts = []
    for f, n in ((f1, N1), (f2, N2), (f1, N1), (f2, N2)):
        t0 = time.perf_counter(); np.asarray(f(*args)); ts.append((n, time.perf_counter() - t0))
    d1 = min(t for n, t in ts if n == N1); d2 = min(t for n, t in ts if n == N2)
    ms = (d2-d1)/(N2-N1)*1000
    print(f"{name:46s} {ms:8.3f} ms/iter")
    return ms

def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    B, E = 1024, 768
    x0 = jnp.ones((B, E), jnp.bfloat16) * 0.01
    w = jnp.ones((E, E), jnp.bfloat16) * 0.001

    def mk_chain(depth):
        def make(n):
            @jax.jit
            def f(x, w):
                def body(i, x):
                    for _ in range(depth):
                        x = jnp.tanh(x @ w)   # tanh blocks matmul-merging
                    return x
                return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
            return f
        return make

    t2 = slope("chain depth 2", mk_chain(2), x0, w)
    t8 = slope("chain depth 8", mk_chain(8), x0, w)
    t24 = slope("chain depth 24", mk_chain(24), x0, w)
    per_fusion = (t24 - t8) / 16
    print(f"per-fusion marginal cost: {per_fusion*1000:.1f} us")
    # one [1024,768]@[768,768] bf16 matmul = 1.2 GFLOP -> ~8us at 150 TFLOPs
    # plus weight re-read 1.1MB -> ~1.4us; anything >>10us is overhead

if __name__ == "__main__":
    main()
