"""What does the dropout RNG itself cost at train shapes, and how much
cheaper are uint8-bit masks (bits >= thresh) than per-element bernoulli?"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:56s} {dt*1000:8.2f} ms", flush=True)
    return dt


def shapes_for(b):
    return (
        [(b, 8, 31, 31)] * 3 + [(b, 8, 31, 13)] * 3 + [(b, 8, 13, 13)]
        + [(b, 31, 2048)] * 3 + [(b, 13, 2048)]
        + [(b, 31, 768)] * 7 + [(b, 13, 768)] * 3
    )


def main():
    np.asarray(jax.jit(lambda x: x * 2)(jnp.ones((8, 128))))
    for B in (64, 256):
        shapes = shapes_for(B)
        n = sum(int(np.prod(s)) for s in shapes)
        key0 = jax.random.PRNGKey(0)
        rbg = jax.random.wrap_key_data(
            jnp.tile(jax.random.key_data(jax.random.split(key0, 1)[0]), 2),
            impl="rbg")

        @jax.jit
        def bern(key):
            keys = jax.random.split(key, len(shapes))
            return [jax.random.bernoulli(k, 0.7, s) for k, s in zip(keys, shapes)]

        @jax.jit
        def bits8(key):
            keys = jax.random.split(key, len(shapes))
            return [jax.random.bits(k, s, jnp.uint8) >= 77
                    for k, s in zip(keys, shapes)]

        @jax.jit
        def bits8_one(key):
            flat = jax.random.bits(key, (n,), jnp.uint8) >= 77
            outs, off = [], 0
            for s in shapes:
                sz = int(np.prod(s))
                outs.append(jax.lax.dynamic_slice_in_dim(flat, off, sz)
                            .reshape(s))
                off += sz
            return outs

        print(f"--- B={B}: {len(shapes)} masks, {n/1e6:.1f}M elements")
        timeit("bernoulli rbg (current)", bern, rbg)
        timeit("uint8 bits >= t, per-mask", bits8, rbg)
        timeit("uint8 bits >= t, one draw + slice", bits8_one, rbg)

        # and with threefry for reference
        timeit("bernoulli threefry", bern, key0)


if __name__ == "__main__":
    main()
