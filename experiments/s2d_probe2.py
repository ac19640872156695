"""s2d microbenchmark v2: fori_loop inside ONE jitted program per op, so the
tunnel's per-dispatch overhead can't pollute the per-iteration time."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(make_fn, x, iters=50):
    fn = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda i, v: make_fn(v), x))
    r = fn(x)
    float(jnp.sum(r.astype(jnp.float32)))  # warmup + compile
    t0 = time.time()
    r = fn(x)
    float(jnp.sum(r.astype(jnp.float32)))
    return (time.time() - t0) / iters


def main():
    B = 64
    rng = np.random.default_rng(0)
    x_narrow = jnp.asarray(rng.normal(size=(B, 256, 256, 32)), jnp.bfloat16)
    x_dense = jnp.asarray(rng.normal(size=(B, 128, 128, 128)), jnp.bfloat16)

    t = timeit(lambda x: jnp.maximum(x, 0) - 0.5, x_narrow)
    gb = x_narrow.size * 2 * 2 / 1e9
    print(f"relu narrow (B,256,256,32) : {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")
    t = timeit(lambda x: jnp.maximum(x, 0) - 0.5, x_dense)
    print(f"relu dense  (B,128,128,128): {t*1e3:7.2f} ms  {gb/t:6.0f} GB/s")

    k_n = jnp.asarray(rng.normal(size=(3, 3, 32, 32)) * 0.05, jnp.bfloat16)
    k_d = jnp.asarray(rng.normal(size=(2, 2, 128, 128)) * 0.02, jnp.bfloat16)
    dn_n = jax.lax.conv_dimension_numbers(x_narrow.shape, k_n.shape, ("NHWC", "HWIO", "NHWC"))
    dn_d = jax.lax.conv_dimension_numbers(x_dense.shape, k_d.shape, ("NHWC", "HWIO", "NHWC"))

    t = timeit(
        lambda x: jax.lax.conv_general_dilated(x, k_n, (1, 1), "SAME", dimension_numbers=dn_n),
        x_narrow,
    )
    fl = 2 * 9 * 32 * 32 * 256 * 256 * B
    print(f"conv 3x3 C32  @256px: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")

    t = timeit(
        lambda x: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0))), k_d, (1, 1), "VALID",
            dimension_numbers=dn_d,
        ),
        x_dense,
    )
    fl_d = 2 * 4 * 128 * 128 * 128 * 128 * B
    print(f"conv 2x2 C128 @128px: {t*1e3:7.2f} ms  {fl_d/t/1e12:6.1f} TFLOP/s ({fl_d/fl:.2f}x FLOPs)")

    x64 = jnp.asarray(rng.normal(size=(B, 128, 128, 64)), jnp.bfloat16)
    k64 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    x64p = jnp.asarray(rng.normal(size=(B, 128, 64, 128)), jnp.bfloat16)
    k64p = jnp.asarray(rng.normal(size=(3, 2, 128, 128)) * 0.02, jnp.bfloat16)
    dn64 = jax.lax.conv_dimension_numbers(x64.shape, k64.shape, ("NHWC", "HWIO", "NHWC"))
    dn64p = jax.lax.conv_dimension_numbers(x64p.shape, k64p.shape, ("NHWC", "HWIO", "NHWC"))
    t = timeit(
        lambda x: jax.lax.conv_general_dilated(x, k64, (1, 1), "SAME", dimension_numbers=dn64),
        x64,
    )
    fl = 2 * 9 * 64 * 64 * 128 * 128 * B
    print(f"conv 3x3 C64  @128px: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TFLOP/s")
    t = timeit(
        lambda x: jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 0), (0, 0))), k64p, (1, 1), "VALID",
            dimension_numbers=dn64p,
        ),
        x64p,
    )
    fl_p = 2 * 6 * 128 * 128 * 128 * 64 * B
    print(f"conv 3x2 C128 @64w  : {t*1e3:7.2f} ms  {fl_p/t/1e12:6.1f} TFLOP/s ({fl_p/fl:.2f}x FLOPs)")

    # BN-like reduction narrow vs phase-grouped dense
    t = timeit(lambda x: x - jnp.mean(x, axis=(0, 1, 2), keepdims=True), x_narrow)
    print(f"BN-reduce narrow : {t*1e3:7.2f} ms")
    t = timeit(
        lambda x: x - jnp.tile(
            jnp.mean(x.reshape(B, 128, 128, 4, 32), axis=(0, 1, 2, 3)), (4,)
        ),
        x_dense,
    )
    print(f"BN-reduce dense  : {t*1e3:7.2f} ms")

    # big-matmul sanity: what does the chip deliver right now?
    a = jnp.asarray(rng.normal(size=(8192, 8192)), jnp.bfloat16)
    t = timeit(lambda x: (x @ a).astype(jnp.bfloat16), a)
    print(f"matmul 8k sanity : {t*1e3:7.2f} ms  {2*8192**3/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
