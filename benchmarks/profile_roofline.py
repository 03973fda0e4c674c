"""Raw roofline probes: HBM bandwidth, MXU throughput, small-N matmul."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

K = 20


def timed(name, fn, *args, bytes_moved=None, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / K
    extra = ""
    if bytes_moved:
        extra += f"  {bytes_moved / per / 1e9:7.1f} GB/s"
    if flops:
        extra += f"  {flops / per / 1e12:7.2f} Tflop/s"
    print(f"{name:40s} {per * 1e3:8.3f} ms{extra}")
    return out


N = 4096
A = jnp.ones((N, N), jnp.float32)  # 64 MB

@jax.jit
def copy_loop(x):
    return jax.lax.fori_loop(0, K, lambda i, a: a * 1.0000001, x)

timed("elementwise (4096^2 f32)", copy_loop, A,
      bytes_moved=2 * N * N * 4)

@jax.jit
def mm_loop(x):
    return jax.lax.fori_loop(0, K, lambda i, a: (a @ A) * 1e-3, x)

timed("matmul 4096^3 f32 default", mm_loop, A,
      flops=2 * N * N * N)

Abf = A.astype(jnp.bfloat16)

@jax.jit
def mm_bf(x):
    return jax.lax.fori_loop(0, K, lambda i, a: (a @ Abf) * jnp.bfloat16(1e-3), x)

timed("matmul 4096^3 bf16", mm_bf, Abf, flops=2 * N * N * N)

B = 84224
for cols in (24, 128):
    X = jnp.ones((B, cols), jnp.float32)

    @jax.jit
    def ew_loop(x):
        return jax.lax.fori_loop(0, K, lambda i, a: a * 1.0000001, x)

    timed(f"elementwise (B,{cols}) f32", ew_loop, X,
          bytes_moved=2 * B * cols * 4)

    S = jnp.ones((cols, cols), jnp.float32)

    @jax.jit
    def mm_small(x):
        return jax.lax.fori_loop(0, K, lambda i, a: (a @ S) * 1e-3, x)

    timed(f"matmul (B,{cols})@({cols},{cols}) f32", mm_small, X,
          bytes_moved=2 * B * cols * 4, flops=2 * B * cols * cols)

    @jax.jit
    def mm_small_hi(x):
        def body(i, a):
            return jnp.einsum("bl,lo->bo", a, S,
                              precision=jax.lax.Precision.HIGHEST) * 1e-3
        return jax.lax.fori_loop(0, K, body, X)

    timed(f"matmul (B,{cols}) HIGHEST", mm_small_hi, X,
          bytes_moved=2 * B * cols * 4, flops=2 * B * cols * cols)
