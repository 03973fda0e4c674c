"""Measure per-iteration overhead of lax.fori_loop vs unrolled bodies on
the axon TPU runtime."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

K = 20


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best / K * 1e3:8.3f} ms/iter")
    return out


x0 = jnp.ones((128, 128), jnp.float32)

# tiny body, fori
@jax.jit
def tiny_fori(x):
    return jax.lax.fori_loop(0, K, lambda i, a: a * 1.0000001 + 1e-9, x)

timed("fori tiny body", tiny_fori, x0)

# tiny body, unrolled
@jax.jit
def tiny_unroll(x):
    for _ in range(K):
        x = x * 1.0000001 + 1e-9
    return x

timed("unrolled tiny body", tiny_unroll, x0)

# medium body (B-wide matmul), fori vs unrolled
B = 84218
J = jnp.ones((B, 24), jnp.float32)
S = jnp.ones((24, 24), jnp.float32)

@jax.jit
def med_fori(J):
    return jax.lax.fori_loop(
        0, K, lambda i, a: a @ S * 0.999 + 1e-9, J)

timed("fori (B,24)@(24,24)", med_fori, J)

@jax.jit
def med_unroll(J):
    for _ in range(K):
        J = J @ S * 0.999 + 1e-9
    return J

timed("unrolled (B,24)@(24,24)", med_unroll, J)

# f64 scalar carry in the loop (radius is f64 in the real loop?)
@jax.jit
def fori_mixed(x, r):
    def body(i, c):
        x, r = c
        return (x * 1.0000001 + r * 1e-30, r * 1.0000001)
    return jax.lax.fori_loop(0, K, body, (x, r))

timed("fori tiny + f64 scalar carry", fori_mixed, x0,
      jnp.asarray(1e4, jnp.float64))
