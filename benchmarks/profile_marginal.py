"""Trustworthy per-iteration cost: marginal time between K=20 and K=40
loops, with a host fetch of a scalar derived from the result (forces real
completion on any runtime)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def bench_body(name, make_fn, x, bytes_per_iter=None, flops_per_iter=None):
    times = {}
    for K in (20, 40):
        fn = jax.jit(make_fn(K))
        s = float(fn(x))  # warm + fetch
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s = float(fn(x))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[40] - times[20]) / 20
    extra = ""
    if bytes_per_iter:
        extra += f"  {bytes_per_iter / per / 1e9:8.1f} GB/s"
    if flops_per_iter:
        extra += f"  {flops_per_iter / per / 1e12:7.2f} Tflop/s"
    print(f"{name:44s} {per * 1e3:8.3f} ms/iter{extra}  "
          f"(K20 {times[20]*1e3:.2f} ms, K40 {times[40]*1e3:.2f} ms)")


key = jax.random.PRNGKey(0)
B = 84224

# 1. elementwise on tall-skinny, unfoldable (body uses loop index)
for cols in (24, 128, 512):
    x = jax.random.normal(key, (B, cols), jnp.float32)

    def mk(K):
        def f(x):
            def body(i, a):
                return a * (1.0 + 1e-12 * jnp.float32(i))
            out = jax.lax.fori_loop(0, K, body, x)
            return out[0, 0]
        return f

    bench_body(f"ew (B,{cols}) idx-dependent", mk, x,
               bytes_per_iter=2 * B * cols * 4)

# 2. the old "slow" style: constant multiplier
x = jax.random.normal(key, (B, 128), jnp.float32)

def mk_const(K):
    def f(x):
        out = jax.lax.fori_loop(0, K, lambda i, a: a * 1.0000001, x)
        return out[0, 0]
    return f

bench_body("ew (B,128) const-mult", mk_const, x,
           bytes_per_iter=2 * B * 128 * 4)

# 3. small matmul, index-dependent
S24 = jax.random.normal(key, (24, 24), jnp.float32) * 1e-2
x24 = jax.random.normal(key, (B, 24), jnp.float32)

def mk_mm(K):
    def f(x):
        def body(i, a):
            return a @ (S24 + 1e-12 * jnp.float32(i)) * 0.9
        out = jax.lax.fori_loop(0, K, body, x)
        return out[0, 0]
    return f

bench_body("mm (B,24)@(24,24) idx-dep", mk_mm, x24,
           bytes_per_iter=2 * B * 24 * 4, flops_per_iter=2 * B * 24 * 24)

# 4. big matmul sanity (MXU peak)
A = jax.random.normal(key, (4096, 4096), jnp.float32) * 1e-2

def mk_big(K):
    def f(a):
        def body(i, x):
            return (x @ A) * (1e-3 + 1e-15 * jnp.float32(i))
        return jax.lax.fori_loop(0, K, body, a)[0, 0]
    return f

bench_body("mm 4096^3 idx-dep", mk_big, A,
           flops_per_iter=2 * 4096**3)

# 5. (B,24) with 2-array carry (ping-pong, defeats in-place VMEM reuse?)
def mk_pp(K):
    def f(x):
        def body(i, c):
            a, b = c
            return (b * (1.0 + 1e-12 * jnp.float32(i)), a)
        out = jax.lax.fori_loop(0, K, body, (x, x * 0.5))
        return out[0][0, 0]
    return f

bench_body("ew (B,24) ping-pong carry", mk_pp, x24,
           bytes_per_iter=2 * B * 24 * 4)
