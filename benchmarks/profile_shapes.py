"""Shape sweep: effective bandwidth of elementwise ops vs array shape."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

K = 20
key = jax.random.PRNGKey(0)


def timed(name, fn, x, bytes_moved):
    out = fn(x)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / K
    print(f"{name:44s} {per * 1e3:8.3f} ms  {bytes_moved / per / 1e9:8.1f} GB/s")


def chain(x):
    # multiply by a traced scalar derived from the data (not foldable)
    s = x.reshape(-1)[0] * 1e-12 + 1.0000001
    return jax.lax.fori_loop(0, K, lambda i, a: a * s, x)


shapes = [
    (84224, 24),
    (84224, 128),
    (84224, 512),
    (84224, 2048),
    (10528, 1024),
    (2633, 4096),
    (4096, 4096),
    (84224 * 128,),  # 1-D same elements as (84224,128)
    (658, 16384),
]
for sh in shapes:
    x = jax.random.normal(key, sh, jnp.float32)
    f = jax.jit(chain)
    n = int(np.prod(sh))
    lanes = sh[-1] if len(sh) > 1 else n
    padded = n if len(sh) == 1 else sh[0] * max(128, ((lanes + 127) // 128) * 128)
    timed(f"elementwise {sh}", f, x, 2 * n * 4)
