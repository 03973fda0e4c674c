"""Breakdown of the S assemble+solve stage."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from ceres_tpu.parallel import sharded_ba as sb

dtype = jnp.float32
B, C, P = 84218, 16, 22106
key = jax.random.PRNGKey(0)
J0 = jax.random.normal(key, (B, 24), dtype) * 0.1
oh = jax.nn.one_hot(jax.random.randint(key, (B,), 0, C), C, dtype=dtype)
A0 = jax.random.normal(key, (P * 3, C * 9), dtype) * 0.01


def bench(name, make_fn, *args):
    times = {}
    for K in (20, 40):
        fn = jax.jit(make_fn(K))
        s = float(fn(*args))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            s = float(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[40] - times[20]) / 20
    print(f"{name:44s} {per * 1e3:8.3f} ms/iter")


# jctjc outer + FtF reduce
def mk_ftf(K):
    def f(J):
        def body(i, acc):
            Jx = J + acc * 1e-30
            Js_c = Jx[:, :18]
            jctjc = sb._outer_flat(Js_c, Js_c,
                                   sb._outer_selectors(2, 9, 9, dtype))
            FtF = jnp.einsum("bk,bc->ck", jctjc, oh, precision=sb._HI)
            return acc + FtF[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("F'F: outer (B,81) + reduce_c", mk_ftf, J0)


# A'A einsum HIGHEST
def mk_ata(K):
    def f(A):
        def body(i, acc):
            Ax = A + acc * 1e-30
            G = jnp.einsum("kf,kg->fg", Ax, Ax, precision=sb._HI)
            return acc + G[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("A'A (66k x 144) HIGHEST", mk_ata, A0)


# A'A default precision
def mk_ata_bf(K):
    def f(A):
        def body(i, acc):
            Ax = A + acc * 1e-30
            G = jnp.einsum("kf,kg->fg", Ax, Ax)
            return acc + G[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("A'A default (bf16)", mk_ata_bf, A0)


# cholesky 144
S0 = jnp.eye(144, dtype=dtype) * 10 + jax.random.normal(key, (144, 144), dtype) * 0.01
S0 = S0 @ S0.T

def mk_chol(K):
    def f(S):
        def body(i, acc):
            Sx = S + jnp.eye(144, dtype=dtype) * (acc * 1e-30 + 1e-10)
            L = jnp.linalg.cholesky(Sx)
            return acc + L[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("cholesky(144x144)", mk_chol, S0)


# cho_solve
L0 = jnp.linalg.cholesky(S0)
b0 = jnp.ones((144,), dtype)

def mk_solve(K):
    def f(L, b):
        def body(i, acc):
            bx = b + acc * 1e-30
            z = jax.scipy.linalg.cho_solve((L, True), bx)
            return acc + z[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("cho_solve(144) two trisolves", mk_solve, L0, b0)


# alternative: explicit inverse once + matvec (inverse via cholesky of
# padded batch? just time inv)
def mk_inv(K):
    def f(S):
        def body(i, acc):
            Sx = S + jnp.eye(144, dtype=dtype) * (acc * 1e-30 + 1e-10)
            Si = jnp.linalg.inv(Sx)
            return acc + Si[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("inv(144x144)", mk_inv, S0)


# Az product (P*3,144)@(144,)
z0 = jnp.ones((144,), dtype)

def mk_az(K):
    def f(A, z):
        def body(i, acc):
            zx = z + acc * 1e-30
            Az = jnp.einsum("kf,f->k", A, zx, precision=sb._HI)
            return acc + Az[0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))
    return f

bench("Az (66k,144)@(144,)", mk_az, A0, z0)
