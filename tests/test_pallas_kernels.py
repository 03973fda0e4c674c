"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by the benchmark)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("num_blocks,N,t", [(300, 1200, 3), (16, 4000, 9), (130, 130, 4)])
def test_jt_u_sorted_matches_scatter(num_blocks, N, t):
    rng = np.random.default_rng(num_blocks + N)
    ids = np.sort(rng.integers(0, num_blocks, N)).astype(np.int32)
    J = rng.standard_normal((N, 2, t)).astype(np.float32)
    u = rng.standard_normal((N, 2)).astype(np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, num_blocks, 128)
    out = pk.jt_u_sorted(
        jnp.asarray(J), jnp.asarray(u), jnp.asarray(ids),
        jnp.asarray(tile_starts), num_blocks, max_rows=max_rows, interpret=True,
    )
    ref = np.zeros((num_blocks, t), np.float32)
    np.add.at(ref, ids, np.einsum("nrt,nr->nt", J, u))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@pytest.mark.parametrize("num_blocks,N,t", [(300, 1200, 3), (129, 600, 9)])
def test_expand_matches_take(num_blocks, N, t):
    rng = np.random.default_rng(num_blocks)
    ids = np.sort(rng.integers(0, num_blocks, N)).astype(np.int32)
    vals = rng.standard_normal((num_blocks, t)).astype(np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, num_blocks)
    out = pk.segment_block_expand(
        jnp.asarray(vals), jnp.asarray(ids), jnp.asarray(tile_starts), N,
        max_rows=max_rows, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), vals[ids], atol=1e-6)


def test_empty_blocks_get_zero():
    # blocks with no observations must come out exactly zero
    ids = np.asarray([0, 0, 5, 5, 5], np.int32)
    J = np.ones((5, 1, 2), np.float32)
    u = np.ones((5, 1), np.float32)
    tile_starts, max_rows = pk.plan_block_tiles(ids, 8)
    out = np.asarray(
        pk.jt_u_sorted(
            jnp.asarray(J), jnp.asarray(u), jnp.asarray(ids),
            jnp.asarray(tile_starts), 8, max_rows=max_rows, interpret=True,
        )
    )
    np.testing.assert_allclose(out[0], [2, 2])
    np.testing.assert_allclose(out[5], [3, 3])
    np.testing.assert_allclose(out[[1, 2, 3, 4, 6, 7]], 0)
