"""Pallas TPU kernels for the block-sparse hot ops.

The reference's CUDA tier hand-writes SpMV and BSM->CRS kernels
(/root/reference/internal/ceres/cuda_kernels_bsm_to_crs.cu.cc,
cuda_sparse_matrix.cc). The TPU equivalent here targets the transpose
product J^T u — the one op in the CG pipeline that XLA lowers to a serial
scatter. The kernel exploits the sorted-by-block observation order:

  grid = tiles of target blocks; each program DMAs its tile's contiguous
  observation range (scalar-prefetched offsets), computes the per-row
  contributions on the VPU, and reduces rows -> blocks with a one-hot
  matmul on the MXU (a 128-wide segment-sum with zero scatter traffic).

Rows are padded per tile to a static budget; the one-hot mask handles
ragged tile boundaries. Deterministic by construction.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def plan_block_tiles(sorted_ids: np.ndarray, num_blocks: int,
                     blocks_per_tile: int = 128) -> Tuple[np.ndarray, int]:
    """Host-side: per-tile observation start offsets + static row budget.

    sorted_ids must be non-decreasing. Returns (tile_row_start (T+1,),
    max_rows_per_tile rounded to a multiple of 8)."""
    sorted_ids = np.asarray(sorted_ids)
    n = sorted_ids.shape[0]
    counts = np.bincount(sorted_ids, minlength=num_blocks)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    num_tiles = -(-num_blocks // blocks_per_tile)
    tile_starts = np.asarray(
        [offsets[min(t * blocks_per_tile, num_blocks)] for t in range(num_tiles + 1)],
        np.int32,
    )
    max_rows = int(np.max(np.diff(tile_starts))) if num_tiles else 0
    max_rows = max(8, -(-max_rows // 8) * 8)
    return tile_starts, max_rows


def segment_block_sum(
    contrib,  # (N, t) per-observation contributions, sorted by target block
    sorted_ids,  # (N,) int32 non-decreasing target block ids
    tile_starts,  # (T+1,) int32 per-tile row offsets (host-planned)
    num_blocks: int,
    blocks_per_tile: int = 128,
    max_rows: int = 512,
    interpret: bool = False,
):
    """out[b] = sum_{i: sorted_ids[i]==b} contrib[i] via the tiled one-hot
    MXU reduction. Output (num_blocks_padded, t)."""
    n, t = contrib.shape
    num_tiles = -(-num_blocks // blocks_per_tile)
    nb_pad = num_tiles * blocks_per_tile
    # pad row dimension so dynamic slices of size max_rows stay in bounds
    contrib_p = jnp.concatenate(
        [contrib, jnp.zeros((max_rows, t), contrib.dtype)], axis=0
    )
    ids_p = jnp.concatenate(
        [sorted_ids.astype(jnp.int32), jnp.full((max_rows,), -1, jnp.int32)]
    )

    def kernel(starts_ref, ids_ref, contrib_ref, out_ref):
        tile = pl.program_id(0)
        row0 = starts_ref[tile]
        rows_in_tile = starts_ref[tile + 1] - row0
        block0 = tile * blocks_per_tile
        rows = contrib_ref[pl.ds(row0, max_rows), :]  # (max_rows, t)
        ids = ids_ref[pl.ds(row0, max_rows)]  # (max_rows,)
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (max_rows, 1), 0)[:, 0]
            < rows_in_tile
        )
        local = jnp.where(valid, ids - block0, -1)
        onehot = (
            local[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (max_rows, blocks_per_tile), 1)
        ).astype(contrib_ref.dtype)
        out_ref[:, :] = jax.lax.dot_general(
            onehot,
            rows,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )

    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blocks_per_tile, t), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb_pad, t), contrib.dtype),
        interpret=interpret,
    )(tile_starts, ids_p, contrib_p)
    return out


def jt_u_sorted(
    J_blocks,  # (N, r, t) sorted by target block
    u,  # (N, r)
    sorted_ids,
    tile_starts,
    num_blocks: int,
    blocks_per_tile: int = 128,
    max_rows: int = 512,
    interpret: bool = False,
):
    """g[b] = sum_i J_i^T u_i for observations of block b (the J^T u hot op)."""
    contrib = jnp.einsum("nrt,nr->nt", J_blocks, u)
    out = segment_block_sum(
        contrib, sorted_ids, tile_starts, num_blocks,
        blocks_per_tile=blocks_per_tile, max_rows=max_rows, interpret=interpret,
    )
    return out[:num_blocks]
