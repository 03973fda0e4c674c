"""Pallas TPU kernels for the block-sparse hot ops.

The reference's CUDA tier hand-writes SpMV and BSM->CRS kernels
(/root/reference/internal/ceres/cuda_kernels_bsm_to_crs.cu.cc,
cuda_sparse_matrix.cc). The TPU equivalent here targets the transpose
product J^T u — the one op in the CG pipeline that XLA lowers to a serial
per-row scatter. The kernel exploits the sorted-by-block observation order:

  grid = tiles of 128 target blocks; each program DMAs its tile's
  observation range (scalar-prefetched, lane-aligned offsets) from HBM
  into VMEM in TRANSPOSED layout (component-major, observations on the
  128-lane axis), builds the one-hot row->block mask by comparing block
  ids against the sublane index, and reduces observations -> blocks with
  ONE dot_general on the MXU — a 128-wide segment-sum with zero scatter
  traffic. Deterministic by construction.

Mosaic layout constraints honored (each one found empirically):
 - all DMA slices are along the lane axis and 128-aligned: tile row
   offsets are floored to 128 (rows outside the tile's block range produce
   all-zero one-hot rows, so the alignment padding needs no masking);
 - no (N, 1) or (N, 3) lane-narrow memrefs — data is transposed host-side;
 - the kernel traces under `jax.enable_x64(False)`: the global fp64-parity
   mode leaks i64 scalars into grid index maps otherwise;
 - bool->float conversions avoided (jnp.where with typed scalars).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCKS_PER_TILE = 128
_LANE = 128

# Number of bf16 passes in the exact-split data x one-hot dots (3 = full
# f32 accuracy, 2 ~ f16 accuracy, 1 = plain bf16). Ablation/experiment
# knob read at trace time.
SPLIT_PASSES = 3
_ABL_NO_PT = False   # ablation: skip the point-side segment algebra
_ABL_NO_CAM = False  # ablation: skip the camera gather/scatter dots
_ABL_NO_DMA = False  # ablation: skip the per-tile HBM->VMEM copies


def plan_block_tiles(sorted_ids: np.ndarray, num_blocks: int,
                     blocks_per_tile: int = BLOCKS_PER_TILE) -> Tuple[np.ndarray, int]:
    """Host-side: per-tile observation start offsets (floored to the lane
    width for aligned DMA) + a static row budget (multiple of 128).
    sorted_ids must be non-decreasing. Returns (tile_row_start (T+1,) int32,
    max_rows)."""
    sorted_ids = np.asarray(sorted_ids)
    counts = np.bincount(sorted_ids, minlength=num_blocks)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    num_tiles = -(-num_blocks // blocks_per_tile)
    raw = np.asarray(
        [offsets[min(t * blocks_per_tile, num_blocks)] for t in range(num_tiles + 1)],
        np.int64,
    )
    starts = (raw // _LANE) * _LANE  # align down; extra rows are inert
    spans = raw[1:] - starts[:-1]
    max_rows = int(spans.max()) if num_tiles else _LANE
    max_rows = max(_LANE, -(-max_rows // _LANE) * _LANE)
    return starts.astype(np.int32), max_rows


def balanced_block_order(ids: np.ndarray, num_blocks: int,
                         blocks_per_tile: int = BLOCKS_PER_TILE) -> np.ndarray:
    """Renumber blocks so every 128-block tile has ~equal total rows.

    plan_block_tiles' static row budget pays for the HEAVIEST tile
    everywhere; with power-law track lengths (BAL) that is ~1.6x the mean.
    Dealing blocks round-robin over tiles in descending row-count order
    (LPT scheduling) flattens per-tile totals to mean + O(max_count), so
    max_rows ~= mean rows/tile — a free ~1.5x on every segment kernel.

    Returns new_id (num_blocks,) int: new_id[old_block] = new block id.
    Callers renumber ids as new_id[ids], re-sort rows, and permute any
    per-block arrays by old_of_new = argsort(new_id)."""
    counts = np.bincount(np.asarray(ids), minlength=num_blocks)
    order = np.argsort(-counts, kind="stable")  # heaviest first
    ngroups = -(-num_blocks // blocks_per_tile)
    cap = np.full(ngroups, blocks_per_tile, np.int64)
    cap[-1] = num_blocks - (ngroups - 1) * blocks_per_tile
    fill = np.zeros(ngroups, np.int64)
    load = np.zeros(ngroups, np.float64)
    new_id = np.empty(num_blocks, np.int64)
    g = 0
    for ob in order:
        # next group with capacity, round-robin (greedy balance: the deal
        # order is descending so round-robin ~= least-loaded)
        for _ in range(ngroups):
            if fill[g] < cap[g]:
                break
            g = (g + 1) % ngroups
        new_id[ob] = g * blocks_per_tile + fill[g]
        fill[g] += 1
        load[g] += counts[ob]
        g = (g + 1) % ngroups
    return new_id


def plan_row_tiles(sorted_ids: np.ndarray, num_blocks: int,
                   target_rows: int = 512,
                   blocks_per_tile: int = BLOCKS_PER_TILE):
    """Row-BALANCED tile plan: each tile covers a contiguous block range
    of up to `blocks_per_tile` blocks whose (lane-aligned) row window fits
    `target_rows`. plan_block_tiles' fixed 128-block tiles pay for the
    heaviest tile everywhere (BAL-16: max_rows 768 vs 487 mean rows/tile
    = 1.6x wasted VPU/MXU/DMA); balancing makes every tile ~target_rows.

    Block starts are floored to 8 so per-tile block-row DMA slices
    (minv / x_pt windows) are sublane-aligned. Returns (tile_starts
    (T+1,) int32 row offsets, tile_block0 (T+1,) int32 first block per
    tile with tile_block0[T] == num_blocks, max_rows). A single block
    with more rows than target_rows gets its own tile (max_rows grows)."""
    sorted_ids = np.asarray(sorted_ids)
    counts = np.bincount(sorted_ids, minlength=num_blocks)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    starts, block0 = [], []
    p = 0
    max_rows = _LANE
    while p < num_blocks:
        row0 = (offsets[p] // _LANE) * _LANE
        # The lane-aligned window reaches BACK into the previous tile's
        # rows; eval_fused gathers those rows' blocks through an 8-aligned
        # window based at the FIRST row's block id (gather_base below), so
        # the tile's own last block must stay within BT of that base.
        first_id = int(sorted_ids[row0]) if row0 < sorted_ids.shape[0] else p
        base = (first_id // 8) * 8
        # largest q in (p, p+BT], q multiple of 8 (or == num_blocks), with
        # rows in budget
        q_hi = min(base + blocks_per_tile, p + blocks_per_tile, num_blocks)
        q = p + 1
        best = q
        while q <= q_hi:
            if offsets[q] - row0 <= target_rows and (
                    q % 8 == 0 or q == num_blocks):
                best = q
            q += 1
        if best == p + 1 and not (best % 8 == 0 or best == num_blocks):
            # fall forward to the next aligned boundary regardless of budget
            best = min(((p + 8) // 8) * 8, num_blocks)
            while offsets[best] - row0 > target_rows and best - p > 8:
                best -= 8
            if best <= p:
                best = min(p + 8, num_blocks)
        starts.append(row0)
        block0.append(p)
        max_rows = max(max_rows, int(offsets[best] - row0))
        p = best
    starts.append((offsets[num_blocks] // _LANE) * _LANE)
    block0.append(num_blocks)
    max_rows = -(-max_rows // _LANE) * _LANE
    return (np.asarray(starts, np.int32), np.asarray(block0, np.int32),
            max_rows)


def row_tile_gather_bases(sorted_ids, tile_starts, num_blocks):
    """Per-tile 8-aligned block-window base for eval_fused's point
    gather: align8(id of the FIRST row in the tile's lane-aligned
    window). The window reaches back into the previous tile's rows, so
    basing the gather at block0[t] would hand those rows the WRONG
    blocks (the round-5 jt-gradient bug: every tile's leading boundary
    rows were evaluated against blocks shifted by the alignment gap,
    poisoning multi-tile jt-mode on both CPU interpret and TPU).
    plan_row_tiles caps tile width so [base, base+BT) covers all owned
    blocks."""
    sorted_ids = np.asarray(sorted_ids)
    ts = np.asarray(tile_starts)
    nb = sorted_ids.shape[0]
    out = np.zeros(ts.shape[0] - 1, np.int32)
    for t in range(ts.shape[0] - 1):
        r0 = int(ts[t])
        fid = int(sorted_ids[r0]) if r0 < nb else num_blocks
        if fid < 0:
            fid = num_blocks
        out[t] = (fid // 8) * 8
    return out


def plan_camera_windows(pt_ids: np.ndarray, cam_ids: np.ndarray,
                        tile_block0: np.ndarray, num_points: int, C: int,
                        width_cap: int = 2048):
    """Per-tile CAMERA windows for the large-C fused matvec.

    The in-VMEM camera one-hot costs O(rows * window) VPU compares + MXU
    MACs per tile; a GLOBAL window (== C_pad) capped the kernel at ~1900
    cameras. With rows sorted by point and points renumbered for camera
    locality, every tile's rows touch a narrow band of cameras — each
    tile then builds its one-hot only over [win0, win0 + n_win*Wc).

    Returns (win_starts (T,) int32 128-aligned, Wc static multiple of 128,
    n_win static chunk count, c_hi = max(win0) + n_win*Wc). Correct for
    ANY structure: a tile whose cameras span more than `width_cap` gets
    covered by n_win sequential window chunks (worst case n_win ~ C/cap —
    always correct, fast when the data has locality). Sentinel ids
    (>= C or < 0) are excluded from the windows; their rows match no
    window chunk and so contribute exactly zero to gather and scatter."""
    pt_ids = np.asarray(pt_ids)
    cam_ids = np.asarray(cam_ids)
    counts = np.bincount(np.minimum(pt_ids, num_points),
                         minlength=num_points + 1)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    tb = np.asarray(tile_block0, np.int64)
    T = tb.shape[0] - 1
    win0 = np.zeros(T, np.int64)
    span = 1
    valid = (cam_ids >= 0) & (cam_ids < C)
    for t in range(T):
        r0, r1 = offsets[min(tb[t], num_points)], offsets[min(tb[t + 1], num_points)]
        cams = cam_ids[r0:r1][valid[r0:r1]]
        if cams.size == 0:
            continue
        lo = (int(cams.min()) // _LANE) * _LANE
        win0[t] = lo
        span = max(span, int(cams.max()) + 1 - lo)
    span = -(-span // _LANE) * _LANE
    Wc = min(span, max(_LANE, (width_cap // _LANE) * _LANE))
    n_win = -(-span // Wc)
    c_hi = int(win0.max()) + n_win * Wc if T else Wc
    return win0.astype(np.int32), int(Wc), int(n_win), c_hi


def segment_block_sum(
    contrib,  # (N, t) per-observation contributions, sorted by target block
    sorted_ids,  # (N,) int32 non-decreasing target block ids
    tile_starts,  # (T+1,) int32 lane-aligned per-tile row offsets
    num_blocks: int,
    blocks_per_tile: int = BLOCKS_PER_TILE,
    max_rows: int = 512,
    interpret: bool = False,
    contrib_T=None,  # (t, N) pre-transposed alternative to `contrib`
):
    """out[b] = sum_{i: sorted_ids[i]==b} contrib[i]. Output padded to a
    multiple of BLOCKS_PER_TILE rows. Pass `contrib_T` (t, N) instead of
    `contrib` when the producer already lives in the lane-major layout —
    (N, t) arrays with small t are 128-lane padded in HBM, so the
    transpose here costs a padded read."""
    assert blocks_per_tile == BLOCKS_PER_TILE, "tile width is fixed at 128"
    if contrib_T is not None:
        t, n = contrib_T.shape
        dtype = contrib_T.dtype
    else:
        n, t = contrib.shape
        dtype = contrib.dtype
        contrib_T = contrib.T
    num_tiles = -(-num_blocks // blocks_per_tile)
    nb_pad = num_tiles * blocks_per_tile
    n_pad = n + max_rows
    t_pad = max(8, -(-t // 8) * 8)  # sublane-aligned component rows
    # Transposed, lane-major layouts (observations on the lane axis).
    contrib_T = jnp.concatenate(
        [contrib_T, jnp.zeros((t_pad - t, n), dtype)], axis=0
    )
    contrib_T = jnp.concatenate(
        [contrib_T, jnp.zeros((t_pad, max_rows), dtype)], axis=1
    )  # (t_pad, n_pad)
    ids_row = jnp.concatenate(
        [sorted_ids.astype(jnp.int32), jnp.full((max_rows,), -1, jnp.int32)]
    )
    ids_T = jnp.broadcast_to(ids_row[None, :], (8, n_pad))  # sublane-replicated

    def kernel(starts_ref, ids_hbm, contrib_hbm, out_ref):
        tile = pl.program_id(0)
        row0 = pl.multiple_of(starts_ref[tile], _LANE)
        block0 = jnp.int32(tile * BLOCKS_PER_TILE)

        def body(ids_vmem, rows_vmem, sem_i, sem_r):
            cp_i = pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(row0, max_rows)], ids_vmem, sem_i
            )
            cp_r = pltpu.make_async_copy(
                contrib_hbm.at[:, pl.ds(row0, max_rows)], rows_vmem, sem_r
            )
            cp_i.start()
            cp_r.start()
            cp_i.wait()
            cp_r.wait()
            ids = ids_vmem[:, :]  # (8, max_rows), sublane-replicated
            # one-hot^T: (BLOCKS_PER_TILE, max_rows); sublane b matches rows
            # whose id == block0 + b.
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (BLOCKS_PER_TILE, max_rows), 0
            )
            idsb = jnp.broadcast_to(ids[:1, :], (BLOCKS_PER_TILE, max_rows))
            dims = (((1,), (1,)), ((), ()))
            if rows_vmem.dtype == jnp.float32:
                # 0/1 one-hot is exact in bf16; a 3-way hi/mid/lo bf16
                # split of the f32 contributions reconstructs ~24 mantissa
                # bits, so three single-pass MXU bf16 dots replace the
                # 6-pass f32-HIGHEST dot at f32-level accuracy.
                f32, bf16 = jnp.float32, jnp.bfloat16
                onehot_T = jnp.where(
                    idsb - block0 == sub, jnp.ones((), f32),
                    jnp.zeros((), f32),
                ).astype(bf16)
                x = rows_vmem[:, :]
                hi = x.astype(bf16)
                rem = x - hi.astype(f32)
                mid = rem.astype(bf16)
                lo = (rem - mid.astype(f32)).astype(bf16)
                acc = jnp.zeros((BLOCKS_PER_TILE, rows_vmem.shape[0]), f32)
                for part in (hi, mid, lo):
                    acc = acc + jax.lax.dot_general(
                        onehot_T, part, dimension_numbers=dims,
                        preferred_element_type=f32,
                    )
                out_ref[:, :] = acc.astype(out_ref.dtype)
            else:
                onehot_T = jnp.where(
                    idsb - block0 == sub,
                    jnp.ones((), rows_vmem.dtype),
                    jnp.zeros((), rows_vmem.dtype),
                )
                # (BT, max_rows) x (t, max_rows) -> (BT, t), contract rows.
                out_ref[:, :] = jax.lax.dot_general(
                    onehot_T,
                    rows_vmem[:, :],
                    dimension_numbers=dims,
                    preferred_element_type=out_ref.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

        pl.run_scoped(
            body,
            pltpu.VMEM((8, max_rows), jnp.int32),
            pltpu.VMEM((t_pad, max_rows), dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # ids stay in HBM
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # contrib stays in HBM
            ],
            out_specs=pl.BlockSpec(
                (BLOCKS_PER_TILE, t_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((nb_pad, t_pad), dtype),
            interpret=interpret,
        )(tile_starts, ids_T, contrib_T)
    return out[:, :t]


def segment_block_expand(
    block_vals,  # (num_blocks, t) per-block values
    sorted_ids,  # (N,) int32 non-decreasing target block ids
    tile_starts,  # (T+1,) int32 lane-aligned per-tile row offsets
    n: int,
    max_rows: int = 512,
    interpret: bool = False,
    transposed_out: bool = False,
):
    """out[i] = block_vals[sorted_ids[i]] — the gather direction of the
    same tiled one-hot trick (expand = vals^T @ onehot on the MXU; no
    per-row gather). Output (n, t), or (t, n) lane-major with
    transposed_out=True (free: the kernel computes that layout anyway,
    and (n, t) costs a padded-layout transpose).

    Tile k's aligned write window can overlap tile k+1's; every tile
    therefore matches against a TWO-tile block range [block0-128, block0+128)
    so each written row is correct, and the sequential grid makes the last
    writer win with correct values."""
    num_blocks, t = block_vals.shape
    num_tiles = -(-num_blocks // BLOCKS_PER_TILE)
    nb_pad = num_tiles * BLOCKS_PER_TILE
    t_pad = max(8, -(-t // 8) * 8)
    n_pad = n + max_rows
    # block b lives at padded lane b + BLOCKS_PER_TILE (zero guard tile in
    # front); transposed so block rows sit on the 128-lane axis.
    vals_p = jnp.zeros((t_pad, nb_pad + BLOCKS_PER_TILE), block_vals.dtype)
    vals_p = vals_p.at[:t, BLOCKS_PER_TILE : BLOCKS_PER_TILE + num_blocks].set(
        block_vals.T
    )
    ids_row = jnp.concatenate(
        [sorted_ids.astype(jnp.int32), jnp.full((max_rows,), -1, jnp.int32)]
    )
    ids_T = jnp.broadcast_to(ids_row[None, :], (8, n_pad))
    W = 2 * BLOCKS_PER_TILE

    def kernel(starts_ref, ids_hbm, vals_hbm, out_hbm):
        tile = pl.program_id(0)
        row0 = pl.multiple_of(starts_ref[tile], _LANE)
        # window base in block space: block0 - 128 (guard tile absorbs t=0)
        base = jnp.int32(tile * BLOCKS_PER_TILE) - BLOCKS_PER_TILE

        def body(ids_vmem, vals_vmem, out_vmem, sem_i, sem_v, sem_o):
            cp_i = pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(row0, max_rows)], ids_vmem, sem_i
            )
            # padded block rows [tile*BT, tile*BT + 2*BT)
            vrow0 = pl.multiple_of(
                jnp.int32(tile * BLOCKS_PER_TILE), BLOCKS_PER_TILE
            )
            cp_v = pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(vrow0, W)], vals_vmem, sem_v
            )
            cp_i.start()
            cp_v.start()
            cp_i.wait()
            cp_v.wait()
            ids = ids_vmem[:, :]
            sub = jax.lax.broadcasted_iota(jnp.int32, (W, max_rows), 0)
            idsb = jnp.broadcast_to(ids[:1, :], (W, max_rows))
            onehot_T = jnp.where(
                idsb - base == sub,
                jnp.ones((), vals_vmem.dtype),
                jnp.zeros((), vals_vmem.dtype),
            )
            # (t_pad, W) x (W, max_rows) -> (t_pad, max_rows)
            out_vmem[:, :] = jax.lax.dot_general(
                vals_vmem[:, :],
                onehot_T,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=out_vmem.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            cp_o = pltpu.make_async_copy(
                out_vmem, out_hbm.at[:, pl.ds(row0, max_rows)], sem_o
            )
            cp_o.start()
            cp_o.wait()

        pl.run_scoped(
            body,
            pltpu.VMEM((8, max_rows), jnp.int32),
            pltpu.VMEM((t_pad, W), block_vals.dtype),
            pltpu.VMEM((t_pad, max_rows), block_vals.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    with jax.enable_x64(False):
        out_T = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            out_shape=jax.ShapeDtypeStruct((t_pad, n_pad), block_vals.dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tile_starts, ids_T, vals_p)
    if transposed_out:
        return out_T[:t, :n]
    return out_T[:t, :n].T


def segment_spread_sum(
    Y,  # (N, ky) per-observation lanes (ky = tp*tc), sorted by point
    cam_ids,  # (N,) int32 camera id per observation
    sorted_ids,  # (N,) int32 non-decreasing point ids
    tile_starts,  # (T+1,) int32 lane-aligned per-tile row offsets
    num_blocks: int,  # number of points
    C: int,  # number of cameras
    tp: int,
    tc: int,
    max_rows: int = 512,
    interpret: bool = False,
    blocks_per_tile: int = BLOCKS_PER_TILE,
    unroll: int = 4,
    Jc=None,  # optional (N, r*tc) scaled camera Jacobian lanes -> also F'F
    r: int = 2,
):
    """Fused spread + segment reduction for the dense-Schur A assembly:

        out[p, i*C*tc + c*tc + j] = sum_{b: point(b)==p} Y[b, i*tc+j] * [cam(b)==c]

    The XLA formulation materializes T = (Y @ H1) * (onehot_cam @ H2) as an
    (N, tp*C*tc) HBM tensor (3 passes of ~N*432*4 bytes at the BAL-16
    shape) before the segment sum. Here the spread lives only in VMEM:
    each tile builds T_T = (H1' Y_T) * (H2' OHcam_T) for its row window
    (two small MXU matmuls) and reduces rows -> points with one
    dot_general — the same tiled one-hot trick as segment_block_sum.
    Measured on v5e at BAL-16: the A assembly drops from ~2.3 ms to the
    DMA floor. Output (num_blocks_padded, tp*C*tc).

    With `Jc` (the (N, r*tc) scaled camera-Jacobian lanes), the kernel
    ALSO accumulates the camera Gram blocks F'F[c] = sum_{b: cam=c}
    sum_r outer(Jc_b[r], Jc_b[r]) across all tiles and returns
    (A, FtF (C, tc*tc)) — the (B, 162)/(B, 81) HBM intermediates of the
    XLA outer-product formulation (measured 0.33 ms at BAL-16) never
    exist; the outer runs as selector matmuls on the VMEM tile and reuses
    the camera one-hot already built for the spread."""
    n, ky = Y.shape
    assert ky == tp * tc
    BT = blocks_per_tile
    t_out = tp * C * tc
    num_tiles = -(-num_blocks // BT)
    # `unroll` tiles per grid program: all the tile DMAs are started before
    # the first tile's compute, so transfers overlap the MXU work instead
    # of stalling at a serial wait every 128 points
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    nb_pad = num_tiles_pad * BT
    n_pad = n + max_rows
    tile_starts = jnp.concatenate([
        jnp.asarray(tile_starts, jnp.int32),
        jnp.full((num_tiles_pad + 1 - tile_starts.shape[0],),
                 jnp.asarray(tile_starts)[-1], jnp.int32),
    ]) if tile_starts.shape[0] < num_tiles_pad + 1 else tile_starts
    ky_pad = max(8, -(-ky // 8) * 8)
    # transposed, lane-major layouts (observations on the lane axis)
    Y_T = jnp.concatenate([Y.T, jnp.zeros((ky_pad - ky, n), Y.dtype)], axis=0)
    Y_T = jnp.concatenate(
        [Y_T, jnp.zeros((ky_pad, max_rows), Y.dtype)], axis=1
    )  # (ky_pad, n_pad)
    pid_row = jnp.concatenate(
        [sorted_ids.astype(jnp.int32), jnp.full((max_rows,), -1, jnp.int32)]
    )
    pid_T = jnp.broadcast_to(pid_row[None, :], (8, n_pad))
    cid_row = jnp.concatenate(
        [cam_ids.astype(jnp.int32), jnp.full((max_rows,), -1, jnp.int32)]
    )
    cid_T = jnp.broadcast_to(cid_row[None, :], (8, n_pad))
    # spread constants in matmul-native orientation: (ky_pad, t_out), (C_pad, t_out)
    C_pad = max(8, -(-C // 8) * 8)
    H1 = np.kron(np.eye(tp), np.kron(np.ones((1, C)), np.eye(tc)))  # (ky, t_out)
    H2 = np.kron(np.ones((1, tp)), np.kron(np.eye(C), np.ones((1, tc))))  # (C, t_out)
    H1M = np.zeros((ky_pad, t_out), np.float32)
    H1M[:ky, :] = H1
    H2M = np.zeros((C_pad, t_out), np.float32)
    H2M[:C, :] = H2
    H1M = jnp.asarray(H1M, Y.dtype)
    H2M = jnp.asarray(H2M, Y.dtype)

    with_ftf = Jc is not None
    if with_ftf:
        rc = r * tc
        rc_pad = max(8, -(-rc // 8) * 8)
        Jc_T = jnp.concatenate(
            [Jc.T, jnp.zeros((rc_pad - rc, n), Jc.dtype)], axis=0
        )
        Jc_T = jnp.concatenate(
            [Jc_T, jnp.zeros((rc_pad, max_rows), Jc.dtype)], axis=1
        )  # (rc_pad, n_pad)

    def kernel(*refs):
        if with_ftf:
            (starts_ref, pid_hbm, cid_hbm, y_hbm, h1_ref, h2_ref,
             jc_hbm, out_ref, ftf_ref) = refs
        else:
            starts_ref, pid_hbm, cid_hbm, y_hbm, h1_ref, h2_ref, out_ref = refs
            jc_hbm = ftf_ref = None
        g = pl.program_id(0)

        def body(pid_vmem, cid_vmem, y_vmem, sem_p, sem_c, sem_y,
                 jc_vmem=None, sem_j=None):
            # start ALL tile DMAs up front; transfers for tile j+1..k
            # overlap tile j's MXU work
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                cps = [
                    pltpu.make_async_copy(
                        pid_hbm.at[:, pl.ds(row0, max_rows)],
                        pid_vmem.at[j], sem_p.at[j],
                    ),
                    pltpu.make_async_copy(
                        cid_hbm.at[:, pl.ds(row0, max_rows)],
                        cid_vmem.at[j], sem_c.at[j],
                    ),
                    pltpu.make_async_copy(
                        y_hbm.at[:, pl.ds(row0, max_rows)],
                        y_vmem.at[j], sem_y.at[j],
                    ),
                ]
                if with_ftf:
                    cps.append(pltpu.make_async_copy(
                        jc_hbm.at[:, pl.ds(row0, max_rows)],
                        jc_vmem.at[j], sem_j.at[j],
                    ))
                for c in cps:
                    c.start()
                copies.append(cps)

            dt = Y.dtype
            f32 = jnp.float32
            bf16 = jnp.bfloat16
            # all dots in the MXU-native (M,K)@(K,N) orientation — a
            # lane-lane contraction would relayout the 432-wide T every tile
            dims = (((1,), (0,)), ((), ()))

            def dot_bf(lhs, rhs):
                return jax.lax.dot_general(
                    lhs, rhs, dimension_numbers=dims,
                    preferred_element_type=f32,
                )

            h1 = h1_ref[:, :].astype(bf16)  # (ky_pad, t_out)
            h2 = h2_ref[:, :].astype(bf16)  # (C_pad, t_out)
            csub = jax.lax.broadcasted_iota(jnp.int32, (C_pad, max_rows), 0)
            sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            if with_ftf:
                ftf_acc = jnp.zeros((C_pad * rc_pad, rc_pad), f32)

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                block0 = (g * unroll + j) * BT
                y_tile = y_vmem[j]
                pid_tile = pid_vmem[j]
                cid_tile = cid_vmem[j]
                # camera one-hot (rows, C_pad); 0/1 exact in bf16 (mask
                # built in f32 then cast: selecting bf16 straight from the
                # i1 compare trips a Mosaic (8,128)->(16,128) relayout)
                cids = jnp.broadcast_to(cid_tile[:1, :],
                                        (C_pad, max_rows))
                ohc_raw = jnp.where(
                    cids == csub, jnp.ones((), f32), jnp.zeros((), f32)
                )  # (C_pad, rows)
                ohc = jnp.transpose(ohc_raw).astype(bf16)  # (rows, C_pad)
                if with_ftf:
                    # F'F tile contribution as a Khatri-Rao masked Gram:
                    # G[(c,k), l] = sum_rows [cam=c] js[k] js[l]. The
                    # (C_pad*rc_pad, rows) left operand is the camera
                    # one-hot replicated per k-lane TIMES the hi/lo bf16
                    # halves of js — every product is bf16-exact (0/1 mask
                    # times an exact half), so four single-pass lane-
                    # contracting MXU dots give f32-quality F'F with no
                    # wide VPU splits (the outer-selector variant spent
                    # ~0.45 ms/iter in split3 on (rows, 162) tiles).
                    js_T = jc_vmem[j][:, :]  # (rc_pad, rows)
                    js_hi = js_T.astype(bf16)
                    js_lo = (js_T - js_hi.astype(f32)).astype(bf16)
                    KRC = C_pad * rc_pad
                    # tile DMA windows OVERLAP (starts floored to 128); the
                    # spread output filters rows via the point one-hot, but
                    # the camera reduction must mask rows to this tile's
                    # point range or they are double counted
                    csel = jax.lax.broadcasted_iota(
                        jnp.int32, (KRC, max_rows), 0) // rc_pad
                    cidk = jnp.broadcast_to(cid_tile[:1, :], (KRC, max_rows))
                    pidk = jnp.broadcast_to(pid_tile[:1, :], (KRC, max_rows))
                    ohm = jnp.where(
                        (cidk == csel) & (pidk >= block0)
                        & (pidk < block0 + BT),
                        jnp.ones((), f32), jnp.zeros((), f32),
                    ).astype(bf16)  # (KRC, rows)
                    tile_hi = jnp.concatenate([js_hi] * C_pad, axis=0)
                    tile_lo = jnp.concatenate([js_lo] * C_pad, axis=0)
                    KR_h = tile_hi * ohm
                    KR_l = tile_lo * ohm
                    dims_ll = (((1,), (1,)), ((), ()))

                    def dot_ll(a, b):
                        return jax.lax.dot_general(
                            a, b, dimension_numbers=dims_ll,
                            preferred_element_type=f32,
                        )

                    ftf_acc = ftf_acc + (
                        dot_ll(KR_h, js_hi) + dot_ll(KR_h, js_lo)
                        + dot_ll(KR_l, js_hi) + dot_ll(KR_l, js_lo)
                    )  # (KRC, rc_pad)
                # Split the Y tile into hi+lo bf16 halves (~1e-5 rel).
                # H1/H2 are 0/1 SELECTORS (one 1 per column), so matmuls
                # against them permute/broadcast exact bf16 values, and
                # one-hot products multiply by exactly 0/1 — the spread
                # stays EXACT bf16 given the split; the final reduction
                # dots are single-pass MXU bf16 with f32 accumulation
                # (~5x the 6-pass f32-HIGHEST throughput).
                y = jnp.transpose(y_tile)  # (rows, ky_pad), small
                y_hi = y.astype(bf16)
                y_lo = (y - y_hi.astype(f32)).astype(bf16)
                a_hi = dot_bf(y_hi, h1).astype(bf16)  # (rows, t_out) exact
                a_lo = dot_bf(y_lo, h1).astype(bf16)  # exact
                bmat = dot_bf(ohc, h2).astype(bf16)  # exact 0/1
                T_hi = a_hi * bmat
                T_lo = a_lo * bmat
                pids = jnp.broadcast_to(pid_tile[:1, :], (BT, max_rows))
                ohp_T = jnp.where(
                    pids - block0 == sub,
                    jnp.ones((), f32), jnp.zeros((), f32),
                ).astype(bf16)  # (BT, rows): contraction is lanes x sublanes
                out_ref[j * BT:(j + 1) * BT, :] = (
                    dot_bf(ohp_T, T_hi) + dot_bf(ohp_T, T_lo)
                ).astype(dt)

            if with_ftf:
                # accumulate the grid-wide F'F: sequential grid revisits
                # the same output block, so read-modify-write is ordered
                @pl.when(g == 0)
                def _init():
                    ftf_ref[:, :] = ftf_acc.astype(ftf_ref.dtype)

                @pl.when(g > 0)
                def _acc():
                    ftf_ref[:, :] = ftf_ref[:, :] + ftf_acc.astype(
                        ftf_ref.dtype)

        scratch = [
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, ky_pad, max_rows), Y.dtype),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
        ]
        if with_ftf:
            scratch += [
                pltpu.VMEM((unroll, rc_pad, max_rows), Jc.dtype),
                pltpu.SemaphoreType.DMA((unroll,)),
            ]
        pl.run_scoped(body, *scratch)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    a_spec = pl.BlockSpec(
        (unroll * BT, t_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    a_shape = jax.ShapeDtypeStruct((nb_pad, t_out), Y.dtype)
    with jax.enable_x64(False):
        if with_ftf:
            out, ftf = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=in_specs + [
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # Jc in HBM
                ],
                out_specs=(
                    a_spec,
                    pl.BlockSpec((C_pad * rc_pad, rc_pad),
                                 lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    a_shape,
                    jax.ShapeDtypeStruct((C_pad * rc_pad, rc_pad),
                                         Y.dtype),
                ),
                interpret=interpret,
            )(tile_starts, pid_T, cid_T, Y_T, H1M, H2M, Jc_T)
            # G[(c,k), l] -> F'F[c, i*tc+j] = sum_r G[c, r*tc+i, r*tc+j]
            G = ftf[: C * rc_pad].reshape(C, rc_pad, rc_pad)
            FtF = sum(
                G[:, q * tc:(q + 1) * tc, q * tc:(q + 1) * tc]
                for q in range(r)
            )
            return out, FtF.reshape(C, tc * tc)
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=a_spec,
            out_shape=a_shape,
            interpret=interpret,
        )(tile_starts, pid_T, cid_T, Y_T, H1M, H2M)
    return out


def _sel01(shape, fn):
    """Small 0/1 selector constant built in-kernel from iota comparisons
    (no VMEM input per constant; the compiler hoists them out of the
    tile loop). fn(row_idx, col_idx) -> bool."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.where(fn(r, c), jnp.ones((), jnp.float32),
                     jnp.zeros((), jnp.float32))


def implicit_schur_matvec(
    JT,  # (r*gf + r*ge, n_pad) transposed scaled GROUPED J lanes [Jf | Je]
    ids_T,  # (8, n_pad) int32: sublane 0 = point ids (sorted; sentinel ==
    #         num_points), sublane 1 = camera ids (sentinel >= C)
    z_T,  # (gf, C_pad) transposed camera vector, zero-padded past C / tf
    blk_hbm,  # (>= num_points+1+BT, w) per-point rows: minv (isc) / x (normal)
    tile_starts,  # (T+1,) int32 lane-aligned per-tile row offsets
    tile_block0,  # (T+1,) int32 first point of each tile; [T] == num_points+1
    num_points: int,
    C: int,
    r: int,
    tf: int,
    te: int,
    max_rows: int = 512,
    unroll: int = 4,
    interpret: bool = False,
    mode: str = "isc",
    emit_u: bool = True,
    win_starts=None,  # (T,) int32 128-aligned camera window base per tile
    win_width: int = 0,  # static window chunk width (multiple of 128)
    n_win: int = 1,  # static chunks per tile (window span / win_width)
    masks_T=None,  # (256, n_pad) int8/bf16 from build_matvec_masks
    blk_tiled: bool = False,  # blk_hbm is a PER-TILE pretransposed table
):
    """The whole implicit-Schur product S·z in ONE Pallas kernel
    (implicit_schur_complement.cc:106 on TPU). Per observation tile:

        fz   = F_s z                   (camera gather = in-VMEM one-hot matmul)
        etfz = E_s' fz                 (point-segment reduce)
        u    = (E'E+D_e^2)^{-1} etfz   (per-point block matvec, flat lanes)
        q    = fz - E_s u              (point expand via the SAME one-hot)
        cam += F_s' q                  (masked camera one-hot accumulate)

    Returns (cam (gf, C_pad) TRANSPOSED, u (num_points+1+BT, ge)); the caller adds
    d2f*z. The u output doubles as back-substitution: y_e = minv(etb) -
    u(z_final). mode="normal" computes (J'J)x instead (the CGNR hot op,
    cgnr_solver.cc role): jv = F_s x_c + E_s x_p over x rows from
    blk_hbm; returns (cam = F_s'jv, pt = E_s'jv).

    Performance structure (v5e measurements):
     - ROW-BALANCED tiles (plan_row_tiles): each tile covers a variable
       point range sized to ~target_rows observations, vs fixed
       128-point tiles paying everywhere for the heaviest tile (BAL-16:
       768 budget vs 487 mean rows). Per-tile point bases come from SMEM;
       per-point rows (minv / x) are DMA'd per tile at the 8-aligned
       point base; the u/pt output is written per tile with overlapping
       128-row windows where the sequential grid makes the last writer
       win (same trick as segment_block_expand).
     - J lanes are packed in 8-ALIGNED GROUPS per residual row (gf =
       ceil(tf/8)*8 lanes per row of Jf, ge for Je) so ALL row algebra —
       fz, E'fz contributions, E u, F'q — is exact-f32 VPU elementwise +
       sublane reductions + (1, rows) broadcasts. The selector-matmul
       formulation paid ~10 MXU dots x 6 f32-HIGHEST passes per tile;
       this leaves exactly FOUR one-hot MXU dots.
     - The 4 dots use the exact hi/mid/lo bf16 3-way split of the DATA
       operand against the bf16-exact 0/1 one-hot: 3 single-pass dots at
       ~f32 accuracy, 2x the 6-pass HIGHEST throughput.
     - J is read from HBM ONCE per matvec (the XLA flat-ops chain pays
       ~15 B-wide HBM passes).

    Why one kernel suffices: tiles own complete points — every row of a
    point lives in exactly one tile's DMA window — so the segment
    reduction completes in-tile and the per-point solve + expand follow
    immediately. Window rows belonging to other tiles' points are masked
    out of both reductions and handled by their own tile.

    Large C (`win_starts` given, from plan_camera_windows): the camera
    one-hot is built per tile only over `n_win` chunks of `win_width`
    cameras starting at the tile's 128-aligned window base — the z gather
    reads a dynamic lane slice of the VMEM-resident z, and the camera
    scatter read-modify-writes a dynamic sublane window of the output
    block (zeroed once at grid step 0; the sequential grid makes RMW
    race-free). O(rows * n_win*win_width) per tile instead of
    O(rows * C_pad): Venice-class C (~13.7k) runs at the cost of its
    locality window, removing the ~1900-camera cap
    (visibility_based_preconditioner.cc:127 scale regime).

    Streamed masks (`masks_T` given, from build_matvec_masks): the
    structure-constant one-hot planes are DMA'd from HBM instead of being
    rebuilt in VPU registers every matvec — the r3 cost model showed the
    mask builds dominating (~4.3 ns/obs vs 0.24 ns/obs of J traffic).
    Camera chunks become 128 wide (low mask = onehot(cam % 128) is
    tile-independent; the per-row hi index (cam - base)//128 selects the
    chunk with a (1, rows)-broadcast fold), and the point one-hot is
    owner-relative with the in-tile validity folded into the (ge, rows)
    contribution lanes. Identical math; the kernel becomes DMA/MXU-bound."""
    lanes_pad, n_pad = JT.shape
    BT = BLOCKS_PER_TILE
    num_tiles = tile_block0.shape[0] - 1
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    assert z_T.shape[0] == gf
    C_pad = z_T.shape[1]
    normal = mode == "normal"
    assert lanes_pad == r * gf + r * ge
    windowed = win_starts is not None
    if windowed:
        win_starts = jnp.asarray(win_starts, jnp.int32)
        assert win_width % _LANE == 0 and win_width > 0
    if num_tiles_pad > num_tiles:
        pad = num_tiles_pad - num_tiles
        tile_starts = jnp.concatenate(
            [jnp.asarray(tile_starts, jnp.int32),
             jnp.broadcast_to(jnp.asarray(tile_starts)[-1:], (pad,))])
        tile_block0 = jnp.concatenate(
            [jnp.asarray(tile_block0, jnp.int32),
             jnp.broadcast_to(jnp.asarray(tile_block0)[-1:], (pad,))])
        if windowed:
            win_starts = jnp.concatenate(
                [win_starts, jnp.broadcast_to(win_starts[-1:], (pad,))])
    dt = JT.dtype
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    w_blk = blk_hbm.shape[1]
    nb_out = num_points + 1 + BT
    # pretransposed rows per tile (blk_tiled): isc carries the (te x te)
    # col-grouped Minv (te*8 rows), normal carries the x point rows (8)
    tb8 = max(8, te * 8) if normal is False else 8
    if blk_tiled:
        # (>= num_tiles_pad * tb8, BT) table from build_minv_tile_table /
        # build_pt_tile_table: per-tile rows, lane c = point b0+c — no
        # in-kernel transpose, tb8 of 128 sublanes DMA'd instead of the
        # full (BT, 128) point-row window (5-16x less blk traffic; the
        # dominant DMA plane at Venice scale).
        assert w_blk == BT
        assert blk_hbm.shape[0] >= num_tiles_pad * tb8, (
            blk_hbm.shape, num_tiles_pad, tb8)
    else:
        assert blk_hbm.shape[0] >= nb_out
    streamed = masks_T is not None
    n_chunks = (n_win * win_width) // _LANE if windowed else C_pad // _LANE
    if streamed:
        assert masks_T.shape == (256, JT.shape[1]), masks_T.shape
        mdt = masks_T.dtype
    n_split = SPLIT_PASSES

    def split3(x):
        hi = x.astype(bf16)
        if n_split == 1:
            return (hi,)
        rem = x - hi.astype(f32)
        mid = rem.astype(bf16)
        if n_split == 2:
            return hi, mid
        lo = (rem - mid.astype(f32)).astype(bf16)
        return hi, mid, lo

    def kernel(*refs):
        if windowed:
            win_ref, refs = refs[0], refs[1:]
        else:
            win_ref = None
        masks_hbm = None
        if streamed:
            masks_hbm, refs = refs[0], refs[1:]
        if emit_u:
            (starts_ref, block0_ref, ids_hbm, jt_hbm, z_ref,
             blk_hbm_ref, cam_out, pt_hbm) = refs
        else:
            (starts_ref, block0_ref, ids_hbm, jt_hbm, z_ref,
             blk_hbm_ref, cam_out) = refs
            pt_hbm = None
        g = pl.program_id(0)

        def body(ids_vmem, jt_vmem, blk_vmem, msk_vmem, out_vmem,
                 sem_i, sem_j, sem_b, sem_m, sem_o):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                b0 = pl.multiple_of(block0_ref[g * unroll + j], 8)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, max_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        jt_hbm.at[:, pl.ds(row0, max_rows)],
                        jt_vmem.at[j], sem_j.at[j]),
                    pltpu.make_async_copy(
                        blk_hbm_ref.at[pl.ds(pl.multiple_of(
                            (g * unroll + j) * tb8, 8), tb8), :]
                        if blk_tiled else
                        blk_hbm_ref.at[pl.ds(b0, BT), :],
                        blk_vmem.at[j], sem_b.at[j]),
                ]
                if streamed:
                    cps.append(pltpu.make_async_copy(
                        masks_hbm.at[:, pl.ds(row0, max_rows)],
                        msk_vmem.at[j], sem_m.at[j]))
                if _ABL_NO_DMA:
                    cps = []
                for c in cps:
                    c.start()
                copies.append(cps)

            d_mm = (((1,), (0,)), ((), ()))
            d_ll = (((1,), (1,)), ((), ()))
            HI = jax.lax.Precision.HIGHEST

            def _stack16(parts):
                """Concat split parts along sublanes, each padded to the
                bf16 tile height (16) so slices of the fused dot's output
                land on tile boundaries."""
                m = parts[0].shape[0]
                mp = max(16, -(-m // 16) * 16)
                if mp != m:
                    parts = [jnp.concatenate(
                        [p, jnp.zeros((mp - m, p.shape[1]), p.dtype)],
                        axis=0) for p in parts]
                return jnp.concatenate(parts, axis=0), mp

            # The one-hot dots have narrow data operands (gf=16 / ge=8
            # sublanes) that the MXU pads to 128 — at 3 exact-split
            # passes each, ~90% of the systolic work was padding
            # (ablation r4: dots were ~12 of 26 ms/matvec at Venice
            # scale, not the mask builds). STACKING the split passes
            # (and, for the camera side, the window chunks) into ONE
            # dot pays the padding once instead of 3x(chunks) times.
            def dot3(data, oh_b, d):
                """Exact-split data (f32, (m, K)) x 0/1 one-hot (bf16):
                one stacked single-pass bf16 dot with f32 accumulation."""
                parts = split3(data)
                if len(parts) == 1:
                    return jax.lax.dot_general(
                        parts[0], oh_b, dimension_numbers=d,
                        preferred_element_type=f32)
                st, mp = _stack16(list(parts))
                out = jax.lax.dot_general(
                    st, oh_b, dimension_numbers=d,
                    preferred_element_type=f32)
                m = data.shape[0]
                return sum(out[i * mp: i * mp + m]
                           for i in range(len(parts)))

            def dot3l(oh_b, data, d):
                parts = split3(data)
                if len(parts) == 1:
                    return jax.lax.dot_general(
                        oh_b, parts[0], dimension_numbers=d,
                        preferred_element_type=f32)
                st, mp = _stack16(list(parts))
                out = jax.lax.dot_general(
                    oh_b, st, dimension_numbers=d,
                    preferred_element_type=f32)
                m = data.shape[0]
                return sum(out[:, i * mp: i * mp + m]
                           for i in range(len(parts)))

            te2p = max(8, -(-te * te // 8) * 8)

            @pl.when(g == 0)
            def _zero_cam():
                cam_out[:, :] = jnp.zeros((gf, C_pad), cam_out.dtype)

            if not streamed:
                csub = jax.lax.broadcasted_iota(
                    jnp.int32, (_LANE, max_rows), 0)
                sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)
            out_cp = None

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                b0 = block0_ref[g * unroll + j]
                b1 = block0_ref[g * unroll + j + 1]
                jt = jt_vmem[j]
                pid1 = ids_vmem[j][0:1, :]
                cid1 = ids_vmem[j][1:2, :]
                in_tile = jnp.where(
                    (pid1 >= b0) & (pid1 < b1), one, zero)
                # Camera one-hot factored LOW x HI: the 128-wide LOW
                # one-hot (onehot(cam % 128)) is TILE-INDEPENDENT
                # (chunk bases are 128-aligned) and is either DMA'd
                # (streamed) or built once per tile; the HI chunk index
                # (cam - base)//128 selects the chunk with a cheap
                # (1, rows)-broadcast fold. Rows whose camera lies below
                # the window (non-owned rows of the 128-aligned DMA
                # padding) hit chunk 0 via the truncating div, but their
                # contributions die at the point one-hot / in-tile masks.
                if streamed:
                    mk = msk_vmem[j]
                    ohc_lo = mk[0:128, :].astype(bf16)
                    ohp_b = mk[128:256, :].astype(bf16)
                else:
                    lo1 = cid1 - _LANE * jax.lax.div(cid1, jnp.int32(_LANE))
                    ohc_lo = jnp.where(
                        jnp.broadcast_to(lo1, (_LANE, max_rows)) == csub,
                        one, zero).astype(bf16)
                    pid = jnp.broadcast_to(pid1, (BT, max_rows))
                    ohp_b = jnp.where(
                        (pid - b0 == sub) & (pid < b1) & (pid < num_points),
                        one, zero).astype(bf16)
                if windowed:
                    w0 = pl.multiple_of(win_ref[g * unroll + j], _LANE)
                    hi1 = jax.lax.div(cid1 - w0, jnp.int32(_LANE))
                else:
                    w0 = 0
                    hi1 = jax.lax.div(cid1, jnp.int32(_LANE))
                chunks = []
                zparts = []
                for kk in range(n_chunks):
                    c0 = pl.multiple_of(w0 + kk * _LANE, _LANE)
                    sel = jnp.where(hi1 == kk, one, zero)
                    chunks.append((c0, sel))
                    if not _ABL_NO_CAM:
                        zparts.extend(split3(z_ref[:, pl.ds(c0, _LANE)]))
                if zparts:
                    # ONE stacked gather dot for all chunks x split
                    # passes (M = n_split*n_chunks*gf instead of gf)
                    zs = jnp.concatenate(zparts, axis=0)
                    zg_all = jax.lax.dot_general(
                        zs, ohc_lo, dimension_numbers=d_mm,
                        preferred_element_type=f32)
                    zg = None
                    for kk in range(n_chunks):
                        acc = None
                        for p in range(n_split):
                            i0 = (kk * n_split + p) * gf
                            sl = zg_all[i0: i0 + gf]
                            acc = sl if acc is None else acc + sl
                        part = acc * chunks[kk][1]
                        zg = part if zg is None else zg + part
                else:
                    zg = jnp.zeros((gf, max_rows), f32)
                Jf_g = [jt[i * gf:(i + 1) * gf, :] for i in range(r)]
                off_e = r * gf
                Je_g = [jt[off_e + i * ge: off_e + (i + 1) * ge, :]
                        for i in range(r)]
                fz = [jnp.sum(Jf_g[i] * zg, axis=0, keepdims=True)
                      for i in range(r)]  # r x (1, rows)
                blk = blk_vmem[j][:, :]
                if normal:
                    xp_rows = dot3(
                        blk if blk_tiled
                        else jnp.transpose(blk[:, :ge]), ohp_b, d_mm)
                    jv = [fz[i] + jnp.sum(Je_g[i] * xp_rows, axis=0,
                                          keepdims=True) for i in range(r)]
                    ce = sum(
                        Je_g[i] * jnp.broadcast_to(jv[i], (ge, max_rows))
                        for i in range(r))
                    if streamed:
                        # the streamed point one-hot is owner-relative:
                        # zero non-owned rows' contributions here instead
                        # of in the mask
                        ce = ce * jnp.broadcast_to(in_tile, (ge, max_rows))
                    tile_out = dot3l(ohp_b, ce, d_ll)  # (BT, ge)
                    q = jv
                elif _ABL_NO_PT:
                    tile_out = jnp.zeros((BT, ge), f32)
                    q = fz
                else:
                    ce = sum(
                        Je_g[i] * jnp.broadcast_to(fz[i], (ge, max_rows))
                        for i in range(r))
                    if streamed:
                        ce = ce * jnp.broadcast_to(in_tile, (ge, max_rows))
                    # u[p] = Minv[p] (E'fz)[p] = sum_{rows of p} Minv[p] ce
                    # — gather Minv per ROW (one stacked dot), apply the
                    # (te x te) matvec in SUBLANE-GROUPED form, scatter w
                    # with the SAME one-hot. Minv is stored COLUMN-grouped
                    # (lane k*8+i = M{i,k}, see isc_matvec) so the row
                    # matvec is te full-width (8, rows) FMAs with cheap
                    # sublane slices/broadcasts — the r4 row-major layout
                    # paid te*te sublane-starved (1, rows) products here.
                    # (A lane-space variant — point-level Minv apply on the
                    # (BT, lanes) block — measured SLOWER: Mosaic lane
                    # slices/broadcasts at non-128 offsets relayout.)
                    minv_T = (blk if blk_tiled
                              else jnp.transpose(blk[:, :te * 8]))
                    minv_rows = dot3(
                        minv_T, ohp_b, d_mm
                    )  # (te*8, rows): sublane k*8+i = M{i,k}
                    w = sum(
                        minv_rows[k * 8:(k + 1) * 8, :]
                        * jnp.broadcast_to(ce[k:k + 1, :], (8, max_rows))
                        for k in range(te))
                    # scatter w to points in TRANSPOSED (8, BT) form: the
                    # split-stacked output then folds on SUBLANES (free)
                    # where the (BT, m)-oriented dot3l folded on LANE
                    # offsets (Mosaic relayout, ~60 us/matvec on BAL-16,
                    # r5 ablation) — and the u-per-row gather needs no
                    # transpose at all.
                    tile_out_T = dot3(w, ohp_b, d_ll)  # (8, BT) = u'
                    u_rows = dot3(tile_out_T, ohp_b, d_mm)
                    q = [fz[i] - jnp.sum(Je_g[i] * u_rows, axis=0,
                                         keepdims=True) for i in range(r)]
                # u/pt write (emit_u only — the CG loop skips it and only
                # the final back-substitution call pays for it):
                # overlapping windows; the sequential grid makes the LAST
                # writer win, and every point's final writer is the tile
                # that owns it (segment_block_expand's trick)
                if emit_u:
                    if not normal and not _ABL_NO_PT:
                        # transpose only on emit calls — the CG loop runs
                        # with emit_u=False and never pays for it
                        tile_out = jnp.transpose(tile_out_T)
                    if out_cp is not None:
                        out_cp.wait()
                    out_vmem[j, :, :] = jnp.concatenate([
                        tile_out,
                        jnp.zeros((BT, _LANE - tile_out.shape[1]), f32),
                    ], axis=1).astype(out_vmem.dtype)
                    b0a = pl.multiple_of(block0_ref[g * unroll + j], 8)
                    out_cp = pltpu.make_async_copy(
                        out_vmem.at[j], pt_hbm.at[pl.ds(b0a, BT), :], sem_o)
                    out_cp.start()
                # mask boundary rows on the narrow cf tile (gf sublanes)
                cf = sum(
                    Jf_g[i] * jnp.broadcast_to(q[i], (gf, max_rows))
                    for i in range(r)) * jnp.broadcast_to(
                        in_tile, (gf, max_rows))
                if not _ABL_NO_CAM:
                    # ONE stacked scatter dot for all chunks x split
                    # passes, then per-chunk RMW of the 128-row window
                    cf_parts = []
                    for c0, sel in chunks:
                        cf_parts.extend(split3(
                            cf * jnp.broadcast_to(sel, (gf, max_rows))))
                    cfs = jnp.concatenate(cf_parts, axis=0)
                    # transposed accumulator (gf, C_pad): full 128-lane
                    # RMW windows instead of 16-lane-narrow ones
                    cam_all = jax.lax.dot_general(
                        cfs, ohc_lo, dimension_numbers=d_ll,
                        preferred_element_type=f32)  # (nc*ns*gf, 128)
                    for kk, (c0, sel) in enumerate(chunks):
                        camq = None
                        for p in range(n_split):
                            i0 = (kk * n_split + p) * gf
                            sl = cam_all[i0: i0 + gf, :]
                            camq = sl if camq is None else camq + sl
                        cur = cam_out[:, pl.ds(c0, _LANE)]
                        cam_out[:, pl.ds(c0, _LANE)] = (
                            cur + camq.astype(cam_out.dtype))
            if out_cp is not None:
                out_cp.wait()

        msk_scratch = (pltpu.VMEM((unroll, 256, max_rows), mdt)
                       if streamed else
                       pltpu.VMEM((unroll, 8, _LANE), jnp.int8))
        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, lanes_pad, max_rows), dt),
            pltpu.VMEM((unroll, tb8, BT) if blk_tiled
                       else (unroll, BT, w_blk), blk_hbm.dtype),
            msk_scratch,
            pltpu.VMEM((unroll, BT, _LANE), dt),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA(()),
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # z_T
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # per-point rows
    ]
    inputs = (tile_starts, tile_block0, ids_T, JT, z_T, blk_hbm)
    if streamed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] + in_specs
        inputs = (masks_T,) + inputs
    if windowed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (win_starts,) + inputs
    cam_spec = pl.BlockSpec((gf, C_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    cam_shape = jax.ShapeDtypeStruct((gf, C_pad), dt)
    with jax.enable_x64(False):
        if emit_u:
            cam_out, pt_out = pl.pallas_call(
                kernel,
                grid=(grid,),
                in_specs=in_specs,
                out_specs=(cam_spec,
                           pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)),
                out_shape=(cam_shape,
                           jax.ShapeDtypeStruct((nb_out, _LANE), dt)),
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
                interpret=interpret,
            )(*inputs)
            return cam_out, pt_out
        cam_out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=cam_spec,
            out_shape=cam_shape,
            interpret=interpret,
        )(*inputs)
        return cam_out, None


def schur_assembly(
    JT,  # (r*gf + r*ge, n_pad) UNscaled grouped J lanes [Jf | Je]
    ids_T,  # (8, n_pad) int32: row 0 point ids (sorted), row 1 camera ids
    sc_T,  # (gf, C_pad) camera Jacobi scales, zero-padded
    pw_hbm,  # (>= P+1+BT, 128) per-point rows: [0:8)=sp, [8:24)=Kf, [24:32)=u
    tile_starts,  # (T+1,) int32 row offsets (plan_row_tiles)
    tile_block0,  # (T+1,) int32 first point per tile
    num_points: int,
    C: int,
    r: int,
    tf: int,
    te: int,
    max_rows: int = 512,
    unroll: int = 4,
    interpret: bool = False,
    mode: str = "dense",
):
    """The ENTIRE dense-Schur reduced-system assembly in ONE kernel.

    Per observation tile (point-aligned, row-balanced):

        Js_f = J_f * sc[cam]          (camera one-hot scale gather)
        Js_p = J_p * sp[point]        (point-window scale)
        W_b  = Js_p' Js_c             (per-row VPU outer, grouped lanes)
        Y_b  = Kf[point] W_b          (L^{-1} W', the eliminator's y-block)
        A    = point-reduce of the (C-spread of Y)      [in VMEM only]
        S   -= A'A      FtF[cam] += Js_c' Js_c     rhs -= (u-weighted T)

    Returns (AtA (t_full, t_full), FtF (C_pad, tf*gf), U (8, t_full))
    with t_full = C*tf; the caller assembles S = blockdiag(FtF) + D² -
    AtA and rhs = ftb - U[0] (U[0] == A'u).

    vs the staged pipeline (expand + W/Y selector algebra + spread kernel
    + FtF Khatri-Rao + (P*te, t_full) A materialization + A'A einsum):
    the (B, te*t_full) spread tensor, W, Y, AND A itself never exist in
    HBM — the only kernel outputs are the tiny accumulators (measured
    1.25 ms of the 2.0 ms step collapse into this kernel).
    reference: schur_complement_solver.cc:101 (DENSE_SCHUR assembly),
    schur_eliminator_impl.h:184 (chunk outer products).

    mode="schur_jacobi" computes block-diag(S) instead
    (schur_jacobi_preconditioner.h:78): pw carries Minv in the Kf slot
    and the kernel returns (corr (C_pad, tf*gf) = per-camera reduce of
    W' Minv W, FtF (C_pad, tf*gf), zeros) — the caller forms
    blocks[c] = scaled F'F + D_f^2 - corr. The A spread / Gram / rhs
    stages are skipped entirely."""
    lanes_pad, n_pad = JT.shape
    BT = BLOCKS_PER_TILE
    num_tiles = tile_block0.shape[0] - 1
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    assert lanes_pad == r * gf + r * ge
    assert sc_T.shape[0] == gf
    C_pad = sc_T.shape[1]
    t_full = C * tf
    if num_tiles_pad > num_tiles:
        pad = num_tiles_pad - num_tiles
        tile_starts = jnp.concatenate([
            jnp.asarray(tile_starts, jnp.int32),
            jnp.broadcast_to(jnp.asarray(tile_starts)[-1:], (pad,))])
        tile_block0 = jnp.concatenate([
            jnp.asarray(tile_block0, jnp.int32),
            jnp.broadcast_to(jnp.asarray(tile_block0)[-1:], (pad,))])
    dt = JT.dtype
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def split3(x):
        hi = x.astype(bf16)
        rem = x - hi.astype(f32)
        mid = rem.astype(bf16)
        lo = (rem - mid.astype(f32)).astype(bf16)
        return hi, mid, lo

    def kernel(starts_ref, block0_ref, ids_hbm, jt_hbm, sc_ref, pw_hbm_ref,
               ata_out, ftf_out, u_out):
        g = pl.program_id(0)

        def body(ids_vmem, jt_vmem, pw_vmem, sem_i, sem_j, sem_p):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                b0 = pl.multiple_of(block0_ref[g * unroll + j], 8)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, max_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        jt_hbm.at[:, pl.ds(row0, max_rows)],
                        jt_vmem.at[j], sem_j.at[j]),
                    pltpu.make_async_copy(
                        pw_hbm_ref.at[pl.ds(b0, BT), :],
                        pw_vmem.at[j], sem_p.at[j]),
                ]
                for c in cps:
                    c.start()
                copies.append(cps)

            d_mm = (((1,), (0,)), ((), ()))
            d_ll = (((1,), (1,)), ((), ()))
            HI = jax.lax.Precision.HIGHEST

            def dot3(data, oh_b, d):
                out = None
                for part in split3(data):
                    t = jax.lax.dot_general(
                        part, oh_b, dimension_numbers=d,
                        preferred_element_type=f32)
                    out = t if out is None else out + t
                return out

            def dot3l(oh_b, data, d):
                out = None
                for part in split3(data):
                    t = jax.lax.dot_general(
                        oh_b, part, dimension_numbers=d,
                        preferred_element_type=f32)
                    out = t if out is None else out + t
                return out

            # spread selectors over ONE grouped Y component (gf lanes)
            H1f = _sel01((gf, t_full),
                         lambda a, b: a == (b % tf)).astype(bf16)
            H2f = _sel01((C_pad, t_full),
                         lambda c, b: (b // tf) == c).astype(bf16)

            jacobi = mode == "schur_jacobi"
            if jacobi:
                ata_acc = jnp.zeros((C_pad, tf * gf), f32)  # W'MinvW reduce
            else:
                ata_acc = jnp.zeros((t_full, t_full), f32)
            ftf_acc = jnp.zeros((C_pad, tf * gf), f32)
            u_acc = jnp.zeros((8, t_full), f32)
            csub = jax.lax.broadcasted_iota(jnp.int32, (C_pad, max_rows), 0)
            sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                b0 = block0_ref[g * unroll + j]
                b1 = block0_ref[g * unroll + j + 1]
                jt = jt_vmem[j]
                pid1 = ids_vmem[j][0:1, :]
                pid = jnp.broadcast_to(pid1, (BT, max_rows))
                cid = jnp.broadcast_to(ids_vmem[j][1:2, :],
                                       (C_pad, max_rows))
                ohc_raw = jnp.where(cid == csub, one, zero)  # (C_pad, rows)
                ohc_b = ohc_raw.astype(bf16)
                ohp_b = jnp.where(
                    (pid - b0 == sub) & (pid < b1) & (pid < num_points),
                    one, zero).astype(bf16)
                in_tile = jnp.where((pid1 >= b0) & (pid1 < b1), one, zero)
                Jf_g = [jt[i * gf:(i + 1) * gf, :] for i in range(r)]
                off_e = r * gf
                Je_g = [jt[off_e + i * ge: off_e + (i + 1) * ge, :]
                        for i in range(r)]
                # scales per row
                scg = dot3(sc_ref[:, :], ohc_b, d_mm)  # (gf, rows)
                pw = pw_vmem[j]
                sp_rows = dot3(jnp.transpose(pw[:, 0:8]), ohp_b, d_mm)
                Kf_rows = dot3(jnp.transpose(pw[:, 8:24]), ohp_b, d_mm)
                u_rows = dot3(jnp.transpose(pw[:, 24:32]), ohp_b, d_mm)
                Jsf = [Jf_g[i] * scg for i in range(r)]
                Jsp = [Je_g[i] * sp_rows for i in range(r)]
                # W_k (gf, rows) = sum_r Jsp[r][k] * Jsf[r]
                W = [sum(jnp.broadcast_to(Jsp[i][k:k + 1, :],
                                          (gf, max_rows)) * Jsf[i]
                         for i in range(r)) for k in range(te)]
                # Y_i (gf, rows) = sum_k Kf[i*te+k] * W_k
                Y = [sum(jnp.broadcast_to(Kf_rows[i * te + k:i * te + k + 1,
                                                  :], (gf, max_rows)) * W[k]
                         for k in range(te)) for i in range(te)]
                def dot_bf(a, b):
                    return jax.lax.dot_general(
                        a, b, dimension_numbers=d_mm,
                        preferred_element_type=f32)

                if jacobi:
                    # corr[c][a,b] = sum_{rows: cam=c} sum_i W_i[a] Y_i[b]
                    Ocorr = jnp.concatenate([
                        sum(jnp.broadcast_to(W[k][a:a + 1, :],
                                             (gf, max_rows)) * Y[k]
                            for k in range(te))
                        for a in range(tf)], axis=0)  # (tf*gf, rows)
                    Ocorr = Ocorr * jnp.broadcast_to(
                        in_tile, (tf * gf, max_rows))
                    ata_acc = ata_acc + dot3l(ohc_b, Ocorr, d_ll)
                    O = jnp.concatenate([
                        sum(jnp.broadcast_to(Jsf[i][k:k + 1, :],
                                             (gf, max_rows)) * Jsf[i]
                            for i in range(r))
                        for k in range(tf)], axis=0)
                    O = O * jnp.broadcast_to(in_tile, (tf * gf, max_rows))
                    ftf_acc = ftf_acc + dot3l(ohc_b, O, d_ll)
                    continue

                ohcT = jnp.transpose(ohc_raw).astype(bf16)  # (rows, C_pad)
                bmat = dot_bf(ohcT, H2f).astype(bf16)  # (rows, t_full) 0/1
                # per residual component i: T_i, A_i, Gram, rhs — Mosaic
                # cannot reshape (BT, te*t_full) -> (te*BT, t_full), and
                # A'A = sum_i A_i'A_i splits exactly per component
                rhs_row = None
                for i in range(te):
                    y_iT = jnp.transpose(Y[i])  # (rows, gf)
                    y_hi = y_iT.astype(bf16)
                    y_lo = (y_iT - y_hi.astype(f32)).astype(bf16)
                    a_hi = dot_bf(y_hi, H1f).astype(bf16)  # exact perm
                    a_lo = dot_bf(y_lo, H1f).astype(bf16)
                    T_hi = a_hi * bmat
                    T_lo = a_lo * bmat
                    A_i = (dot_bf(ohp_b, T_hi)
                           + dot_bf(ohp_b, T_lo))  # (BT, t_full) f32
                    ata_acc = ata_acc + jax.lax.dot_general(
                        A_i, A_i, dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32, precision=HI)
                    ui = u_rows[i:i + 1, :]
                    for su in split3(ui):
                        contr = (jax.lax.dot_general(
                            su, T_hi, dimension_numbers=d_mm,
                            preferred_element_type=f32)
                            + jax.lax.dot_general(
                                su, T_lo, dimension_numbers=d_mm,
                                preferred_element_type=f32))
                        rhs_row = contr if rhs_row is None else (
                            rhs_row + contr)
                u_acc = u_acc + jnp.concatenate(
                    [rhs_row, jnp.zeros((7, t_full), f32)], axis=0)
                # FtF: per-camera Gram of the scaled camera lanes
                O = jnp.concatenate([
                    sum(jnp.broadcast_to(Jsf[i][k:k + 1, :],
                                         (gf, max_rows)) * Jsf[i]
                        for i in range(r))
                    for k in range(tf)], axis=0)  # (tf*gf, rows)
                O = O * jnp.broadcast_to(in_tile, (tf * gf, max_rows))
                ftf_acc = ftf_acc + dot3l(ohc_b, O, d_ll)

            @pl.when(g == 0)
            def _init():
                ata_out[:, :] = ata_acc.astype(ata_out.dtype)
                ftf_out[:, :] = ftf_acc.astype(ftf_out.dtype)
                u_out[:, :] = u_acc.astype(u_out.dtype)

            @pl.when(g > 0)
            def _acc():
                ata_out[:, :] = ata_out[:, :] + ata_acc.astype(ata_out.dtype)
                ftf_out[:, :] = ftf_out[:, :] + ftf_acc.astype(ftf_out.dtype)
                u_out[:, :] = u_out[:, :] + u_acc.astype(u_out.dtype)

        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, lanes_pad, max_rows), dt),
            pltpu.VMEM((unroll, BT, _LANE), dt),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
        )

    ata_shape = ((C_pad, tf * gf) if mode == "schur_jacobi"
                 else (t_full, t_full))
    with jax.enable_x64(False):
        ata, ftf, u = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # sc_T
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # pw
            ],
            out_specs=(
                pl.BlockSpec(ata_shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C_pad, tf * gf), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, t_full), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(ata_shape, dt),
                jax.ShapeDtypeStruct((C_pad, tf * gf), dt),
                jax.ShapeDtypeStruct((8, t_full), dt),
            ),
            interpret=interpret,
        )(tile_starts, tile_block0, ids_T, JT, sc_T, pw_hbm)
    return ata, ftf, u


def padded_rows(B: int, max_rows: int) -> int:
    """Common padded row-axis width: rows [B, ceil128(B)) absorb the
    last real tile's window; rows [ceil128(B), n_pad) are the DISJOINT
    write region for unroll-padding tiles (eval_fused writes there so
    they can never clobber real rows)."""
    return -(-B // _LANE) * _LANE + max_rows


def prep_matvec_rows(Jf, Je, pt_ids, cam_ids, max_rows, r, tf, te):
    """Host/jit-side prep for implicit_schur_matvec, once per evaluation
    (loop-invariant across CG iterations): transposed GROUPED J lanes —
    each residual row's tf/te lanes padded to an 8-aligned sublane group
    (gf/ge) so the kernel's row algebra slices at aligned offsets — plus
    sublane-replicated id planes. Padding rows get id -1."""
    B = Jf.shape[0]
    dt = Jf.dtype
    n_pad = padded_rows(B, max_rows)

    def group(J, t):
        g = max(8, -(-t // 8) * 8)
        if g == t:
            return J
        Jg = jnp.zeros((B, r, g), dt)
        Jg = jax.lax.dynamic_update_slice(Jg, J.reshape(B, r, t), (0, 0, 0))
        return Jg.reshape(B, r * g)

    pad = n_pad - B
    JT = jnp.concatenate([group(Jf, tf).T, group(Je, te).T], axis=0)
    JT = jnp.concatenate(
        [JT, jnp.zeros((JT.shape[0], pad), dt)], axis=1)
    pid_row = jnp.concatenate(
        [pt_ids.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    cid_row = jnp.concatenate(
        [cam_ids.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    # ONE id plane: pid on sublane 0, cid on sublane 1 (halves the id DMA)
    ids_T = jnp.concatenate([
        pid_row[None, :], cid_row[None, :],
        jnp.zeros((6, n_pad), jnp.int32)], axis=0)
    return JT, ids_T


def build_matvec_masks(pt_ids, cam_ids, tile_block0, num_points,
                       max_rows, dtype=jnp.int8):
    """STRUCTURE-CONSTANT one-hot mask planes for the streamed-mask matvec
    (implicit_schur_matvec masks_T=...). The in-kernel mask builds
    (camera-window + point one-hots, ~3 VPU ops x 384 elements per row)
    were the kernel's bottleneck — ~4.3 ns/obs vs a ~0.24 ns/obs J-traffic
    bound (ROADMAP r3 cost model). The masks depend only on the sparsity
    STRUCTURE, so they are built once (outside the LM loop) and streamed
    from HBM: the kernel's VPU work collapses to int8->bf16 converts plus
    a per-row hi-chunk fold.

    Layout (256, n_pad) `dtype` (int8 by default — half the DMA of bf16):
     - rows [0, 128): camera LOW one-hot = onehot(cam % 128). Window chunk
       bases are 128-aligned, so (cam - base) % 128 == cam % 128 for every
       tile — the low mask is TILE-INDEPENDENT; the kernel selects the
       chunk via the cheap per-row hi index (cam - base) // 128.
     - rows [128, 256): point one-hot RELATIVE TO THE OWNER TILE's first
       point (tile_block0). Rows that appear in a neighboring tile's
       128-aligned DMA window scatter into wrong slots there; the kernel
       zeroes their contributions with the (1, rows) in-tile mask (which
       it already computes), so only the owner tile counts them.
    Sentinel ids (<0 or >= num_points) get all-zero one-hot rows."""
    pt_ids = jnp.asarray(pt_ids, jnp.int32)
    cam_ids = jnp.asarray(cam_ids, jnp.int32)
    B = pt_ids.shape[0]
    n_pad = padded_rows(B, max_rows)
    tb = jnp.asarray(tile_block0, jnp.int32)
    # owner tile of each row's point: t with tb[t] <= pid < tb[t+1]
    pid_c = jnp.clip(pt_ids, 0, num_points)
    owner = jnp.searchsorted(tb[1:-1], pid_c, side="right").astype(jnp.int32)
    b0 = tb[owner]
    iot = jnp.arange(128, dtype=jnp.int32)[:, None]
    ohc = ((cam_ids[None, :] % 128) == iot) & (cam_ids[None, :] >= 0)
    loc = jnp.where((pt_ids >= 0) & (pt_ids < num_points),
                    pt_ids - b0, jnp.int32(-1))
    ohp = loc[None, :] == iot
    m = jnp.concatenate([ohc, ohp], axis=0).astype(dtype)
    return jnp.concatenate(
        [m, jnp.zeros((256, n_pad - B), dtype)], axis=1)


def build_minv_tile_table(minv_flat, tile_block0, te: int,
                          pad_tiles: int = 16):
    """PER-TILE pretransposed Minv table for the fused S·z kernel
    (isc_matvec minv_tiled=...): rows [t*te*8 + k*8 + i], lane c =
    M{i,k} of point tile_block0[t] + c. Built ONCE per LM linearization
    (loop-invariant across CG iterations) in plain XLA; the kernel then
    DMAs 24 sublanes per tile instead of the (128, 128) point-row window
    and skips the in-kernel (BT, 24) transpose."""
    tb = np.asarray(tile_block0)
    T = tb.shape[0] - 1
    P, te2 = minv_flat.shape
    assert te2 == te * te and te <= 8
    dt = minv_flat.dtype
    tb8 = max(8, te * 8)
    m3 = minv_flat.reshape(P, te, te)
    cg = jnp.concatenate(
        [jnp.transpose(m3, (0, 2, 1)),
         jnp.zeros((P, te, 8 - te), dt)], axis=2).reshape(P, tb8)
    pad_rows = int(tb[:-1].max(initial=0)) + BLOCKS_PER_TILE - P
    if pad_rows > 0:
        cg = jnp.concatenate([cg, jnp.zeros((pad_rows, tb8), dt)], axis=0)
    idx = tb[:-1, None] + np.arange(BLOCKS_PER_TILE)[None, :]  # (T, BT)
    tbl = jnp.transpose(cg[jnp.asarray(idx)], (0, 2, 1))  # (T, tb8, BT)
    tbl = tbl.reshape(T * tb8, BLOCKS_PER_TILE)
    return jnp.concatenate(
        [tbl, jnp.zeros((pad_tiles * tb8, BLOCKS_PER_TILE), dt)], axis=0)


def build_pt_tile_table(xp_rows, tile_block0, pad_tiles: int = 16):
    """PER-TILE pretransposed point-vector table for normal-mode
    (J'J)x (normal_matvec): rows [t*8 + i], lane c = x[tile_block0[t]+c, i].
    Built per matvec in plain XLA (a ~1 MB gather) so the kernel DMAs 8
    sublanes per tile instead of the (128, 128) window."""
    tb = np.asarray(tile_block0)
    T = tb.shape[0] - 1
    P, m = xp_rows.shape
    assert m <= 8
    dt = xp_rows.dtype
    if m < 8:
        xp_rows = jnp.concatenate(
            [xp_rows, jnp.zeros((P, 8 - m), dt)], axis=1)
    pad_rows = int(tb[:-1].max(initial=0)) + BLOCKS_PER_TILE - P
    if pad_rows > 0:
        xp_rows = jnp.concatenate(
            [xp_rows, jnp.zeros((pad_rows, 8), dt)], axis=0)
    idx = tb[:-1, None] + np.arange(BLOCKS_PER_TILE)[None, :]
    tbl = jnp.transpose(xp_rows[jnp.asarray(idx)], (0, 2, 1))
    tbl = tbl.reshape(T * 8, BLOCKS_PER_TILE)
    return jnp.concatenate(
        [tbl, jnp.zeros((pad_tiles * 8, BLOCKS_PER_TILE), dt)], axis=0)


def _cam_pad(C, windows):
    C_pad = max(_LANE, -(-(C + 1) // _LANE) * _LANE)
    if windows is not None:
        C_pad = max(C_pad, windows[3])
    return C_pad


def isc_matvec(JT, ids_T, z, minv_flat, tile_starts, tile_block0,
               num_points, C, r, tf, te, max_rows=512, unroll=4,
               interpret=False, emit_u=True, windows=None, masks_T=None,
               minv_tiled=None):
    """Fused S·z (see implicit_schur_matvec): z (C*tf,) camera vector,
    minv_flat (num_points, te*te). Returns (Sz_wo_diag (C*tf,),
    u (num_points, te) or None when emit_u=False) — caller adds d2f*z.
    `windows` = plan_camera_windows output for the large-C path;
    `masks_T` = build_matvec_masks output for the streamed-mask path."""
    dt = JT.dtype
    assert te <= 8, "in-kernel point solve assumes one 8-lane group"
    C_pad = _cam_pad(C, windows)
    gf = max(8, -(-tf // 8) * 8)
    z_T = jnp.zeros((gf, C_pad), dt)
    z_T = jax.lax.dynamic_update_slice(z_T, z.reshape(C, tf).T, (0, 0))
    nb = num_points + 1 + BLOCKS_PER_TILE
    if minv_tiled is not None:
        # prebuilt per-tile pretransposed table (build_minv_tile_table):
        # the fast path for CG loops — build once per linearization
        blk = minv_tiled
        tiled = True
    else:
        # HBM->VMEM copies need 128-aligned minor dims: pad the per-point
        # rows. Minv goes in COLUMN-GROUPED layout (lane k*8+i = M{i,k},
        # zeros for i >= te); the kernel transposes the window in-VMEM.
        P = minv_flat.shape[0]
        m3 = minv_flat.reshape(P, te, te)  # [p, i, k]
        cg = jnp.concatenate(
            [jnp.transpose(m3, (0, 2, 1)),
             jnp.zeros((P, te, 8 - te), dt)], axis=2).reshape(P, te * 8)
        blk = jnp.zeros((nb, _LANE), dt)
        blk = jax.lax.dynamic_update_slice(blk, cg, (0, 0))
        tiled = False
    wkw = dict(win_starts=windows[0], win_width=windows[1],
               n_win=windows[2]) if windows is not None else {}
    cam, u = implicit_schur_matvec(
        JT, ids_T, z_T, blk, tile_starts, tile_block0, num_points,
        C, r, tf, te, max_rows=max_rows, unroll=unroll, interpret=interpret,
        mode="isc", emit_u=emit_u, masks_T=masks_T, blk_tiled=tiled, **wkw)
    return (cam[:tf, :C].T.reshape(-1),
            u[:num_points, :te] if emit_u else None)


def normal_matvec(JT, ids_T, xc, xp, tile_starts, tile_block0,
                  num_points, C, r, tf, te, max_rows=512, unroll=4,
                  interpret=False, windows=None, masks_T=None):
    """Fused (J'J)x for the e/f split (CGNR hot op): xc (C*tf,),
    xp (num_points, te). Returns (cam (C*tf,), pt (num_points, te)) —
    caller adds D² x."""
    dt = JT.dtype
    C_pad = _cam_pad(C, windows)
    gf = max(8, -(-tf // 8) * 8)
    z_T = jnp.zeros((gf, C_pad), dt)
    z_T = jax.lax.dynamic_update_slice(z_T, xc.reshape(C, tf).T, (0, 0))
    blk = build_pt_tile_table(xp, tile_block0)
    wkw = dict(win_starts=windows[0], win_width=windows[1],
               n_win=windows[2]) if windows is not None else {}
    cam, pt = implicit_schur_matvec(
        JT, ids_T, z_T, blk, tile_starts, tile_block0, num_points,
        C, r, tf, te, max_rows=max_rows, unroll=unroll, interpret=interpret,
        mode="normal", emit_u=True, masks_T=masks_T, blk_tiled=True, **wkw)
    return cam[:tf, :C].T.reshape(-1), pt[:num_points, :te]


def post_eval_fused(
    JT,  # (r*gf + r*ge, n_pad) UNscaled grouped J lanes [Jf | Je]
    ids_T,  # (8, n_pad) int32 id planes (prep_matvec_rows)
    rT,  # (8, n_pad) residual rows: sublane i = residual component i
    tile_starts,
    tile_block0,
    num_points: int,
    C: int,
    r: int,
    tf: int,
    te: int,
    max_rows: int = 512,
    unroll: int = 8,
    interpret: bool = False,
    win_starts=None,
    win_width: int = 0,
    n_win: int = 1,
    masks_T=None,
):
    """The ENTIRE per-iteration post-evaluation reduce in ONE J pass
    (program_evaluator.h:252-284's gradient accumulation + Jacobi-scale
    column norms + the eliminator's E'E diagonal blocks,
    schur_eliminator_impl.h:184 chunk pass): per observation tile

        g_e  += Je' u      sqn_e += Je.^2     ete += Je' Je   (per point)
        g_f  += Jf' u      sqn_f += Jf.^2                     (per camera)

    Returns (cam (2*gf, C_pad) transposed: sublanes [0,gf) = g_f rows,
    [gf, 2gf) = sqn_f rows; pt (num_points+1+BT, 128): lanes [0,te) g_e,
    [te,2te) sqn_e, [2te, 2te+te*te) ete flat).

    The XLA chain this replaces (fused_post_eval) builds (B, 2t+t*t)
    contribution arrays through selector matmuls — several B-wide HBM
    round trips per iteration (~95 ms of the 642 ms Venice iteration in
    r3). Here J is read once and everything reduces in VMEM."""
    lanes_pad, n_pad = JT.shape
    BT = BLOCKS_PER_TILE
    num_tiles = tile_block0.shape[0] - 1
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    windowed = win_starts is not None
    n_chunks = (n_win * win_width) // _LANE if windowed else None
    streamed = masks_T is not None
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    dt = JT.dtype
    assert lanes_pad == r * gf + r * ge
    we = 2 * te + te * te
    assert we <= _LANE
    if windowed:
        c_hi = int(np.asarray(win_starts).max()) + n_win * win_width
        C_pad = max(_LANE, -(-(C + 1) // _LANE) * _LANE, c_hi)
        win_starts = jnp.asarray(win_starts, jnp.int32)
    else:
        C_pad = max(_LANE, -(-(C + 1) // _LANE) * _LANE)
    n_split = SPLIT_PASSES

    def split3(x):
        hi = x.astype(bf16)
        if n_split == 1:
            return (hi,)
        rem = x - hi.astype(f32)
        mid = rem.astype(bf16)
        if n_split == 2:
            return hi, mid
        lo = (rem - mid.astype(f32)).astype(bf16)
        return hi, mid, lo

    if num_tiles_pad > num_tiles:
        pad = num_tiles_pad - num_tiles
        tile_starts = jnp.concatenate(
            [jnp.asarray(tile_starts, jnp.int32),
             jnp.broadcast_to(jnp.asarray(tile_starts)[-1:], (pad,))])
        tile_block0 = jnp.concatenate(
            [jnp.asarray(tile_block0, jnp.int32),
             jnp.broadcast_to(jnp.asarray(tile_block0)[-1:], (pad,))])
        if windowed:
            win_starts = jnp.concatenate(
                [win_starts, jnp.broadcast_to(win_starts[-1:], (pad,))])
    nb_out = num_points + 1 + BT

    def kernel(*refs):
        if windowed:
            win_ref, refs = refs[0], refs[1:]
        else:
            win_ref = None
        masks_hbm = None
        if streamed:
            masks_hbm, refs = refs[0], refs[1:]
        (starts_ref, block0_ref, ids_hbm, jt_hbm, r_hbm, cam_out,
         pt_hbm) = refs
        g = pl.program_id(0)
        C_pad_l = cam_out.shape[1]
        nck = n_chunks if windowed else C_pad_l // _LANE

        def body(ids_vmem, jt_vmem, r_vmem, msk_vmem, out_vmem,
                 sem_i, sem_j, sem_r, sem_m, sem_o):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, max_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        jt_hbm.at[:, pl.ds(row0, max_rows)],
                        jt_vmem.at[j], sem_j.at[j]),
                    pltpu.make_async_copy(
                        r_hbm.at[:, pl.ds(row0, max_rows)],
                        r_vmem.at[j], sem_r.at[j]),
                ]
                if streamed:
                    cps.append(pltpu.make_async_copy(
                        masks_hbm.at[:, pl.ds(row0, max_rows)],
                        msk_vmem.at[j], sem_m.at[j]))
                for c in cps:
                    c.start()
                copies.append(cps)

            d_mm = (((1,), (0,)), ((), ()))
            d_ll = (((1,), (1,)), ((), ()))

            @pl.when(g == 0)
            def _zero_cam():
                cam_out[:, :] = jnp.zeros(
                    (2 * gf, C_pad_l), cam_out.dtype)

            if not streamed:
                csub = jax.lax.broadcasted_iota(
                    jnp.int32, (_LANE, max_rows), 0)
                sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)
            out_cp = None

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                b0 = block0_ref[g * unroll + j]
                b1 = block0_ref[g * unroll + j + 1]
                jt = jt_vmem[j]
                pid1 = ids_vmem[j][0:1, :]
                cid1 = ids_vmem[j][1:2, :]
                in_tile = jnp.where(
                    (pid1 >= b0) & (pid1 < b1), one, zero)
                if streamed:
                    mk = msk_vmem[j]
                    ohc_lo = mk[0:128, :].astype(bf16)
                    ohp_b = mk[128:256, :].astype(bf16)
                else:
                    lo1 = cid1 - _LANE * jax.lax.div(cid1, jnp.int32(_LANE))
                    ohc_lo = jnp.where(
                        jnp.broadcast_to(lo1, (_LANE, max_rows)) == csub,
                        one, zero).astype(bf16)
                    pid = jnp.broadcast_to(pid1, (BT, max_rows))
                    ohp_b = jnp.where(
                        (pid - b0 == sub) & (pid < b1)
                        & (pid < num_points), one, zero).astype(bf16)
                if windowed:
                    w0 = pl.multiple_of(win_ref[g * unroll + j], _LANE)
                    hi1 = jax.lax.div(cid1 - w0, jnp.int32(_LANE))
                else:
                    w0 = 0
                    hi1 = jax.lax.div(cid1, jnp.int32(_LANE))
                Jf_g = [jt[i * gf:(i + 1) * gf, :] for i in range(r)]
                off_e = r * gf
                Je_g = [jt[off_e + i * ge: off_e + (i + 1) * ge, :]
                        for i in range(r)]
                u_r = [r_vmem[j][i:i + 1, :] for i in range(r)]

                # e-side per-row lanes: [g_e | sqn_e | ete] (we <= 16)
                ge_rows = sum(Je_g[i] * jnp.broadcast_to(
                    u_r[i], (ge, max_rows)) for i in range(r))
                se_rows = sum(Je_g[i] * Je_g[i] for i in range(r))
                parts_e = [ge_rows[:te, :], se_rows[:te, :]]
                for a in range(te):
                    ete_a = sum(
                        Je_g[i][a:a + 1, :] * Je_g[i][:te, :]
                        for i in range(r))
                    parts_e.append(ete_a)
                w_e = jnp.concatenate(parts_e, axis=0)  # (we, rows)
                wep = max(16, -(-we // 16) * 16)
                if wep != we:
                    w_e = jnp.concatenate(
                        [w_e, jnp.zeros((wep - we, max_rows), f32)], 0)
                w_e = w_e * jnp.broadcast_to(in_tile, (wep, max_rows))
                # stacked split dot against the point one-hot
                pe_parts = split3(w_e)
                st = jnp.concatenate(pe_parts, axis=0)
                out_all = jax.lax.dot_general(
                    ohp_b, st, dimension_numbers=d_ll,
                    preferred_element_type=f32)  # (BT, ns*wep)
                tile_out = sum(out_all[:, i * wep: i * wep + wep]
                               for i in range(len(pe_parts)))
                if out_cp is not None:
                    out_cp.wait()
                out_vmem[j, :, :] = jnp.concatenate([
                    tile_out,
                    jnp.zeros((BT, _LANE - wep), f32)], axis=1
                ).astype(out_vmem.dtype)
                b0a = pl.multiple_of(block0_ref[g * unroll + j], 8)
                out_cp = pltpu.make_async_copy(
                    out_vmem.at[j], pt_hbm.at[pl.ds(b0a, BT), :], sem_o)
                out_cp.start()

                # f-side per-row lanes: [g_f rows | sqn_f rows] (2*gf)
                gf_rows = sum(Jf_g[i] * jnp.broadcast_to(
                    u_r[i], (gf, max_rows)) for i in range(r))
                sf_rows = sum(Jf_g[i] * Jf_g[i] for i in range(r))
                w_f = jnp.concatenate([gf_rows, sf_rows], axis=0)
                w_f = w_f * jnp.broadcast_to(in_tile, (2 * gf, max_rows))
                cf_parts = []
                chunks = []
                for kk in range(nck):
                    c0 = pl.multiple_of(w0 + kk * _LANE, _LANE)
                    sel = jnp.where(hi1 == kk, one, zero)
                    chunks.append((c0, sel))
                    cf_parts.extend(split3(
                        w_f * jnp.broadcast_to(sel, (2 * gf, max_rows))))
                cfs = jnp.concatenate(cf_parts, axis=0)
                cam_all = jax.lax.dot_general(
                    cfs, ohc_lo, dimension_numbers=d_ll,
                    preferred_element_type=f32)  # (nck*ns*2gf, 128)
                m2 = 2 * gf
                for kk, (c0, sel) in enumerate(chunks):
                    camq = None
                    for p in range(len(pe_parts)):
                        i0 = (kk * len(pe_parts) + p) * m2
                        sl = cam_all[i0: i0 + m2, :]
                        camq = sl if camq is None else camq + sl
                    cur = cam_out[:, pl.ds(c0, _LANE)]
                    cam_out[:, pl.ds(c0, _LANE)] = (
                        cur + camq.astype(cam_out.dtype))
            if out_cp is not None:
                out_cp.wait()

        msk_scratch = (pltpu.VMEM((unroll, 256, max_rows), masks_T.dtype)
                       if streamed else
                       pltpu.VMEM((unroll, 8, _LANE), jnp.int8))
        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, lanes_pad, max_rows), dt),
            pltpu.VMEM((unroll, 8, max_rows), rT.dtype),
            msk_scratch,
            pltpu.VMEM((unroll, BT, _LANE), dt),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA(()),
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # rT
    ]
    inputs = (tile_starts, tile_block0, ids_T, JT, rT)
    if streamed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] + in_specs
        inputs = (masks_T,) + inputs
    if windowed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (win_starts,) + inputs
    cam_spec = pl.BlockSpec((2 * gf, C_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        cam_out, pt_out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(cam_spec,
                       pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)),
            out_shape=(jax.ShapeDtypeStruct((2 * gf, C_pad), dt),
                       jax.ShapeDtypeStruct((nb_out, _LANE), dt)),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*inputs)
    return cam_out, pt_out


def eval_fused(
    xf_T,  # (ga, C_pad) camera AMBIENT params, transposed, zero-padded
    pw_pts,  # (>= P+1+BT, 128) point params rows (lanes [0, ae))
    obs_T,  # (do, n_pad) per-observation data lanes
    ids_T,  # (8, n_pad) id planes (prep_matvec_rows layout)
    tile_starts,
    tile_block0,
    gather_bases,  # (T,) int32 row_tile_gather_bases: pw window bases
    num_points: int,
    C: int,
    r: int,
    tf: int,
    te: int,
    rows_fn,  # (cam (ga, rows), pt (ae_pad, rows), obs) -> (r, rows)
    max_rows: int = 512,
    unroll: int = 8,
    interpret: bool = False,
    win_starts=None,
    win_width: int = 0,
    n_win: int = 1,
    masks_T=None,
    loss_rho=None,  # s -> (rho, rho', rho'') for robust losses
    pj_cols_f=None,  # x_rows -> [tf x (af, rows)] PlusJacobian columns
    pj_cols_e=None,  # x_rows -> [te x (ae, rows)]
):
    """The ENTIRE residual + Jacobian evaluation in ONE kernel for the
    qualified (single-kind, Euclidean) structure — the
    ProgramEvaluator hot loop (program_evaluator.h:189) on TPU terms:
    per observation tile

        cam  = one-hot gather of camera params   (exact 3-split dots)
        pt   = one-hot gather of point params
        res  = rows_fn(cam, pt, obs)             (user residual, traced
                                                  in row-vectorized form)
        J    = tf+te jvp passes of rows_fn       (forward-mode, in VMEM)

    and writes rT + the TRANSPOSED grouped JT lanes directly — the form
    every downstream kernel (post_eval_fused, implicit_schur_matvec,
    sj_assembly_windowed) consumes. The XLA chain this replaces paid
    ~100 ms/iteration at Venice scale (gathers + unfused elementwise +
    rank-3 jacobian materialization + the transposing prep); observed
    kernel cost is a few ms. Also returns the masked cost partials.

    Correctness of the overlapping 128-aligned tile windows: rows are
    written by every tile whose DMA window covers them, sequential-grid
    last-writer-wins; the final writer is the OWNER tile, whose camera
    window / point table slice cover its rows by plan construction
    (non-owner tiles may compute garbage for those rows — dead writes).
    """
    BT = BLOCKS_PER_TILE
    num_tiles = tile_block0.shape[0] - 1
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    lanes_pad = r * gf + r * ge
    ga, C_pad = xf_T.shape
    do_, n_pad = obs_T.shape
    windowed = win_starts is not None
    n_chunks = (n_win * win_width) // _LANE if windowed else C_pad // _LANE
    streamed = masks_T is not None
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    n_split = SPLIT_PASSES
    assert max_rows % _LANE == 0 and max_rows // _LANE <= 8

    def split3(x):
        hi = x.astype(bf16)
        if n_split == 1:
            return (hi,)
        rem = x - hi.astype(f32)
        mid = rem.astype(bf16)
        if n_split == 2:
            return hi, mid
        lo = (rem - mid.astype(f32)).astype(bf16)
        return hi, mid, lo

    if windowed:
        win_starts = jnp.asarray(win_starts, jnp.int32)
    if num_tiles_pad > num_tiles:
        # padding tiles get a DISJOINT row window (the [ceil128(B), n_pad)
        # region, sentinel rows only) and an empty point range, so their
        # garbage writes can never clobber a real tile's rows
        pad = num_tiles_pad - num_tiles
        row0_pad = n_pad - max_rows
        # padding tiles are indices [T, T+pad): they read starts[T:] —
        # the final real starts entry is read by NO real tile (b1 comes
        # from block0), so it too becomes the disjoint padding window
        tile_starts = jnp.concatenate(
            [jnp.asarray(tile_starts, jnp.int32)[:-1],
             jnp.full((pad + 1,), row0_pad, jnp.int32)])
        tile_block0 = jnp.concatenate(
            [jnp.asarray(tile_block0, jnp.int32),
             jnp.broadcast_to(jnp.asarray(tile_block0)[-1:], (pad,))])
        gather_bases = jnp.concatenate(
            [jnp.asarray(gather_bases, jnp.int32),
             jnp.broadcast_to(jnp.asarray(gather_bases)[-1:], (pad,))])
        if windowed:
            win_starts = jnp.concatenate(
                [win_starts, jnp.broadcast_to(win_starts[-1:], (pad,))])
    gather_bases = jnp.asarray(gather_bases, jnp.int32)

    def kernel(*refs):
        if windowed:
            win_ref, refs = refs[0], refs[1:]
        else:
            win_ref = None
        masks_hbm = None
        if streamed:
            masks_hbm, refs = refs[0], refs[1:]
        (starts_ref, block0_ref, gbase_ref, ids_hbm, obs_hbm, xf_ref,
         pw_hbm_ref, jt_hbm, rt_hbm, cost_out) = refs
        g = pl.program_id(0)

        def body(ids_vmem, obs_vmem, pw_vmem, msk_vmem, jt_vmem, rt_vmem,
                 sem_i, sem_ob, sem_p, sem_m, sem_j, sem_r):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                # point window based at the FIRST row's block id
                # (row_tile_gather_bases): the lane-aligned row window
                # reaches BACK into the previous tile's rows, whose
                # blocks sit below block0[t] — basing the gather at
                # block0[t] evaluated those boundary rows against the
                # wrong blocks (the round-5 multi-tile jt-gradient bug)
                b0 = pl.multiple_of(gbase_ref[g * unroll + j], 8)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, max_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        obs_hbm.at[:, pl.ds(row0, max_rows)],
                        obs_vmem.at[j], sem_ob.at[j]),
                    pltpu.make_async_copy(
                        pw_hbm_ref.at[pl.ds(b0, BT), :],
                        pw_vmem.at[j], sem_p.at[j]),
                ]
                if streamed:
                    cps.append(pltpu.make_async_copy(
                        masks_hbm.at[:, pl.ds(row0, max_rows)],
                        msk_vmem.at[j], sem_m.at[j]))
                for c in cps:
                    c.start()
                copies.append(cps)

            d_mm = (((1,), (0,)), ((), ()))

            @pl.when(g == 0)
            def _zero_cost():
                cost_out[:, :] = jnp.zeros((8, _LANE), cost_out.dtype)

            if not streamed:
                csub = jax.lax.broadcasted_iota(
                    jnp.int32, (_LANE, max_rows), 0)
                sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)
            out_cps = []
            cost_acc = jnp.zeros((8, max_rows), f32)

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                b0 = block0_ref[g * unroll + j]
                b1 = block0_ref[g * unroll + j + 1]
                b0x = gbase_ref[g * unroll + j]
                pid1 = ids_vmem[j][0:1, :]
                cid1 = ids_vmem[j][1:2, :]
                in_tile = jnp.where(
                    (pid1 >= b0) & (pid1 < b1), one, zero)
                if streamed:
                    mk = msk_vmem[j]
                    ohc_lo = mk[0:128, :].astype(bf16)
                else:
                    lo1 = cid1 - _LANE * jax.lax.div(cid1, jnp.int32(_LANE))
                    ohc_lo = jnp.where(
                        jnp.broadcast_to(lo1, (_LANE, max_rows)) == csub,
                        one, zero).astype(bf16)
                # The POINT gather one-hot is always built in-kernel
                # relative to the per-tile gather base b0x (NOT the
                # streamed owner-relative plane and NOT block0[t]): every
                # row of the lane-aligned window — including the leading
                # rows whose points belong to the PREVIOUS tile — must
                # gather its true point so the written lanes are correct
                # for whichever tile writes last.
                subx = jax.lax.broadcasted_iota(
                    jnp.int32, (BT, max_rows), 0)
                pidx = jnp.broadcast_to(pid1, (BT, max_rows))
                ohp_b = jnp.where(
                    (pidx - b0x == subx) & (pidx >= 0)
                    & (pidx < num_points), one, zero).astype(bf16)
                if windowed:
                    w0 = pl.multiple_of(win_ref[g * unroll + j], _LANE)
                    hi1 = jax.lax.div(cid1 - w0, jnp.int32(_LANE))
                else:
                    w0 = 0
                    hi1 = jax.lax.div(cid1, jnp.int32(_LANE))
                # EXACT camera param gather (split3 is lossless: the
                # bf16 components reconstruct the f32 value, and the
                # one-hot dot sums exactly one term per row)
                zparts = []
                chunks = []
                for kk in range(n_chunks):
                    c0 = pl.multiple_of(w0 + kk * _LANE, _LANE)
                    sel = jnp.where(hi1 == kk, one, zero)
                    chunks.append((c0, sel))
                    zparts.extend(split3(xf_ref[:, pl.ds(c0, _LANE)]))
                zs = jnp.concatenate(zparts, axis=0)
                zg_all = jax.lax.dot_general(
                    zs, ohc_lo, dimension_numbers=d_mm,
                    preferred_element_type=f32)
                cam_rows = None
                for kk in range(n_chunks):
                    acc = None
                    for p in range(n_split):
                        i0 = (kk * n_split + p) * ga
                        sl = zg_all[i0: i0 + ga]
                        acc = sl if acc is None else acc + sl
                    part = acc * chunks[kk][1]
                    cam_rows = part if cam_rows is None else cam_rows + part
                # EXACT point param gather
                pw = pw_vmem[j]
                pparts = list(split3(jnp.transpose(pw[:, 0:8])))
                pst = jnp.concatenate(pparts, axis=0)
                pg_all = jax.lax.dot_general(
                    pst, ohp_b, dimension_numbers=d_mm,
                    preferred_element_type=f32)
                pt_rows = sum(pg_all[i * 8: i * 8 + 8]
                              for i in range(len(pparts)))
                obs_rows = obs_vmem[j][:, :]

                res = rows_fn(cam_rows, pt_rows, obs_rows)  # (r, rows)
                jf_lanes = [[None] * gf for _ in range(r)]
                je_lanes = [[None] * ge for _ in range(r)]
                iot_a = jax.lax.broadcasted_iota(
                    jnp.int32, (ga, max_rows), 0)
                iot_e = jax.lax.broadcasted_iota(jnp.int32, (8, max_rows), 0)
                # '+ x*0' defeats constant folding of the one-hot basis
                # tangents: Mosaic crashes slicing the folded splat
                # constants (vector_extract_slice on a dim-1 layout)
                zt_a = cam_rows * 0.0
                zt_e = pt_rows * 0.0

                def _pad_cols(cols, g, zt):
                    # manifold tangent-basis columns, zero-padded to the
                    # gathered lane height; '+ zt' keeps Euclidean
                    # sub-columns (constant one-hots) out of the splat
                    # constant folder (see the Mosaic note above)
                    out = []
                    for c in cols:
                        if c.shape[0] < g:
                            c = jnp.concatenate(
                                [c, jnp.zeros((g - c.shape[0], max_rows),
                                              f32)], axis=0)
                        out.append(c + zt)
                    return out

                # Manifold chain rule IN the kernel (the unconditional
                # J_global . PlusJacobian at residual_block.cc:70-196):
                # instead of multiplying the ambient Jacobian afterwards,
                # feed PlusJacobian's columns as the jvp tangents — the
                # emitted lanes are tangent-space directly.
                cols_f = (_pad_cols(pj_cols_f(cam_rows), ga, zt_a)
                          if pj_cols_f is not None else None)
                cols_e = (_pad_cols(pj_cols_e(pt_rows), 8, zt_e)
                          if pj_cols_e is not None else None)
                for d in range(tf):
                    tc = (cols_f[d] if cols_f is not None
                          else jnp.where(iot_a == d, one, zero) + zt_a)
                    _, jr = jax.jvp(
                        lambda c, p: rows_fn(c, p, obs_rows),
                        (cam_rows, pt_rows), (tc, zt_e))
                    for i in range(r):
                        jf_lanes[i][d] = jr[i:i + 1, :]
                for d in range(te):
                    tp = (cols_e[d] if cols_e is not None
                          else jnp.where(iot_e == d, one, zero) + zt_e)
                    _, jr = jax.jvp(
                        lambda c, p: rows_fn(c, p, obs_rows),
                        (cam_rows, pt_rows), (zt_a, tp))
                    for i in range(r):
                        je_lanes[i][d] = jr[i:i + 1, :]
                zrow = jnp.zeros((1, max_rows), f32)
                gro_f = [jnp.concatenate(
                    [jf_lanes[i][d] if jf_lanes[i][d] is not None else zrow
                     for d in range(gf)], axis=0) for i in range(r)]
                gro_e = [jnp.concatenate(
                    [je_lanes[i][d] if je_lanes[i][d] is not None else zrow
                     for d in range(ge)], axis=0) for i in range(r)]
                cost_row = None
                if loss_rho is not None:
                    # Triggs corrector folded in-kernel (corrector.cc:41-111
                    # semantics, mirrored from loss.corrector_coefficients):
                    # correct J with the RAW residuals, then scale the
                    # residuals (residual_block.cc:176-194 order); the cost
                    # partial becomes rho(s). Coefficient math runs at 8
                    # sublanes — (1, rows) boolean selects crash Mosaic on
                    # some layouts (see the Rodrigues note above).
                    s8 = jnp.broadcast_to(
                        jnp.sum(res * res, axis=0, keepdims=True),
                        (8, max_rows))
                    rho0_8, rho1_8, rho2_8 = loss_rho(s8)
                    # rho'(s) must be > 0 (reference CHECK_GT(rho[1],0),
                    # corrector.cc:48); built-in losses guard with _TINY in
                    # loss.py — clamp here too so a user loss with rho1=0
                    # degrades like the host path instead of NaN lanes.
                    rho1_8 = jnp.maximum(rho1_8, 1e-30)
                    simple = (s8 == 0.0) | (rho2_8 <= 0.0)
                    safe_sq = jnp.where(simple, one, s8)
                    sqrt_r1 = jnp.sqrt(rho1_8)
                    D = 1.0 + 2.0 * safe_sq * jnp.where(
                        simple, zero, rho2_8) / rho1_8
                    alpha = 1.0 - jnp.sqrt(jnp.maximum(D, zero))
                    rs8 = jnp.where(simple, sqrt_r1,
                                    sqrt_r1 / (1.0 - alpha))
                    asq8 = jnp.where(simple, zero, alpha / safe_sq)
                    sr1 = sqrt_r1[0:1, :]
                    asq = asq8[0:1, :]
                    rtj_f = sum(
                        jnp.broadcast_to(res[i:i + 1, :], (gf, max_rows))
                        * gro_f[i] for i in range(r))
                    rtj_e = sum(
                        jnp.broadcast_to(res[i:i + 1, :], (ge, max_rows))
                        * gro_e[i] for i in range(r))
                    gro_f = [
                        (gro_f[i] - jnp.broadcast_to(
                            asq * res[i:i + 1, :], (gf, max_rows)) * rtj_f)
                        * jnp.broadcast_to(sr1, (gf, max_rows))
                        for i in range(r)]
                    gro_e = [
                        (gro_e[i] - jnp.broadcast_to(
                            asq * res[i:i + 1, :], (ge, max_rows)) * rtj_e)
                        * jnp.broadcast_to(sr1, (ge, max_rows))
                        for i in range(r)]
                    cost_row = rho0_8[0:1, :]
                    res = jnp.broadcast_to(
                        rs8[0:1, :], (r, max_rows)) * res
                jt_tile = jnp.concatenate(gro_f + gro_e, axis=0)
                # sentinel padding rows (and non-owned rows whose gathers
                # returned zero params) can produce inf/NaN from the user
                # function — SELECT zeros (where), never multiply: 0*NaN
                # stays NaN and would poison downstream dots
                valid1 = (pid1 >= 0) & (cid1 >= 0)
                jt_tile = jnp.where(
                    jnp.broadcast_to(valid1, (lanes_pad, max_rows)),
                    jt_tile, zero)
                res = jnp.where(
                    jnp.broadcast_to(valid1, (r, max_rows)), res, zero)
                for cp in out_cps:
                    cp.wait()
                out_cps = []
                jt_vmem[j, :, :] = jt_tile
                rt_vmem[j, :, :] = jnp.concatenate(
                    [res, jnp.zeros((8 - r, max_rows), f32)], axis=0)
                row0w = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                # Full-window write, serialized against the previous
                # tile's copy (the waits above): rows shared between
                # windows are computed identically by every writer now
                # that the point gather covers the leading boundary rows
                # (gather base above) — the trailing rows beyond this
                # tile's point coverage are garbage here and re-written
                # correctly by their owner tile, which always runs (and
                # therefore completes its serialized copy) later.
                cp1 = pltpu.make_async_copy(
                    jt_vmem.at[j], jt_hbm.at[:, pl.ds(row0w, max_rows)],
                    sem_j.at[0])
                cp2 = pltpu.make_async_copy(
                    rt_vmem.at[j], rt_hbm.at[:, pl.ds(row0w, max_rows)],
                    sem_r.at[0])
                cp1.start()
                cp2.start()
                out_cps.append(cp1)
                out_cps.append(cp2)
                # masked cost partials; WHERE-masked: non-owned rows may
                # hold NaN (0*NaN would keep it). With a loss the cost is
                # rho(s) of the RAW residual norm (res is scaled by now).
                raw_cost = (cost_row if cost_row is not None else
                            jnp.sum(res * res, axis=0, keepdims=True))
                s_row = jnp.where(in_tile > 0.5, raw_cost, zero)
                cost_acc = cost_acc + jnp.concatenate(
                    [s_row, jnp.zeros((7, max_rows), f32)], axis=0)
            for cp in out_cps:
                cp.wait()
            folded = None
            for k in range(max_rows // _LANE):
                piece = cost_acc[:, k * _LANE:(k + 1) * _LANE]
                folded = piece if folded is None else folded + piece
            cost_out[:, :] = cost_out[:, :] + folded.astype(cost_out.dtype)

        msk_scratch = (pltpu.VMEM((unroll, 256, max_rows), masks_T.dtype)
                       if streamed else
                       pltpu.VMEM((unroll, 8, _LANE), jnp.int8))
        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, do_, max_rows), obs_T.dtype),
            pltpu.VMEM((unroll, BT, _LANE), pw_pts.dtype),
            msk_scratch,
            pltpu.VMEM((unroll, lanes_pad, max_rows), f32),
            pltpu.VMEM((unroll, 8, max_rows), f32),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((max_rows // _LANE,)),
            pltpu.SemaphoreType.DMA((max_rows // _LANE,)),
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # gather_bases
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # xf_T
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),  # pw_pts
    ]
    inputs = (tile_starts, tile_block0, gather_bases, ids_T, obs_T, xf_T,
              pw_pts)
    if streamed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] + in_specs
        inputs = (masks_T,) + inputs
    if windowed:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = (win_starts,) + inputs
    with jax.enable_x64(False):
        jt, rt, cost_part = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((lanes_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*inputs)
    return jt, rt, cost_part


def jt_u_sorted(
    J_blocks,  # (N, r, t) sorted by target block
    u,  # (N, r)
    sorted_ids,
    tile_starts,
    num_blocks: int,
    max_rows: int = 512,
    interpret: bool = False,
):
    """g[b] = sum_i J_i^T u_i for observations of block b (the J^T u hot op)."""
    contrib = jnp.einsum("nrt,nr->nt", J_blocks, u)
    out = segment_block_sum(
        contrib, sorted_ids, tile_starts, num_blocks,
        max_rows=max_rows, interpret=interpret,
    )
    return out[:num_blocks]


def plan_fixed_windows(ids: np.ndarray, num_blocks: int,
                       tile_rows: int = 512, width_cap: int = 2048):
    """Per-FIXED-tile target-id windows for windowed_segment_sum: tile t
    covers rows [t*tile_rows, (t+1)*tile_rows); its window spans the valid
    ids (0 <= id < num_blocks) among those rows, 128-aligned. Unlike
    plan_camera_windows this needs NO sort — fixed tiles partition rows
    exactly, so any row order works; window width reflects whatever
    locality the order has. Returns (win_starts (T,) int32, Wc, n_win,
    c_hi) or None when the windows would not beat a scatter (span too
    wide: n_win*Wc > 2*width_cap)."""
    ids = np.asarray(ids)
    n = ids.shape[0]
    T = max(1, -(-n // tile_rows))
    win0 = np.zeros(T, np.int64)
    span = 1
    for t in range(T):
        seg = ids[t * tile_rows: (t + 1) * tile_rows]
        seg = seg[(seg >= 0) & (seg < num_blocks)]
        if seg.size == 0:
            continue
        lo = (int(seg.min()) // _LANE) * _LANE
        win0[t] = lo
        span = max(span, int(seg.max()) + 1 - lo)
    span = -(-span // _LANE) * _LANE
    Wc = min(span, max(_LANE, (width_cap // _LANE) * _LANE))
    n_win = -(-span // Wc)
    if n_win * Wc > 2 * width_cap:
        return None
    c_hi = int(win0.max()) + n_win * Wc
    return win0.astype(np.int32), int(Wc), int(n_win), c_hi


def windowed_segment_sum(contrib, ids, num_blocks: int, windows,
                         tile_rows: int = 512, unroll: int = 4,
                         interpret: bool = False, contrib_T=None):
    """out[b] = sum_{i: ids[i]==b} contrib[i] for UNSORTED ids with
    locality: per fixed row tile, a one-hot over the tile's id window
    (plan_fixed_windows) + one MXU dot + a dynamic-sublane RMW on the
    VMEM output — O(rows * window) instead of the serial XLA scatter-add
    (~8 GB/s measured on v5e). The camera-side reduction of BA programs
    at large C (the Venice regime) is the target: rows sorted by point
    have camera locality, windows stay narrow.

    contrib (N, w) f32 (or contrib_T (w, N)); ids (N,) int32 (invalid /
    sentinel ids < 0 or >= num_blocks contribute nothing). Returns
    (out_pad, w_pad) with out_pad >= num_blocks rows; slice [:num_blocks].
    """
    win_starts, Wc, n_win, c_hi = windows
    if contrib_T is not None:
        w, n = contrib_T.shape
        dtype = contrib_T.dtype
    else:
        n, w = contrib.shape
        dtype = contrib.dtype
        contrib_T = contrib.T
    assert dtype == jnp.float32
    w_pad = max(8, -(-w // 8) * 8)
    C_pad = max(_LANE, -(-(num_blocks) // _LANE) * _LANE, c_hi)
    num_tiles = max(1, -(-n // tile_rows))
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    n_pad = num_tiles_pad * tile_rows
    contrib_T = jnp.concatenate(
        [contrib_T, jnp.zeros((w_pad - w, n), dtype)], axis=0)
    contrib_T = jnp.concatenate(
        [contrib_T, jnp.zeros((w_pad, n_pad - n), dtype)], axis=1)
    ids_row = jnp.concatenate(
        [ids.astype(jnp.int32), jnp.full((n_pad - n,), -1, jnp.int32)])
    ids_T = jnp.broadcast_to(ids_row[None, :], (8, n_pad))
    ws = jnp.asarray(win_starts, jnp.int32)
    if num_tiles_pad > num_tiles:
        ws = jnp.concatenate(
            [ws, jnp.broadcast_to(ws[-1:], (num_tiles_pad - num_tiles,))])
    f32, bf16 = jnp.float32, jnp.bfloat16

    def kernel(win_ref, ids_hbm, c_hbm, out_ref):
        g = pl.program_id(0)

        def body(ids_vmem, c_vmem, sem_i, sem_c):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of((g * unroll + j) * tile_rows, _LANE)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, tile_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        c_hbm.at[:, pl.ds(row0, tile_rows)],
                        c_vmem.at[j], sem_c.at[j]),
                ]
                for c in cps:
                    c.start()
                copies.append(cps)

            @pl.when(g == 0)
            def _zero():
                out_ref[:, :] = jnp.zeros((C_pad, w_pad), out_ref.dtype)

            csub = jax.lax.broadcasted_iota(jnp.int32, (Wc, tile_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)
            d_ll = (((1,), (1,)), ((), ()))
            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                cid1 = ids_vmem[j][0:1, :]
                x = c_vmem[j][:, :]
                hi = x.astype(bf16)
                rem = x - hi.astype(f32)
                mid = rem.astype(bf16)
                lo = (rem - mid.astype(f32)).astype(bf16)
                w0 = pl.multiple_of(win_ref[g * unroll + j], _LANE)
                for kk in range(n_win):
                    c0 = pl.multiple_of(w0 + kk * Wc, _LANE)
                    cw = jnp.broadcast_to(cid1 - c0, (Wc, tile_rows))
                    ohw = jnp.where(cw == csub, one, zero).astype(bf16)
                    acc = None
                    for part in (hi, mid, lo):
                        t = jax.lax.dot_general(
                            ohw, part, dimension_numbers=d_ll,
                            preferred_element_type=f32)
                        acc = t if acc is None else acc + t
                    cur = out_ref[pl.ds(c0, Wc), :]
                    out_ref[pl.ds(c0, Wc), :] = cur + acc

        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, tile_rows), jnp.int32),
            pltpu.VMEM((unroll, w_pad, tile_rows), dtype),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
        )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((C_pad, w_pad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C_pad, w_pad), dtype),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(ws, ids_T, contrib_T)
    return out


def sj_assembly_windowed(JT, ids_T, pw_hbm, tile_starts, tile_block0,
                         windows, num_points, C, r, tf, te,
                         max_rows=512, unroll=8, interpret=False):
    """Camera-WINDOWED block-diag(S) assembly for large C
    (schur_jacobi_preconditioner.h:78 at the Venice scale): per point
    tile, compute per-row scaled F'F and W' M^{-1} W lanes in VMEM and
    reduce them into the (C_pad, tf*gf) output through the tile's camera
    window one-hot (plan_camera_windows) — the global (C_pad, rows)
    one-hot of schur_assembly's mode="schur_jacobi" would cost 14 MB of
    VMEM mask at C=13.7k; the per-LM-iteration XLA fallback it replaces
    built (B, tf*tf) corrections in HBM (~1.4 GB at 4.4M observations).

    JT: (r*gf + r*ge, n_pad) SCALED grouped rows; ids_T (8, n_pad): row 0
    point ids (sorted), row 1 camera ids; pw_hbm (>= P+1+BT, 128):
    [0:8) = sp point scales (ones when JT carries the scales),
    [8:24) = M^{-1} lanes (te*te <= 16). Returns (C_pad, tf*gf) f32 of
    sum_rows [Jsf'Jsf - W'MinvW]; caller slices [:C] and reshapes
    (C, tf, gf)[:, :, :tf]."""
    lanes_pad, n_pad = JT.shape
    BT = BLOCKS_PER_TILE
    num_tiles = tile_block0.shape[0] - 1
    grid = -(-num_tiles // unroll)
    num_tiles_pad = grid * unroll
    gf = max(8, -(-tf // 8) * 8)
    ge = max(8, -(-te // 8) * 8)
    assert lanes_pad == r * gf + r * ge
    win_starts, win_width, n_win, _c_hi = windows
    assert win_width % _LANE == 0 and win_width > 0
    C_pad = _cam_pad(C, windows)
    win_starts = jnp.asarray(win_starts, jnp.int32)
    if num_tiles_pad > num_tiles:
        pad = num_tiles_pad - num_tiles
        tile_starts = jnp.concatenate([
            jnp.asarray(tile_starts, jnp.int32),
            jnp.broadcast_to(jnp.asarray(tile_starts)[-1:], (pad,))])
        tile_block0 = jnp.concatenate([
            jnp.asarray(tile_block0, jnp.int32),
            jnp.broadcast_to(jnp.asarray(tile_block0)[-1:], (pad,))])
        win_starts = jnp.concatenate(
            [win_starts, jnp.broadcast_to(win_starts[-1:], (pad,))])
    dt = JT.dtype
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    nb_out = num_points + 1 + BT
    assert pw_hbm.shape[0] >= nb_out

    def split3(x):
        hi = x.astype(bf16)
        rem = x - hi.astype(f32)
        mid = rem.astype(bf16)
        lo = (rem - mid.astype(f32)).astype(bf16)
        return hi, mid, lo

    def kernel(win_ref, starts_ref, block0_ref, ids_hbm, jt_hbm, pw_hbm_ref,
               out_ref):
        g = pl.program_id(0)

        def body(ids_vmem, jt_vmem, pw_vmem, sem_i, sem_j, sem_p):
            copies = []
            for j in range(unroll):
                row0 = pl.multiple_of(starts_ref[g * unroll + j], _LANE)
                b0 = pl.multiple_of(block0_ref[g * unroll + j], 8)
                cps = [
                    pltpu.make_async_copy(
                        ids_hbm.at[:, pl.ds(row0, max_rows)],
                        ids_vmem.at[j], sem_i.at[j]),
                    pltpu.make_async_copy(
                        jt_hbm.at[:, pl.ds(row0, max_rows)],
                        jt_vmem.at[j], sem_j.at[j]),
                    pltpu.make_async_copy(
                        pw_hbm_ref.at[pl.ds(b0, BT), :],
                        pw_vmem.at[j], sem_p.at[j]),
                ]
                for c in cps:
                    c.start()
                copies.append(cps)

            d_mm = (((1,), (0,)), ((), ()))
            d_ll = (((1,), (1,)), ((), ()))

            # STACKED exact-split dots (same rework as isc_matvec): the
            # narrow data operands (24 sublanes of sp+Minv, and the 3
            # split passes everywhere) pay the MXU's 128-row padding once
            # instead of per pass.
            def dot3(data, oh_b, d):
                parts = split3(data)
                m = data.shape[0]
                st = jnp.concatenate(parts, axis=0)
                out = jax.lax.dot_general(
                    st, oh_b, dimension_numbers=d,
                    preferred_element_type=f32)
                return sum(out[i * m:(i + 1) * m] for i in range(len(parts)))

            def dot3l(oh_b, data, d):
                parts = split3(data)
                m = data.shape[0]
                st = jnp.concatenate(parts, axis=0)
                out = jax.lax.dot_general(
                    oh_b, st, dimension_numbers=d,
                    preferred_element_type=f32)
                return sum(out[:, i * m:(i + 1) * m]
                           for i in range(len(parts)))

            @pl.when(g == 0)
            def _zero():
                out_ref[:, :] = jnp.zeros((C_pad, tf * gf), out_ref.dtype)

            csub = jax.lax.broadcasted_iota(
                jnp.int32, (win_width, max_rows), 0)
            sub = jax.lax.broadcasted_iota(jnp.int32, (BT, max_rows), 0)
            one = jnp.ones((), f32)
            zero = jnp.zeros((), f32)

            for j in range(unroll):
                for c in copies[j]:
                    c.wait()
                b0 = block0_ref[g * unroll + j]
                b1 = block0_ref[g * unroll + j + 1]
                jt = jt_vmem[j]
                pid1 = ids_vmem[j][0:1, :]
                pid = jnp.broadcast_to(pid1, (BT, max_rows))
                cid1 = ids_vmem[j][1:2, :]
                ohp_b = jnp.where(
                    (pid - b0 == sub) & (pid < b1) & (pid < num_points),
                    one, zero).astype(bf16)
                in_tile = jnp.where((pid1 >= b0) & (pid1 < b1), one, zero)
                Jf_g = [jt[i * gf:(i + 1) * gf, :] for i in range(r)]
                off_e = r * gf
                Je_g = [jt[off_e + i * ge: off_e + (i + 1) * ge, :]
                        for i in range(r)]
                pw = pw_vmem[j]
                # ONE stacked gather for sp + Minv lanes together
                both = dot3(jnp.transpose(pw[:, 0:24]), ohp_b, d_mm)
                sp_rows = both[0:8]
                Minv_rows = both[8:24]
                Jsf = Jf_g
                Jsp = [Je_g[i] * sp_rows for i in range(r)]
                # W_k (gf, rows) = sum_r Jsp[r][k] * Jsf[r]
                W = [sum(jnp.broadcast_to(Jsp[i][k:k + 1, :],
                                          (gf, max_rows)) * Jsf[i]
                         for i in range(r)) for k in range(te)]
                # Y_i (gf, rows) = sum_k Minv[i*te+k] * W_k
                Y = [sum(jnp.broadcast_to(
                        Minv_rows[i * te + k:i * te + k + 1, :],
                        (gf, max_rows)) * W[k]
                         for k in range(te)) for i in range(te)]
                # contrib (tf*gf, rows) = FtF rows - W'MinvW rows
                contrib = jnp.concatenate([
                    sum(jnp.broadcast_to(Jsf[i][k:k + 1, :],
                                         (gf, max_rows)) * Jsf[i]
                        for i in range(r))
                    - sum(jnp.broadcast_to(W[kk][k:k + 1, :],
                                           (gf, max_rows)) * Y[kk]
                          for kk in range(te))
                    for k in range(tf)], axis=0)
                contrib = contrib * jnp.broadcast_to(
                    in_tile, (tf * gf, max_rows))
                w0 = pl.multiple_of(win_ref[g * unroll + j], _LANE)
                for kk in range(n_win):
                    c0 = pl.multiple_of(w0 + kk * win_width, _LANE)
                    cw = jnp.broadcast_to(cid1 - c0, (win_width, max_rows))
                    ohw = jnp.where(cw == csub, one, zero).astype(bf16)
                    cur = out_ref[pl.ds(c0, win_width), :]
                    out_ref[pl.ds(c0, win_width), :] = cur + dot3l(
                        ohw, contrib, d_ll)

        pl.run_scoped(
            body,
            pltpu.VMEM((unroll, 8, max_rows), jnp.int32),
            pltpu.VMEM((unroll, lanes_pad, max_rows), dt),
            pltpu.VMEM((unroll, BT, _LANE), dt),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
            pltpu.SemaphoreType.DMA((unroll,)),
        )

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((C_pad, tf * gf), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C_pad, tf * gf), dt),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(win_starts, tile_starts, tile_block0, ids_T, JT, pw_hbm)
    return out
