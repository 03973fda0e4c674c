"""Block-sparse Jacobian: storage and linear-operator ops.

TPU-native re-design of the reference's BlockSparseMatrix
(/root/reference/internal/ceres/block_sparse_matrix.h:73-203, .cc 844) and
CompressedRowBlockStructure (block_structure.h:53-130). Instead of a cell
list walked by threads, the matrix is stored as *kind groups*: every
residual kind contributes, per parameter slot, one dense (B, r, t) tensor of
Jacobian blocks plus static int32 index maps. All operators below are then
batched einsums (MXU) + gathers/scatter-adds (deterministic, lock-free —
replacing the reference's per-cell mutexes and cumulative-nnz thread
partitioning, SURVEY.md §2.7).

Row space: residuals, kind-major, each kind a contiguous range — so J·x
needs NO scatter (pure concat). Column space: the tangent vector, family-
major; constant blocks target a sentinel column slot (index T) that is
sliced away, keeping everything branch-free.

The value pytree is `values[kind][slot] = (B, r, t)`; structure lives in
`BlockJacobianMeta` (hashable, static under jit).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SlotMeta:
    """One parameter slot of a kind: which tangent columns its blocks hit."""

    tangent_idx_key: int  # index into meta.arrays
    block_id_key: int  # index into meta.arrays: global variable-block id (or sentinel)
    t: int
    any_variable: bool
    family_index: int


@dataclasses.dataclass(frozen=True)
class KindMeta:
    row_offset: int
    B: int
    r: int
    slots: Tuple[SlotMeta, ...]


@dataclasses.dataclass(frozen=True)
class FamilyMeta:
    """Variable blocks of one (size, manifold) family: a contiguous tangent
    span of num_var blocks each of width t."""

    tangent_offset: int
    num_var: int
    t: int
    block_id_offset: int  # first global variable-block id of this family


class BlockJacobianMeta:
    """Static structure shared by all ops; arrays stored as numpy and closed
    over at trace time (they become XLA constants)."""

    def __init__(self, kinds: List[KindMeta], families: List[FamilyMeta],
                 num_rows: int, tangent_size: int, arrays: List[np.ndarray]):
        self.kinds = tuple(kinds)
        self.families = tuple(families)
        self.num_rows = num_rows
        self.tangent_size = tangent_size
        self.arrays = arrays  # int32 index arrays referenced by key
        self.num_var_blocks = sum(f.num_var for f in families)

    def idx(self, key: int) -> jnp.ndarray:
        return jnp.asarray(self.arrays[key])


def build_meta(program) -> BlockJacobianMeta:
    """Build from a CompiledProgram (the 'symbolic' phase, done once —
    mirrors BlockJacobianWriter::BuildJacobianLayout,
    block_jacobian_writer.cc:68)."""
    arrays: List[np.ndarray] = []

    def add_array(a) -> int:
        arrays.append(np.asarray(a, dtype=np.int32))
        return len(arrays) - 1

    families = []
    fam_block_offset = {}
    fam_index = {}
    next_block_id = 0
    for fi, fam in enumerate(program.families):
        fam_block_offset[id(fam)] = next_block_id
        fam_index[id(fam)] = fi
        families.append(
            FamilyMeta(
                tangent_offset=fam.tangent_offset,
                num_var=fam.num_var,
                t=fam.tsize,
                block_id_offset=next_block_id,
            )
        )
        next_block_id += fam.num_var
    num_var_blocks = next_block_id

    kinds = []
    for kind in program.kinds:
        slots = []
        for s in kind.slots:
            fam = s.family
            pos = s.pos_in_family
            is_var = pos < fam.num_var
            block_id = np.where(
                is_var, fam_block_offset[id(fam)] + pos, num_var_blocks
            ).astype(np.int32)
            slots.append(
                SlotMeta(
                    tangent_idx_key=add_array(s.tangent_idx),
                    block_id_key=add_array(block_id),
                    t=fam.tsize,
                    any_variable=s.any_variable,
                    family_index=fam_index[id(fam)],
                )
            )
        kinds.append(
            KindMeta(row_offset=kind.row_offset, B=kind.B, r=kind.r, slots=tuple(slots))
        )
    return BlockJacobianMeta(
        kinds, families, program.num_residuals, program.tangent_size, arrays
    )


# --------------------------------------------------------------------------
# Linear-operator ops (all jax-traceable; meta static).
# --------------------------------------------------------------------------


def right_multiply(meta: BlockJacobianMeta, values, v):
    """y = J v  (BlockSparseMatrix::RightMultiplyAndAccumulate).

    Rows are kind-major contiguous => pure concat, no scatter."""
    vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])  # sentinel column = 0
    outs = []
    for k, kind in enumerate(meta.kinds):
        acc = None
        for s, slot in enumerate(kind.slots):
            if not slot.any_variable:
                continue
            seg = jnp.take(vp, meta.idx(slot.tangent_idx_key))  # (B, t)
            part = jnp.einsum("brt,bt->br", values[k][s], seg)
            acc = part if acc is None else acc + part
        if acc is None:
            acc = jnp.zeros((kind.B, kind.r), vp.dtype)
        outs.append(acc.reshape(-1))
    return jnp.concatenate(outs)


def left_multiply(meta: BlockJacobianMeta, values, u):
    """g = J^T u  (LeftMultiplyAndAccumulate): deterministic scatter-add
    into the tangent vector (replaces per-thread replicas + reduction,
    program_evaluator.h:252-284)."""
    T = meta.tangent_size
    g = jnp.zeros((T + 1,), u.dtype)
    for k, kind in enumerate(meta.kinds):
        rows = u[kind.row_offset : kind.row_offset + kind.B * kind.r].reshape(
            kind.B, kind.r
        )
        for s, slot in enumerate(kind.slots):
            if not slot.any_variable:
                continue
            contrib = jnp.einsum("brt,br->bt", values[k][s], rows)
            g = g.at[meta.idx(slot.tangent_idx_key).reshape(-1)].add(
                contrib.reshape(-1)
            )
    return g[:T]


def squared_column_norm(meta: BlockJacobianMeta, values):
    """diag(J'J) (SquaredColumnNorm)."""
    T = meta.tangent_size
    out = jnp.zeros((T + 1,), values[0][0].dtype if meta.kinds else jnp.float64)
    for k, kind in enumerate(meta.kinds):
        for s, slot in enumerate(kind.slots):
            if not slot.any_variable:
                continue
            contrib = jnp.einsum("brt,brt->bt", values[k][s], values[k][s])
            out = out.at[meta.idx(slot.tangent_idx_key).reshape(-1)].add(
                contrib.reshape(-1)
            )
    return out[:T]


def scale_columns(meta: BlockJacobianMeta, values, scale):
    """J <- J * diag(scale) (ScaleColumns)."""
    sp = jnp.concatenate([scale, jnp.zeros((1,), scale.dtype)])
    out = []
    for k, kind in enumerate(meta.kinds):
        row = []
        for s, slot in enumerate(kind.slots):
            seg = jnp.take(sp, meta.idx(slot.tangent_idx_key))  # (B, t)
            row.append(values[k][s] * seg[:, None, :])
        out.append(row)
    return out




def chunked_block_outer_accumulate(acc, V, tgt, chunk: int = 16384):
    """acc.at[tgt].add(einsum('brc,brd->bcd', V, V)) without materializing
    the full (B, t, t) outer-product temp (its TPU tile padding explodes
    for small t; observed HBM OOM at Venice scale)."""
    B = V.shape[0]
    if B <= chunk:
        return acc.at[tgt].add(jnp.einsum("brc,brd->bcd", V, V))
    nch = -(-B // chunk)
    pad = nch * chunk - B
    Vp = jnp.pad(V, ((0, pad), (0, 0), (0, 0))).reshape(nch, chunk, *V.shape[1:])
    sentinel = acc.shape[0] - 1
    tp = jnp.concatenate([tgt, jnp.full((pad,), sentinel, tgt.dtype)]).reshape(
        nch, chunk
    )

    def body(a, args):
        v, tg = args
        return a.at[tg].add(jnp.einsum("brc,brd->bcd", v, v)), None

    acc, _ = jax.lax.scan(body, acc, (Vp, tp))
    return acc


def block_diag_jtj(meta: BlockJacobianMeta, values, D: Optional[jnp.ndarray] = None):
    """Per-variable-block (t, t) diagonal blocks of J'J (+ diag(D)^2).

    The BlockJacobi preconditioner's Update (block_jacobi_preconditioner.cc)
    as one batched einsum + scatter per family. Returns a list per family of
    (num_var, t, t)."""
    dtype = values[0][0].dtype if meta.kinds else jnp.float64
    accs = [
        jnp.zeros((f.num_var + 1, f.t, f.t), dtype) for f in meta.families
    ]
    for k, kind in enumerate(meta.kinds):
        for s, slot in enumerate(kind.slots):
            if not slot.any_variable:
                continue
            V = values[k][s]
            bid = meta.idx(slot.block_id_key)
            fi = slot.family_index
            f = meta.families[fi]
            local = bid - f.block_id_offset
            # Constant blocks carry the global sentinel id; route them to the
            # family's own sentinel row (num_var) so the add is branch-free.
            in_fam = (local >= 0) & (local < f.num_var)
            tgt = jnp.where(in_fam, local, f.num_var)
            accs[fi] = chunked_block_outer_accumulate(accs[fi], V, tgt)
    out = []
    for fi, f in enumerate(meta.families):
        blk = accs[fi][: f.num_var]
        if D is not None:
            d = jax.lax.dynamic_slice(D, (f.tangent_offset,), (f.num_var * f.t,))
            d2 = (d * d).reshape(f.num_var, f.t)
            blk = blk + jax.vmap(jnp.diag)(d2)
        out.append(blk)
    return out


def factorize_block_diag(blocks):
    """Batched Cholesky of the per-family diagonal blocks."""
    return [jnp.linalg.cholesky(b) for b in blocks]


def apply_block_diag_inverse(meta: BlockJacobianMeta, factors, v):
    """x = blockdiag^{-1} v via batched triangular solves."""
    outs = []
    pos = 0
    for f, L in zip(meta.families, factors):
        n = f.num_var * f.t
        seg = jax.lax.dynamic_slice(v, (f.tangent_offset,), (n,)).reshape(
            f.num_var, f.t
        )
        sol = jax.vmap(lambda Li, b: jax.scipy.linalg.cho_solve((Li, True), b))(L, seg)
        outs.append(sol.reshape(-1))
        pos += n
    return jnp.concatenate(outs) if outs else v


# --------------------------------------------------------------------------
# Args-mode operators: index arrays arrive as traced inputs (the sharded
# path — CompiledProgram.make_args slots), so the same math runs under
# GSPMD with the observation axis sharded; scatter targets are replicated
# outputs, for which XLA inserts the psum (SURVEY.md §5.8).
# --------------------------------------------------------------------------


def right_multiply_args(kind_shapes, args, values, v):
    """y = J v with traced per-kind indices. kind_shapes: list of (B, r)
    AFTER padding (values leading dims). Rows are kind-major concat."""
    vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
    outs = []
    for k, (B, r) in enumerate(kind_shapes):
        acc = None
        for s, slot_args in enumerate(args[k]["slots"]):
            seg = jnp.take(vp, slot_args["tangent_idx"])  # (B, t)
            part = jnp.einsum("brt,bt->br", values[k][s], seg)
            acc = part if acc is None else acc + part
        if acc is None:
            acc = jnp.zeros((B, r), vp.dtype)
        outs.append(acc.reshape(-1))
    return jnp.concatenate(outs)


def left_multiply_args(kind_shapes, args, values, u, tangent_size):
    """g = J^T u with traced indices; deterministic scatter-add."""
    g = jnp.zeros((tangent_size + 1,), u.dtype)
    off = 0
    for k, (B, r) in enumerate(kind_shapes):
        rows = u[off : off + B * r].reshape(B, r)
        off += B * r
        for s, slot_args in enumerate(args[k]["slots"]):
            contrib = jnp.einsum("brt,br->bt", values[k][s], rows)
            g = g.at[slot_args["tangent_idx"].reshape(-1)].add(contrib.reshape(-1))
    return g[:tangent_size]


def squared_column_norm_args(kind_shapes, args, values, tangent_size):
    out = jnp.zeros((tangent_size + 1,), values[0][0].dtype)
    for k, (B, r) in enumerate(kind_shapes):
        for s, slot_args in enumerate(args[k]["slots"]):
            V = values[k][s]
            contrib = jnp.einsum("brt,brt->bt", V, V)
            out = out.at[slot_args["tangent_idx"].reshape(-1)].add(
                contrib.reshape(-1)
            )
    return out[:tangent_size]


def scale_columns_args(args, values, scale):
    sp = jnp.concatenate([scale, jnp.zeros((1,), scale.dtype)])
    out = []
    for k, slots in enumerate(values):
        row = []
        for s, V in enumerate(slots):
            seg = jnp.take(sp, args[k]["slots"][s]["tangent_idx"])
            row.append(V * seg[:, None, :])
        out.append(row)
    return out


@dataclasses.dataclass
class CRSMatrix:
    """Compressed-row sparse matrix (the crs_matrix.h public type):
    `rows` is the (num_rows+1,) row-pointer array, `cols`/`values` the
    column indices and entries of each row in ascending column order."""

    num_rows: int
    num_cols: int
    rows: np.ndarray
    cols: np.ndarray
    values: np.ndarray

    @property
    def nnz(self) -> int:
        return int(self.values.size)

    def to_dense(self) -> np.ndarray:
        out = np.zeros((self.num_rows, self.num_cols), self.values.dtype)
        r = np.repeat(np.arange(self.num_rows),
                      np.diff(self.rows.astype(np.int64)))
        out[r, self.cols] = self.values
        return out


def to_crs(meta: BlockJacobianMeta, values) -> CRSMatrix:
    """Sparse tangent-space Jacobian as a CRSMatrix WITHOUT densifying
    (Problem::Evaluate's CRS output, problem.h:477 / crs_matrix.h) —
    usable at BA scale where the dense (rows x tangent) array would be
    tens of GB. Vectorized host conversion: COO from the kind-batched
    block tensors, lexsort, duplicate coalescing (a block pair can repeat
    when one parameter block appears in two slots of a residual)."""
    rows_l, cols_l, vals_l = [], [], []
    for k, kind in enumerate(meta.kinds):
        row_base = kind.row_offset + np.arange(
            kind.B * kind.r, dtype=np.int64).reshape(kind.B, kind.r)
        for s, slot in enumerate(kind.slots):
            tidx = np.asarray(meta.arrays[slot.tangent_idx_key],
                              dtype=np.int64)  # (B, t)
            v = np.asarray(values[k][s])  # (B, r, t)
            rr = np.broadcast_to(row_base[:, :, None], v.shape)
            cc = np.broadcast_to(tidx[:, None, :], v.shape)
            keep = cc < meta.tangent_size  # constant blocks hit sentinel T
            rows_l.append(rr[keep])
            cols_l.append(cc[keep])
            vals_l.append(v[keep])
    if rows_l:
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)
        vals = np.concatenate(vals_l)
    else:  # pragma: no cover - empty program
        rows = np.zeros(0, np.int64)
        cols = np.zeros(0, np.int64)
        vals = np.zeros(0, np.float64)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    if rows.size:
        new = np.empty(rows.size, bool)
        new[0] = True
        new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
        starts = np.flatnonzero(new)
        vals = np.add.reduceat(vals, starts)
        rows, cols = rows[new], cols[new]
    rowptr = np.zeros(meta.num_rows + 1, np.int64)
    rowptr[1:] = np.cumsum(np.bincount(rows, minlength=meta.num_rows))
    return CRSMatrix(meta.num_rows, meta.tangent_size, rowptr,
                     cols.astype(np.int32), vals)


def to_dense(meta: BlockJacobianMeta, values):
    """Densify for testing (the reference test pattern: compare block ops
    against a dense Eigen computation, SURVEY.md §4.1)."""
    J = jnp.zeros((meta.num_rows, meta.tangent_size + 1))
    for k, kind in enumerate(meta.kinds):
        rows = kind.row_offset + np.arange(kind.B * kind.r).reshape(kind.B, kind.r)
        for s, slot in enumerate(kind.slots):
            tidx = meta.idx(slot.tangent_idx_key)
            J = J.at[jnp.asarray(rows)[:, :, None], tidx[:, None, :]].add(
                values[k][s]
            )
    return J[:, : meta.tangent_size]
