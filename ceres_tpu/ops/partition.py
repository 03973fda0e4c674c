"""Partitioned view of the block Jacobian: J = [E F].

TPU-native re-design of the reference's PartitionedMatrixView
(/root/reference/internal/ceres/partitioned_matrix_view.h:66,
partitioned_matrix_view_impl.h, 44 generated template specializations) —
the workhorse of the Schur solvers. E-columns are the eliminated blocks
(points), F-columns the remaining ones (cameras).

Granularity: the partition is chosen at *family* level (a family = blocks
sharing size+manifold, ops/bsr.py). A family set is a valid e-partition iff
no residual kind has two slots in it — the batched analog of the
reference's "each residual block touches at most one e-block" invariant
(schur_eliminator.h:52-166). For BA/SLAM this matches block-level MIS
ordering exactly (the point family is independent).

All products are batched einsums over only the relevant slots — the static
slot partition plays the role of the reference's compile-time
<kRowBlockSize, kEBlockSize, kFBlockSize> specializations.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bsr


@dataclasses.dataclass(frozen=True)
class PartitionedMeta:
    """Static e/f partition over a BlockJacobianMeta."""

    base: bsr.BlockJacobianMeta
    e_family_indices: Tuple[int, ...]
    f_family_indices: Tuple[int, ...]
    e_size: int  # tangent size of the e-partition
    f_size: int
    # per (kind, slot): local tangent index arrays (B, t) with sentinel ==
    # part_size routed to a padding slot; key into base.arrays.
    e_idx_keys: Tuple[Tuple[int, ...], ...]  # -1 where slot not in e
    f_idx_keys: Tuple[Tuple[int, ...], ...]
    # per (kind, slot): e-local / f-local variable-block ids (B,), sentinel =
    # num blocks in that partition.
    e_bid_keys: Tuple[Tuple[int, ...], ...]
    f_bid_keys: Tuple[Tuple[int, ...], ...]
    # families of each partition, with local tangent offsets
    e_fams: Tuple[Tuple[int, int, int, int], ...]  # (local_t_off, num_var, t, local_bid_off)
    f_fams: Tuple[Tuple[int, int, int, int], ...]

    def idx(self, key: int):
        return jnp.asarray(self.base.arrays[key])


def build_partition(meta: bsr.BlockJacobianMeta, e_family_indices: Sequence[int]) -> PartitionedMeta:
    e_set = set(int(i) for i in e_family_indices)
    f_list = [i for i in range(len(meta.families)) if i not in e_set]
    e_list = [i for i in range(len(meta.families)) if i in e_set]

    # Validity: no kind has two slots in the e-set.
    for kind in meta.kinds:
        n_e = sum(1 for s in kind.slots if s.family_index in e_set)
        if n_e > 1:
            raise ValueError(
                "invalid Schur partition: a residual kind touches two e-blocks"
            )

    def local_layout(fam_indices):
        off = 0
        bid_off = 0
        layout = {}
        fams = []
        for fi in fam_indices:
            f = meta.families[fi]
            layout[fi] = (off, bid_off)
            fams.append((off, f.num_var, f.t, bid_off))
            off += f.num_var * f.t
            bid_off += f.num_var
        return layout, off, bid_off, tuple(fams)

    e_layout, e_size, e_nblocks, e_fams = local_layout(e_list)
    f_layout, f_size, f_nblocks, f_fams = local_layout(f_list)

    arrays = meta.arrays  # extend in place (meta shared)

    def add_array(a) -> int:
        arrays.append(np.asarray(a, dtype=np.int32))
        return len(arrays) - 1

    # Translation arrays global->local per slot.
    e_idx_keys, f_idx_keys, e_bid_keys, f_bid_keys = [], [], [], []
    for kind in meta.kinds:
        ek, fk, ebk, fbk = [], [], [], []
        for s in kind.slots:
            fam = meta.families[s.family_index]
            tangent_idx = arrays[s.tangent_idx_key]
            block_id = arrays[s.block_id_key]
            local_block = block_id - fam.block_id_offset  # sentinel -> big
            in_part_e = s.family_index in e_set
            if in_part_e:
                off, bid_off = e_layout[s.family_index]
                loc = np.where(
                    tangent_idx < meta.tangent_size,
                    off + (tangent_idx - fam.tangent_offset),
                    e_size,
                ).astype(np.int32)
                bid = np.where(
                    local_block < fam.num_var, bid_off + local_block, e_nblocks
                ).astype(np.int32)
                ek.append(add_array(loc))
                ebk.append(add_array(bid))
                fk.append(-1)
                fbk.append(-1)
            else:
                off, bid_off = f_layout[s.family_index]
                loc = np.where(
                    tangent_idx < meta.tangent_size,
                    off + (tangent_idx - fam.tangent_offset),
                    f_size,
                ).astype(np.int32)
                bid = np.where(
                    local_block < fam.num_var, bid_off + local_block, f_nblocks
                ).astype(np.int32)
                fk.append(add_array(loc))
                fbk.append(add_array(bid))
                ek.append(-1)
                ebk.append(-1)
        e_idx_keys.append(tuple(ek))
        f_idx_keys.append(tuple(fk))
        e_bid_keys.append(tuple(ebk))
        f_bid_keys.append(tuple(fbk))

    return PartitionedMeta(
        base=meta,
        e_family_indices=tuple(e_list),
        f_family_indices=tuple(f_list),
        e_size=e_size,
        f_size=f_size,
        e_idx_keys=tuple(e_idx_keys),
        f_idx_keys=tuple(f_idx_keys),
        e_bid_keys=tuple(e_bid_keys),
        f_bid_keys=tuple(f_bid_keys),
        e_fams=e_fams,
        f_fams=f_fams,
    )


def _right_multiply(pm: PartitionedMeta, values, v, idx_keys, size):
    vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
    outs = []
    for k, kind in enumerate(pm.base.kinds):
        acc = None
        for s, slot in enumerate(kind.slots):
            key = idx_keys[k][s]
            if key < 0 or not slot.any_variable:
                continue
            seg = jnp.take(vp, pm.idx(key))
            part = jnp.einsum("brt,bt->br", values[k][s], seg)
            acc = part if acc is None else acc + part
        if acc is None:
            acc = jnp.zeros((kind.B, kind.r), v.dtype)
        outs.append(acc.reshape(-1))
    return jnp.concatenate(outs)


def _left_multiply(pm: PartitionedMeta, values, u, idx_keys, size):
    g = jnp.zeros((size + 1,), u.dtype)
    for k, kind in enumerate(pm.base.kinds):
        rows = u[kind.row_offset : kind.row_offset + kind.B * kind.r].reshape(
            kind.B, kind.r
        )
        for s, slot in enumerate(kind.slots):
            key = idx_keys[k][s]
            if key < 0 or not slot.any_variable:
                continue
            contrib = jnp.einsum("brt,br->bt", values[k][s], rows)
            g = g.at[pm.idx(key).reshape(-1)].add(contrib.reshape(-1))
    return g[:size]


def right_multiply_e(pm, values, y):
    """E y (PartitionedMatrixView::RightMultiplyAndAccumulateE)."""
    return _right_multiply(pm, values, y, pm.e_idx_keys, pm.e_size)


def right_multiply_f(pm, values, z):
    return _right_multiply(pm, values, z, pm.f_idx_keys, pm.f_size)


def left_multiply_e(pm, values, u):
    """E' u."""
    return _left_multiply(pm, values, u, pm.e_idx_keys, pm.e_size)


def left_multiply_f(pm, values, u):
    return _left_multiply(pm, values, u, pm.f_idx_keys, pm.f_size)


def _block_diag(pm, values, D, idx_keys, bid_keys, fams, size):
    dtype = values[0][0].dtype if pm.base.kinds else jnp.float64
    accs = [jnp.zeros((nv + 1, t, t), dtype) for (_, nv, t, _) in fams]
    part_fams = pm.e_family_indices if fams is pm.e_fams else pm.f_family_indices
    for k, kind in enumerate(pm.base.kinds):
        for s, slot in enumerate(kind.slots):
            key = bid_keys[k][s]
            if key < 0 or not slot.any_variable:
                continue
            V = values[k][s]
            bid = pm.idx(key)
            fi = part_fams.index(slot.family_index)
            off, nv, t, bid_off = fams[fi]
            local = bid - bid_off
            tgt = jnp.where((local >= 0) & (local < nv), local, nv)
            accs[fi] = bsr.chunked_block_outer_accumulate(accs[fi], V, tgt)
    out = []
    for i, (off, nv, t, _) in enumerate(fams):
        blk = accs[i][:nv]
        if D is not None:
            d = jax.lax.dynamic_slice(D, (off,), (nv * t,))
            d2 = (d * d).reshape(nv, t)
            blk = blk + jax.vmap(jnp.diag)(d2)
        out.append(blk)
    return out


def block_diag_ete(pm: PartitionedMeta, values, D_e=None):
    """Per-e-block (t, t) blocks of E'E (+ diag(D_e)^2) — the chunk-local
    matrices the eliminator inverts (schur_eliminator_impl.h:184)."""
    return _block_diag(pm, values, D_e, pm.e_idx_keys, pm.e_bid_keys, pm.e_fams, pm.e_size)


def block_diag_ftf(pm: PartitionedMeta, values, D_f=None):
    """Per-f-block (t, t) blocks of F'F (+ diag(D_f)^2) — the implicit
    Schur's block-diagonal preconditioner source
    (implicit_schur_complement.h block_diagonal_FtF_inverse)."""
    return _block_diag(pm, values, D_f, pm.f_idx_keys, pm.f_bid_keys, pm.f_fams, pm.f_size)


def apply_block_diag_inverse_part(fams, factors, v):
    """x = blockdiag^{-1} v over a partition's local layout."""
    outs = []
    for (off, nv, t, _), L in zip(fams, factors):
        seg = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
        sol = jax.vmap(lambda Li, b: jax.scipy.linalg.cho_solve((Li, True), b))(L, seg)
        outs.append(sol.reshape(-1))
    return jnp.concatenate(outs) if outs else v


def extract_e(pm: PartitionedMeta, g):
    """Project a global tangent vector onto the e-partition layout."""
    segs = []
    for fi, (off, nv, t, _) in zip(pm.e_family_indices, pm.e_fams):
        fam = pm.base.families[fi]
        segs.append(
            jax.lax.dynamic_slice(g, (fam.tangent_offset,), (nv * t,))
        )
    return jnp.concatenate(segs) if segs else jnp.zeros((0,), g.dtype)


def extract_f(pm: PartitionedMeta, g):
    segs = []
    for fi, (off, nv, t, _) in zip(pm.f_family_indices, pm.f_fams):
        fam = pm.base.families[fi]
        segs.append(
            jax.lax.dynamic_slice(g, (fam.tangent_offset,), (nv * t,))
        )
    return jnp.concatenate(segs) if segs else jnp.zeros((0,), g.dtype)


def combine(pm: PartitionedMeta, y_e, z_f):
    """Assemble a global tangent vector from partition-local vectors."""
    T = pm.base.tangent_size
    out = jnp.zeros((T,), y_e.dtype if y_e.size else z_f.dtype)
    for fi, (off, nv, t, _) in zip(pm.e_family_indices, pm.e_fams):
        fam = pm.base.families[fi]
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(y_e, (off,), (nv * t,)), (fam.tangent_offset,)
        )
    for fi, (off, nv, t, _) in zip(pm.f_family_indices, pm.f_fams):
        fam = pm.base.families[fi]
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(z_f, (off,), (nv * t,)), (fam.tangent_offset,)
        )
    return out
