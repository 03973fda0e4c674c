"""Flattened-layout partitioned products for the CG hot loop.

The (B, r, t) block tensors and per-element index arrays used by
ops/partition.py are the natural construction layout, but they are hostile
to the TPU memory system inside an XLA while-loop:

 - rank-3 tensors with small minor dims (r, t) are tile-padded to (8, 128)
   in HBM — up to 57x inflation for (B, 2, 9) f32 — and a while-loop
   operand is materialized in that layout, so every CG iteration re-reads
   the padding;
 - `jnp.take(v, idx)` with per-element (B, t) indices lowers to a scalar
   gather per element (~776k per product on BAL-100) which dominates the
   iteration (~16 ms measured vs ~1.7 ms for the whole specialized-BA CG
   body).

This module re-expresses the four partitioned SpMV products on:

 - block values flattened to (B, r*t) — 2-D, ~8x less padding;
 - block-row gathers/scatters: the family-major state layout makes a
   slot's tangent indices contiguous per block, so `v` reshapes to an
   (nv, t) table indexed by the (B,) local block id — one row gather per
   observation instead of t element gathers;
 - contractions as 2-D matmuls against tiny constant 0/1 selector
   matrices (replicate / reduce across the r- or t-groups of lanes), which
   ride the MXU and keep every loop-resident tensor rank-2.

Used by ITERATIVE_SCHUR (solvers/linear/implicit_schur.py) for the
matrix-free S product; semantics identical to
partition.{right,left}_multiply_{e,f} (reference
partitioned_matrix_view_impl.h products). Explicit HIGHEST precision on
the selector matmuls: TPU einsums default to bf16 multiplies.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import partition as pt

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum("bl,lo->bo", a, b, precision=_HI)


class _Selectors:
    """Constant 0/1 matrices for (r, t) lane-group algebra."""

    def __init__(self):
        self._cache: Dict[Tuple, np.ndarray] = {}

    def rep_t(self, r, t):
        # (t, r*t): rep[:, i*t + j] = x[:, j]
        key = ("rep_t", r, t)
        if key not in self._cache:
            self._cache[key] = np.hstack([np.eye(t)] * r)
        return self._cache[key]

    def sum_r(self, r, t):
        # (r*t, r): out[:, i] = sum_j x[:, i*t + j]
        key = ("sum_r", r, t)
        if key not in self._cache:
            self._cache[key] = np.kron(np.eye(r), np.ones((t, 1)))
        return self._cache[key]

    def rep_r(self, r, t):
        # (r, r*t): rep[:, i*t + j] = u[:, i]
        key = ("rep_r", r, t)
        if key not in self._cache:
            self._cache[key] = np.kron(np.eye(r), np.ones((1, t)))
        return self._cache[key]

    def sum_t(self, r, t):
        # (r*t, t): out[:, j] = sum_i x[:, i*t + j]
        key = ("sum_t", r, t)
        if key not in self._cache:
            self._cache[key] = np.vstack([np.eye(t)] * r)
        return self._cache[key]

    def get(self, name, r, t, dtype):
        m = getattr(self, name)(r, t)
        return jnp.asarray(m, dtype)


class FlatSchurOps:
    """Host-precomputed plans + device products on flattened values.

    Falls back detectably: `supported` is False when any slot's tangent
    indices are not block-contiguous (then callers keep the per-element
    path)."""

    def __init__(self, pm: pt.PartitionedMeta):
        self.pm = pm
        self.sel = _Selectors()
        self.supported = True
        self.plans_e = self._build(pm.e_idx_keys, pm.e_bid_keys, pm.e_fams,
                                   pm.e_family_indices)
        self.plans_f = self._build(pm.f_idx_keys, pm.f_bid_keys, pm.f_fams,
                                   pm.f_family_indices)

    def _build(self, idx_keys, bid_keys, fams, part_list):
        pm = self.pm
        plans: List[List[Tuple]] = []
        for k, kind in enumerate(pm.base.kinds):
            kp = []
            for s, slot in enumerate(kind.slots):
                key = bid_keys[k][s]
                if key < 0 or not slot.any_variable:
                    continue
                fi = list(part_list).index(slot.family_index)
                off, nv, t, bid_off = fams[fi]
                bid = pm.base.arrays[key]
                local = np.minimum(
                    np.maximum(bid.astype(np.int64) - bid_off, 0), nv
                ).astype(np.int32)
                # contiguity check: element indices must be
                # off + local*t + j (sentinel rows excepted)
                idx = pm.base.arrays[idx_keys[k][s]]
                want = off + local[:, None] * t + np.arange(t)[None, :]
                var = local < nv
                if not np.array_equal(idx[var], want[var]):
                    self.supported = False
                kp.append((s, fi, off, nv, t, jnp.asarray(local)))
            plans.append(kp)
        return plans

    # -- flatten ----------------------------------------------------------

    def flatten(self, values):
        out = []
        for k, kind in enumerate(self.pm.base.kinds):
            row = []
            for s, slot in enumerate(kind.slots):
                V = values[k][s]
                row.append(V.reshape(V.shape[0], -1) if V is not None else None)
            out.append(row)
        return out

    # -- products ---------------------------------------------------------

    def _gather(self, v, off, nv, t, local):
        table = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
        table = jnp.concatenate([table, jnp.zeros((1, t), v.dtype)], axis=0)
        return jnp.take(table, local, axis=0)

    def _right(self, plans, vflat, v):
        pm = self.pm
        outs = []
        for k, kind in enumerate(pm.base.kinds):
            acc = None
            for (s, fi, off, nv, t, local) in plans[k]:
                J = vflat[k][s]  # (B, r*t)
                seg = self._gather(v, off, nv, t, local)  # (B, t)
                rep = _mm(seg, self.sel.get("rep_t", kind.r, t, J.dtype))
                part = _mm(J * rep, self.sel.get("sum_r", kind.r, t, J.dtype))
                acc = part if acc is None else acc + part
            if acc is None:
                acc = jnp.zeros((kind.B, kind.r), v.dtype)
            outs.append(acc.reshape(-1))
        return jnp.concatenate(outs)

    def _left(self, plans, fams, size, vflat, u):
        pm = self.pm
        dtype = u.dtype
        tables = {
            fi: jnp.zeros((nv + 1, t), dtype)
            for fi, (off, nv, t, _) in enumerate(fams)
        }
        for k, kind in enumerate(pm.base.kinds):
            if not plans[k]:
                continue
            rows = u[kind.row_offset: kind.row_offset + kind.B * kind.r]
            rows = rows.reshape(kind.B, kind.r)
            for (s, fi, off, nv, t, local) in plans[k]:
                J = vflat[k][s]
                rep = _mm(rows, self.sel.get("rep_r", kind.r, t, J.dtype))
                contrib = _mm(J * rep, self.sel.get("sum_t", kind.r, t, J.dtype))
                tables[fi] = tables[fi].at[local].add(contrib)
        out = jnp.zeros((size,), dtype)
        for fi, (off, nv, t, _) in enumerate(fams):
            out = jax.lax.dynamic_update_slice(
                out, tables[fi][:nv].reshape(-1), (off,)
            )
        return out

    def right_f(self, vflat, z):
        return self._right(self.plans_f, vflat, z)

    def right_e(self, vflat, y):
        return self._right(self.plans_e, vflat, y)

    def left_f(self, vflat, u):
        return self._left(self.plans_f, self.pm.f_fams, self.pm.f_size, vflat, u)

    def left_e(self, vflat, u):
        return self._left(self.plans_e, self.pm.e_fams, self.pm.e_size, vflat, u)

    # -- block-diagonal inverse (flattened) --------------------------------

    def minv_flatten(self, factors):
        """Per-e-family (nv, t*t) dense inverses from Cholesky factors."""
        out = []
        for (off, nv, t, _), L in zip(self.pm.e_fams, factors):
            eye = jnp.broadcast_to(jnp.eye(t, dtype=L.dtype), (nv, t, t))
            minv = jax.vmap(
                lambda Li, I: jax.scipy.linalg.cho_solve((Li, True), I)
            )(L, eye)
            out.append(minv.reshape(nv, t * t))
        return out

    def minv_apply(self, minv_flats, v):
        outs = []
        for (off, nv, t, _), M in zip(self.pm.e_fams, minv_flats):
            seg = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
            rep = _mm(seg, self.sel.get("rep_t", t, t, M.dtype))
            sol = _mm(M * rep, self.sel.get("sum_r", t, t, M.dtype))
            outs.append(sol.reshape(-1))
        return jnp.concatenate(outs) if outs else v

    # -- the implicit Schur product ---------------------------------------

    def schur_multiply(self, vflat, minv_flats, D_f, z):
        """S z == partition.schur_multiply, loop-resident tensors all 2-D."""
        fz = self.right_f(vflat, z)
        etfz = self.left_e(vflat, fz)
        e_part = self.right_e(vflat, self.minv_apply(minv_flats, etfz))
        out = self.left_f(vflat, fz - e_part)
        return out + (D_f * D_f) * z
