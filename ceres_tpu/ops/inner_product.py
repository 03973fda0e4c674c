"""InnerProductComputer: J'J as CSR with cached symbolic structure.

TPU-native re-design of /root/reference/internal/ceres/inner_product_computer.{h,cc}
(inner_product_computer.h:59): the symbolic product structure — which
(block-row, block-col) pairs exist and where each per-observation outer
product lands in the CSR values array — is computed ONCE on the host; the
numeric product is then a single fused device pass: batched einsums per
(kind, slot-pair) + one deterministic scatter-add into the flat CSR values
("symbolic once, numeric many", mirroring the reference's cached product
structure + permutation).

Supports row-block-range restriction via a kind mask (the subset
preconditioner's use case, subset_preconditioner.h:70).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bsr


class InnerProductComputer:
    def __init__(self, meta: bsr.BlockJacobianMeta,
                 kind_mask: Optional[List[bool]] = None):
        self.meta = meta
        T = meta.tangent_size
        self.n = T
        entry_rows = []
        entry_cols = []
        self._pairs = []  # (kind_idx, s1, s2)
        for k, kind in enumerate(meta.kinds):
            if kind_mask is not None and not kind_mask[k]:
                continue
            var_slots = [s for s, sl in enumerate(kind.slots) if sl.any_variable]
            for s1 in var_slots:
                i1 = meta.arrays[kind.slots[s1].tangent_idx_key]  # (B, t1)
                for s2 in var_slots:
                    i2 = meta.arrays[kind.slots[s2].tangent_idx_key]
                    B, t1 = i1.shape
                    t2 = i2.shape[1]
                    rows = np.broadcast_to(i1[:, :, None], (B, t1, t2))
                    cols = np.broadcast_to(i2[:, None, :], (B, t1, t2))
                    entry_rows.append(rows.reshape(-1))
                    entry_cols.append(cols.reshape(-1))
                    self._pairs.append((k, s1, s2))
        if entry_rows:
            rows = np.concatenate(entry_rows).astype(np.int64)
            cols = np.concatenate(entry_cols).astype(np.int64)
        else:
            rows = cols = np.zeros(0, np.int64)
        # Sentinel (constant-block) entries go to a padding slot.
        valid = (rows < T) & (cols < T)
        key = np.where(valid, rows * T + cols, np.int64(T) * T)
        uniq, inv = np.unique(key, return_inverse=True)
        has_pad = uniq.size > 0 and uniq[-1] == np.int64(T) * T
        nnz = uniq.size - (1 if has_pad else 0)
        self.nnz = int(nnz)
        # scatter position per entry; padding entries -> nnz
        self._positions = np.where(inv < nnz, inv, nnz).astype(np.int32)
        u = uniq[:nnz]
        csr_rows = (u // T).astype(np.int32)
        self.indices = (u % T).astype(np.int32)
        self.indptr = np.zeros(T + 1, np.int64)
        np.add.at(self.indptr, csr_rows + 1, 1)
        self.indptr = np.cumsum(self.indptr)
        # diagonal positions (for adding D^2)
        self.diag_positions = np.searchsorted(u, np.arange(T, dtype=np.int64) * T + np.arange(T))
        # verify diagonal present (it is, for any J with nonzero columns)
        self._jit_values = jax.jit(self._values_impl)

    def _values_impl(self, values, D=None):
        """Flat CSR values of J'J (+ diag(D)^2). One fused device pass."""
        chunks = []
        for (k, s1, s2) in self._pairs:
            V1 = values[k][s1]
            V2 = values[k][s2]
            prod = jnp.einsum("brc,brd->bcd", V1, V2)
            chunks.append(prod.reshape(-1))
        flat = jnp.concatenate(chunks) if chunks else jnp.zeros((0,))
        out = jnp.zeros((self.nnz + 1,), flat.dtype)
        out = out.at[jnp.asarray(self._positions)].add(flat)
        out = out[: self.nnz]
        if D is not None:
            out = out.at[jnp.asarray(self.diag_positions)].add(D * D)
        return out

    def compute(self, values, D=None):
        return self._jit_values(values, D)
