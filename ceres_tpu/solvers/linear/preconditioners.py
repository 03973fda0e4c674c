"""Preconditioners beyond block-Jacobi/Schur-Jacobi: power series (SPSE),
visibility clustering (CLUSTER_JACOBI / CLUSTER_TRIDIAGONAL), and SUBSET.

TPU-native equivalents of:
 - power_series_expansion_preconditioner.h:40-66 (Weber et al., "Power
   Bundle Adjustment"): truncated Neumann series over implicit-Schur
   products, entirely jit-compiled;
 - visibility_based_preconditioner.{h,cc}:127-578: camera clustering by
   shared-point visibility, preconditioner = S restricted to within-cluster
   (+ forest-edge) camera pairs. Here the clustered blocks are padded to
   the max cluster size and applied as ONE batched dense Cholesky solve —
   the TPU answer to the reference's per-cluster sparse factorization;
 - subset_preconditioner.h:70: (Q'Q)^{-1} over a user-selected subset of
   residual blocks via the inner-product computer + native sparse Cholesky
   (host-applied).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import bsr, partition as pt


# --------------------------------------------------------------------------
# Power series expansion (SPSE).
# --------------------------------------------------------------------------


def make_spse_preconditioner(pm, values, sys, D_f, num_terms: int):
    """S^{-1} ~= sum_{i<=k} (I - P^{-1} S)^i P^{-1} with P = block-diag
    Schur-Jacobi. Fully traceable (used inside the CG jit)."""
    from .implicit_schur import make_schur_jacobi_preconditioner, schur_multiply

    p_inv = make_schur_jacobi_preconditioner(pm, values, sys, D_f)

    def apply(v):
        t = p_inv(v)
        acc = t
        for _ in range(num_terms):
            t = t - p_inv(schur_multiply(pm, values, sys, D_f, t))
            acc = acc + t
        return acc

    return apply


# --------------------------------------------------------------------------
# Cluster preconditioners (visibility-based).
# --------------------------------------------------------------------------


class ClusterStructure:
    """Host-side: camera->cluster membership + padded gather indices so the
    apply is one batched cho_solve. Supports CLUSTER_JACOBI (block diagonal
    over clusters). CLUSTER_TRIDIAGONAL augments membership by merging
    forest-edge cluster pairs into 'super clusters' before padding — the
    padded-batch machinery then covers both."""

    def __init__(self, pm: pt.PartitionedMeta, membership: np.ndarray,
                 forest_edges: Optional[list] = None):
        self.pm = pm
        if forest_edges:
            # merge clusters connected by forest edges (tridiagonal support)
            num_c = int(membership.max()) + 1
            parent = np.arange(num_c)

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for (i, j) in forest_edges:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
            roots = {find(c) for c in range(num_c)}
            remap = {r: k for k, r in enumerate(sorted(roots))}
            membership = np.asarray(
                [remap[find(int(c))] for c in membership], np.int32
            )
        self.membership = membership
        # Build per-cluster tangent index lists over the f-partition.
        # Assumes a single f-family (cameras); general multi-family support
        # falls back to family-diagonal grouping.
        fams = pm.f_fams
        clusters: dict = {}
        cam = 0
        for (off, nv, t, _) in fams:
            for i in range(nv):
                c = int(membership[cam]) if cam < len(membership) else 0
                clusters.setdefault(c, []).append((off + i * t, t))
                cam += 1
        self.cluster_indices = []
        max_dim = 0
        for c in sorted(clusters):
            idx = np.concatenate(
                [np.arange(o, o + t) for (o, t) in clusters[c]]
            ).astype(np.int32)
            self.cluster_indices.append(idx)
            max_dim = max(max_dim, idx.size)
        self.max_dim = max_dim
        C = len(self.cluster_indices)
        # padded gather matrix (C, max_dim), padding -> f_size (sentinel)
        G = np.full((C, max_dim), pm.f_size, np.int32)
        M = np.zeros((C, max_dim), np.float64)
        for ci, idx in enumerate(self.cluster_indices):
            G[ci, : idx.size] = idx
            M[ci, : idx.size] = 1.0
        self.gather = G
        self.mask = M


def make_cluster_preconditioner(cs: ClusterStructure, s_dense_blocks_fn):
    """Build the batched apply from a function producing the per-cluster
    dense S blocks (C, max_dim, max_dim)."""
    G = jnp.asarray(cs.gather)
    M = jnp.asarray(cs.mask)
    f_size = cs.pm.f_size

    blocks = s_dense_blocks_fn()  # (C, max_dim, max_dim), masked identity pad
    L = jnp.linalg.cholesky(blocks)

    def apply(v):
        vp = jnp.concatenate([v, jnp.zeros((1,), v.dtype)])
        seg = jnp.take(vp, G)  # (C, max_dim)
        sol = jax.vmap(lambda Li, b: jax.scipy.linalg.cho_solve((Li, True), b))(L, seg)
        sol = sol * M
        out = jnp.zeros((f_size + 1,), v.dtype)
        out = out.at[G.reshape(-1)].add(sol.reshape(-1))
        return out[:f_size]

    return apply


class ClusterBlockAssembler:
    """Exact assembly of the per-cluster dense blocks of S (only
    within-cluster camera pairs — the visibility_based_preconditioner
    restriction), reusing the Schur pair enumeration. Host symbolic once;
    numeric is one jitted batched-einsum + scatter pass."""

    def __init__(self, pm: pt.PartitionedMeta, cs: ClusterStructure):
        from .sparse_schur import enumerate_schur_pairs

        self.pm = pm
        self.cs = cs
        meta = pm.base
        ftf_pairs, pair_buckets, e_slot_of_kind = enumerate_schur_pairs(pm)
        self._e_slot_of_kind = e_slot_of_kind
        # map f-local tangent index -> (cluster, offset) via cs.gather
        f_size = pm.f_size
        loc_cluster = np.full(f_size + 1, len(cs.cluster_indices), np.int64)
        loc_offset = np.full(f_size + 1, 0, np.int64)
        for ci, idx in enumerate(cs.cluster_indices):
            loc_cluster[idx] = ci
            loc_offset[idx] = np.arange(idx.size)
        C = len(cs.cluster_indices)
        m = cs.max_dim
        # flat target position in a (C+1, m, m) padded accumulator
        def entry_positions(i1, i2):
            """i1 (B, t1), i2 (B, t2) f-local tangent indices -> flat
            positions (B, t1, t2); cross-cluster/sentinel -> pad block C."""
            c1 = loc_cluster[i1]  # (B, t1)
            c2 = loc_cluster[i2]
            o1 = loc_offset[i1]
            o2 = loc_offset[i2]
            same = (c1[:, :, None] == c2[:, None, :]) & (
                c1[:, :, None] < C
            )
            pos = np.where(
                same,
                c1[:, :, None] * m * m + o1[:, :, None] * m + o2[:, None, :],
                C * m * m,
            )
            return pos.astype(np.int64)

        self._ftf = []
        for (k, s1, s2) in ftf_pairs:
            i1 = meta.arrays[pm.f_idx_keys[k][s1]]
            i2 = meta.arrays[pm.f_idx_keys[k][s2]]
            self._ftf.append((k, s1, s2, entry_positions(i1, i2)))
        self._pairs = []
        for (k1, s1, k2, s2), (ia, ib, eb) in pair_buckets.items():
            i1 = meta.arrays[pm.f_idx_keys[k1][s1]][ia]
            i2 = meta.arrays[pm.f_idx_keys[k2][s2]][ib]
            pos = entry_positions(i1, i2)
            # drop all-padding buckets early
            if np.all(pos == C * m * m):
                continue
            self._pairs.append((k1, s1, k2, s2, ia, ib, eb, pos))
        self.C = C
        self.m = m
        self._jit = jax.jit(self._impl)

    def _impl(self, values, D_e, D_f):
        pm = self.pm
        meta = pm.base
        cs = self.cs
        C, m = self.C, self.m
        # batched (E'E + D_e^2)^{-1} with per-family sentinel padding
        blocks_e = pt.block_diag_ete(pm, values, D_e)
        minv_padded = []
        for (off, nv, t, _), blk in zip(pm.e_fams, blocks_e):
            eye = jnp.broadcast_to(jnp.eye(t), (nv, t, t))
            L = jnp.linalg.cholesky(blk)
            minv = jax.vmap(lambda Li, I: jax.scipy.linalg.cho_solve((Li, True), I))(
                L, eye
            )
            minv_padded.append(
                jnp.concatenate([minv, jnp.zeros((1, t, t))], axis=0)
            )

        acc = jnp.zeros((C * m * m + 1,))
        for (k, s1, s2, pos) in self._ftf:
            V1 = values[k][s1]
            V2 = values[k][s2]
            contrib = jnp.einsum("brc,brd->bcd", V1, V2)
            acc = acc.at[jnp.asarray(pos).reshape(-1)].add(contrib.reshape(-1))
        for (k1, s1, k2, s2, ia, ib, eb, pos) in self._pairs:
            e1 = self._e_slot_of_kind[k1]
            Je_a = jnp.take(values[k1][e1], jnp.asarray(ia), axis=0)
            Jf_a = jnp.take(values[k1][s1], jnp.asarray(ia), axis=0)
            e2 = self._e_slot_of_kind[k2]
            Je_b = jnp.take(values[k2][e2], jnp.asarray(ib), axis=0)
            Jf_b = jnp.take(values[k2][s2], jnp.asarray(ib), axis=0)
            efi = pm.e_family_indices.index(
                meta.kinds[k1].slots[e1].family_index
            )
            _, nv, te, bid_off = pm.e_fams[efi]
            local = jnp.clip(jnp.asarray(eb) - bid_off, 0, nv)
            Minv = jnp.take(minv_padded[efi], local, axis=0)
            Wa = jnp.einsum("pre,prf->pef", Je_a, Jf_a)
            Wb = jnp.einsum("pre,prf->pef", Je_b, Jf_b)
            corr = jnp.einsum("pef,peh,phg->pfg", Wa, Minv, Wb)
            acc = acc.at[jnp.asarray(pos).reshape(-1)].add((-corr).reshape(-1))
        blocks = acc[:-1].reshape(C, m, m)
        # D_f^2 on the diagonal + identity on padding rows/cols
        Dp = jnp.concatenate([D_f, jnp.zeros((1,))])
        dseg = jnp.take(Dp, jnp.asarray(cs.gather))  # (C, m)
        M = jnp.asarray(cs.mask)
        diag = dseg * dseg * M + (1.0 - M)
        blocks = blocks + jax.vmap(jnp.diag)(diag)
        blocks = 0.5 * (blocks + jnp.transpose(blocks, (0, 2, 1)))
        return blocks

    def __call__(self, values, D_e, D_f):
        return self._jit(values, D_e, D_f)


# --------------------------------------------------------------------------
# Subset preconditioner.
# --------------------------------------------------------------------------


class SubsetPreconditioner:
    """(Q'Q + D^2)^{-1} for Q = rows of J belonging to the selected residual
    blocks (subset_preconditioner.h:70). Factorized with the native sparse
    Cholesky; applied host-side inside a host-driven CG loop."""

    def __init__(self, meta: bsr.BlockJacobianMeta, kind_mask: Sequence[bool]):
        from ...ops.inner_product import InnerProductComputer
        from ...native import SparseCholesky

        self.meta = meta
        self.ipc = InnerProductComputer(meta, kind_mask=list(kind_mask))
        self.chol = SparseCholesky(self.ipc.n, self.ipc.indptr, self.ipc.indices)
        self._ok = False

    def update(self, values, D):
        vals = np.asarray(self.ipc.compute(values, D))
        self._ok = self.chol.factorize(vals)
        return self._ok

    def apply(self, v):
        if not self._ok:
            return np.asarray(v)
        return self.chol.solve(np.asarray(v))
