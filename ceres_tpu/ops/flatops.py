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

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import partition as pt

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """Data (N, l) x CONSTANT 0/1 selector (l, o). Every `b` in this
    module is a 0/1 selector matrix (kron's of eye/ones), exact in bf16 —
    so for f32 data the exact hi/mid/lo bf16 3-way split (3 single-pass
    MXU dots, f32 accumulation) replaces the 6-pass HIGHEST einsum at
    ~f32 accuracy and 2x the throughput (the ops/pallas_kernels.py dot3
    trick, hoisted to the XLA tier). f64 keeps HIGHEST."""
    if a.dtype != jnp.float32:
        return jnp.einsum("bl,lo->bo", a, b, precision=_HI)
    bf = jnp.bfloat16
    bb = b.astype(bf)
    hi = a.astype(bf)
    rem = a - hi.astype(jnp.float32)
    mid = rem.astype(bf)
    lo = (rem - mid.astype(jnp.float32)).astype(bf)
    out = None
    for part in (hi, mid, lo):
        t = jax.lax.dot_general(
            part, bb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = t if out is None else out + t
    return out


# --------------------------------------------------------------------------
# Flat-lane block linear algebra: (t_a x t_b) blocks stored as row-major
# lanes of 2-D (N, t_a*t_b) arrays; contractions are matmuls against tiny
# constant 0/1 selector matrices (MXU), never rank-3 tensors. This is the
# layout rule ROADMAP item 0 calls for: TPU tiles the two minormost dims to
# (8, 128), so (N, r, t) tensors with small r/t inflate up to ~57x in HBM.
# --------------------------------------------------------------------------


def outer_selectors(r, ta, tb, dtype):
    """Constants for sum_r outer(A_r, B_r) on flat lanes: A (N, r*ta),
    B (N, r*tb) -> (N, ta*tb) with out[i*tb+j] = sum_r A[r*ta+i]*B[r*tb+j],
    computed as (A@EA * B@EB) @ E3 — three MXU matmuls."""
    EA = np.kron(np.eye(r * ta), np.ones((1, tb)))
    EB = np.kron(np.eye(r), np.kron(np.ones((1, ta)), np.eye(tb)))
    E3 = np.kron(np.ones((r, 1)), np.eye(ta * tb))
    return (jnp.asarray(EA, dtype), jnp.asarray(EB, dtype), jnp.asarray(E3, dtype))


def outer_flat(A, B, sel):
    EA, EB, E3 = sel
    return _mm(_mm(A, EA) * _mm(B, EB), E3)


def matmul_selectors(ti, tk, tj, dtype):
    """Constants for flat-lane matmul C[i*tj+j] = sum_k A[i*tk+k]*B[k*tj+j]
    (A (N, ti*tk) row-major, B (N, tk*tj) row-major)."""
    EA = np.kron(np.eye(ti * tk), np.ones((1, tj)))
    EB = np.kron(np.ones((1, ti)), np.eye(tk * tj))
    E3 = np.kron(np.eye(ti), np.kron(np.ones((tk, 1)), np.eye(tj)))
    return (jnp.asarray(EA, dtype), jnp.asarray(EB, dtype), jnp.asarray(E3, dtype))


def matmul_flat(A, B, sel):
    EA, EB, E3 = sel
    return _mm(_mm(A, EA) * _mm(B, EB), E3)


def transpose_selector(ta, tb, dtype):
    """(ta*tb, tb*ta) permutation: row-major (ta x tb) lanes -> row-major
    (tb x ta) lanes of the transposed block."""
    P = np.zeros((ta * tb, tb * ta))
    for i in range(ta):
        for j in range(tb):
            P[i * tb + j, j * ta + i] = 1.0
    return jnp.asarray(P, dtype)


def matvec_selectors(t, dtype):
    """Constants for flat-lane block matvec y[i] = sum_j M[i*t+j] * x[j]:
    rep (t, t*t) replicates x across row groups, red (t*t, t) sums rows."""
    rep = np.kron(np.ones((1, t)), np.eye(t))  # x -> lanes (i,j) = x[j]
    red = np.kron(np.eye(t), np.ones((t, 1)))
    return jnp.asarray(rep, dtype), jnp.asarray(red, dtype)


def block_matvec_flat(M, x, sel):
    """M (N, t*t) row-major blocks, x (N, t) -> (N, t)."""
    rep, red = sel
    return _mm(M * _mm(x, rep), red)


def spd_inverse_flat(M, t):
    """Dense inverses of SPD (t x t) blocks stored as (N, t*t) row-major
    lanes, staying 2-D for t <= 3 (closed-form Cholesky on lanes); larger t
    falls back to a batched rank-3 solve (acceptable: used only for small
    block counts or once per iteration)."""
    if t == 1:
        return 1.0 / M
    if t == 2:
        a, b, d = M[:, 0], M[:, 1], M[:, 3]
        det = a * d - b * b
        return jnp.stack([d / det, -b / det, -b / det, a / det], axis=1)
    if t == 3:
        a, b, c = M[:, 0], M[:, 1], M[:, 2]
        d, e, f = M[:, 4], M[:, 5], M[:, 8]
        # closed-form Cholesky lanes, then M^{-1} = K'K with K = L^{-1}
        L11 = jnp.sqrt(a)
        L21 = b / L11
        L31 = c / L11
        L22 = jnp.sqrt(d - L21 * L21)
        L32 = (e - L21 * L31) / L22
        L33 = jnp.sqrt(f - L31 * L31 - L32 * L32)
        K11 = 1.0 / L11
        K22 = 1.0 / L22
        K33 = 1.0 / L33
        K21 = -L21 * K11 * K22
        K31 = (L21 * L32 - L31 * L22) * K11 * K22 * K33
        K32 = -L32 * K22 * K33
        # M^{-1}[i,j] = sum_k K[k,i] K[k,j] (K lower triangular)
        i11 = K11 * K11 + K21 * K21 + K31 * K31
        i12 = K21 * K22 + K31 * K32
        i13 = K31 * K33
        i22 = K22 * K22 + K32 * K32
        i23 = K32 * K33
        i33 = K33 * K33
        return jnp.stack([i11, i12, i13, i12, i22, i23, i13, i23, i33], axis=1)
    N = M.shape[0]
    blocks = M.reshape(N, t, t)
    eye = jnp.broadcast_to(jnp.eye(t, dtype=M.dtype), (N, t, t))
    L = jnp.linalg.cholesky(blocks)
    inv = jax.vmap(lambda Li, I: jax.scipy.linalg.cho_solve((Li, True), I))(L, eye)
    return inv.reshape(N, t * t)


def chol_inv_lower_flat(M, t):
    """K = L^{-1} (lower triangular, upper lanes zero) of SPD blocks stored
    as (N, t*t) row-major lanes. Closed form on lanes for t <= 3 (promoted
    to f64 internally: the small-pivot recurrences cancel badly in f32 —
    measured on the BA point blocks, parallel/sharded_ba.py notes); rank-3
    fallback otherwise."""
    dt = M.dtype
    if t == 1:
        return (1.0 / jnp.sqrt(M.astype(jnp.float64))).astype(dt)
    if t == 2:
        m = M.astype(jnp.float64)
        a, b, d = m[:, 0], m[:, 1], m[:, 3]
        L11 = jnp.sqrt(a)
        L21 = b / L11
        L22 = jnp.sqrt(d - L21 * L21)
        K11 = 1.0 / L11
        K22 = 1.0 / L22
        K21 = -L21 * K11 * K22
        z = jnp.zeros_like(K11)
        return jnp.stack([K11, z, K21, K22], axis=1).astype(dt)
    if t == 3:
        m = M.astype(jnp.float64)
        a, b, c = m[:, 0], m[:, 1], m[:, 2]
        d, e, f = m[:, 4], m[:, 5], m[:, 8]
        L11 = jnp.sqrt(a)
        L21 = b / L11
        L31 = c / L11
        L22 = jnp.sqrt(d - L21 * L21)
        L32 = (e - L21 * L31) / L22
        L33 = jnp.sqrt(f - L31 * L31 - L32 * L32)
        K11 = 1.0 / L11
        K22 = 1.0 / L22
        K33 = 1.0 / L33
        K21 = -L21 * K11 * K22
        K31 = (L21 * L32 - L31 * L22) * K11 * K22 * K33
        K32 = -L32 * K22 * K33
        z = jnp.zeros_like(K11)
        return jnp.stack(
            [K11, z, z, K21, K22, z, K31, K32, K33], axis=1
        ).astype(dt)
    N = M.shape[0]
    L = jnp.linalg.cholesky(M.reshape(N, t, t))
    eye = jnp.broadcast_to(jnp.eye(t, dtype=M.dtype), (N, t, t))
    K = jax.lax.linalg.triangular_solve(
        L, eye, left_side=True, lower=True
    )
    return K.reshape(N, t * t)


def diag_embed_selector(t, dtype):
    """(t, t*t) selector putting a length-t vector on the diagonal lanes."""
    E = np.zeros((t, t * t))
    for i in range(t):
        E[i, i * t + i] = 1.0
    return jnp.asarray(E, dtype)


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


class SlotPlanFlat(NamedTuple):
    """One (kind, slot) entry of a flat-ops plan."""

    s: int  # slot index within the kind
    fi: int  # family index within the partition's fams list
    off: int  # family tangent offset (partition-local)
    nv: int  # variable blocks in the family
    t: int  # tangent width
    local: jax.Array  # (B,) local block ids (sentinel == nv)
    srt: bool  # ids nondecreasing (program built with sort_rows)
    pplan: "Optional[Tuple]"  # (tile_starts, max_rows) Mosaic segment plan
    rplan: "Optional[Tuple]" = None  # (starts, block0, max_rows) row-balanced
    wplan: "Optional[Tuple]" = None  # fixed-tile id windows (unsorted ids)


# Pallas usage for sorted segment reductions/gathers: "auto" = on TPU-like
# backends for f32, "off" = never, "interpret" = emulated (tests).
PALLAS_MODE = "auto"
_PALLAS_VMEM_BUDGET = 4 * 1024 * 1024


def _pallas_ok(dtype, pplan, width):
    if PALLAS_MODE == "off" or pplan is None:
        return False
    if dtype != jnp.float32:
        return False
    if PALLAS_MODE == "interpret":
        return True
    if jax.default_backend() == "cpu":
        return False
    t_pad = max(8, -(-int(width) // 8) * 8)
    return pplan[1] * t_pad * 4 <= _PALLAS_VMEM_BUDGET


class _FlatOpsBase:
    """Shared machinery: plan building, flatten, and the two products.

    Plan entries are SlotPlanFlat against a `fams` layout list
    [(off, nv, t, bid_off)]. `supported` goes False when any slot's tangent
    indices are not block-contiguous (callers keep the per-element path)."""

    def __init__(self, kinds, arrays):
        self.kinds = kinds
        self.arrays = arrays
        self.sel = _Selectors()
        self.supported = True

    def _build(self, slot_info):
        """slot_info: iterable of (k, s, fam_pos, off, nv, t, bid_off,
        bid_key, idx_key) for every participating slot. Plan entries carry
        a `srt` flag: block ids nondecreasing over rows, so reductions can
        run as SORTED segment-sums instead of random scatter-adds."""
        plans: List[List[Tuple]] = [[] for _ in self.kinds]
        for (k, s, fi, off, nv, t, bid_off, bid_key, idx_key) in slot_info:
            bid = self.arrays[bid_key]
            local = np.minimum(
                np.maximum(bid.astype(np.int64) - bid_off, 0), nv
            ).astype(np.int32)
            # contiguity check: element indices must be off + local*t + j
            # (sentinel rows excepted)
            idx = self.arrays[idx_key]
            want = off + local[:, None] * t + np.arange(t)[None, :]
            var = local < nv
            if not np.array_equal(idx[var], want[var]):
                self.supported = False
            srt = bool(np.all(local[1:] >= local[:-1]))
            pplan = rplan = wplan = None
            if srt and local.size:
                from . import pallas_kernels as pk

                ts, max_rows = pk.plan_block_tiles(local, nv + 1)
                pplan = (jnp.asarray(ts), max_rows)
                rs, rb, rmax = pk.plan_row_tiles(local, nv + 1)
                rplan = (jnp.asarray(rs), jnp.asarray(rb), rmax)
            elif local.size and nv > 257:
                # unsorted large-target reductions (the camera side at
                # Venice scale): fixed-tile id windows replace the serial
                # XLA scatter when the row order has id locality
                from . import pallas_kernels as pk

                wplan = pk.plan_fixed_windows(local, nv)
            plans[k].append(
                SlotPlanFlat(s, fi, off, nv, t, jnp.asarray(local), srt,
                             pplan, rplan, wplan)
            )
        return plans

    @staticmethod
    def _reduce_rows(table, local, contrib, srt, pplan=None, wplan=None):
        """table (+=) segment reduction of contrib by local row ids. Five
        tiers: Mosaic tiled one-hot MXU kernel (sorted, f32, TPU),
        windowed Mosaic kernel (UNSORTED ids with locality, large targets
        — the Venice-scale camera side), one-hot MXU matmul (few target
        blocks, any order; a (B,) scatter-add costs ~1 ms at 84k rows on
        v5e while the (B, nv) one-hot einsum is ~0.1 ms), XLA sorted
        segment-sum, scatter-add."""
        if _pallas_ok(contrib.dtype, pplan, contrib.shape[1]):
            from . import pallas_kernels as pk

            out = pk.segment_block_sum(
                contrib, local, pplan[0], table.shape[0],
                max_rows=pplan[1], interpret=PALLAS_MODE == "interpret",
            )
            return table + out[: table.shape[0]]
        if (
            wplan is not None
            and contrib.dtype == jnp.float32
            and PALLAS_MODE != "off"
            and (PALLAS_MODE == "interpret"
                 or jax.default_backend() != "cpu")
            and wplan[3] * max(8, -(-contrib.shape[1] // 8) * 8) * 4
            <= 8 * 1024 * 1024
        ):
            from . import pallas_kernels as pk

            nv = table.shape[0] - 1
            out = pk.windowed_segment_sum(
                contrib, local, nv, wplan,
                interpret=PALLAS_MODE == "interpret",
            )
            return table.at[:nv].add(out[:nv, : contrib.shape[1]])
        if (
            contrib.dtype == jnp.float32
            and table.shape[0] <= 257
            and local.shape[0] >= 4 * table.shape[0]
            and jax.default_backend() != "cpu"
        ):
            oh = jax.nn.one_hot(local, table.shape[0], dtype=contrib.dtype)
            return table + jnp.einsum(
                "bt,bn->nt", contrib, oh, precision=_HI
            )
        if srt:
            return table + jax.ops.segment_sum(
                contrib, local, num_segments=table.shape[0],
                indices_are_sorted=True,
            )
        return table.at[local].add(contrib)

    def with_env(self, locs, padded_B):
        """Args-mode view of these ops: per-(kind, slot) local block ids
        become TRACED arrays (so the same products run under GSPMD with
        the observation axis sharded — SURVEY.md §5.8) and kind batch
        sizes/row offsets reflect mesh padding. locs: {(k, s): (B',) int32
        ids with sentinel == nv}; padded_B: per-kind padded batch size."""
        import copy

        clone = copy.copy(self)

        class _KindView(NamedTuple):
            row_offset: int
            B: int
            r: int

        kinds = []
        off = 0
        for k, kind in enumerate(self.kinds):
            B = int(padded_B[k])
            kinds.append(_KindView(off, B, kind.r))
            off += B * kind.r
        clone.kinds = kinds

        def remap(plans):
            return [
                [
                    pe._replace(local=locs[(k, pe.s)], srt=False, pplan=None,
                                rplan=None, wplan=None)
                    for pe in pl
                ]
                for k, pl in enumerate(plans)
            ]

        if hasattr(clone, "plans"):
            clone.plans = remap(self.plans)
        if hasattr(clone, "plans_e"):
            clone.plans_e = remap(self.plans_e)
            clone.plans_f = remap(self.plans_f)
        return clone

    def flatten(self, values):
        out = []
        for k, _ in enumerate(self.kinds):
            row = []
            for V in values[k]:
                row.append(V.reshape(V.shape[0], -1) if V is not None else None)
            out.append(row)
        return out

    def _gather(self, v, off, nv, t, local, pplan=None):
        table = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
        table = jnp.concatenate([table, jnp.zeros((1, t), v.dtype)], axis=0)
        if _pallas_ok(v.dtype, pplan, t):
            from . import pallas_kernels as pk

            return pk.segment_block_expand(
                table, local, pplan[0], local.shape[0],
                max_rows=pplan[1], interpret=PALLAS_MODE == "interpret",
            )
        return jnp.take(table, local, axis=0)

    def _right(self, plans, vflat, v):
        outs = []
        for k, kind in enumerate(self.kinds):
            acc = None
            for pe in plans[k]:
                J = vflat[k][pe.s]  # (B, r*t)
                seg = self._gather(v, pe.off, pe.nv, pe.t, pe.local, pe.pplan)
                rep = _mm(seg, self.sel.get("rep_t", kind.r, pe.t, J.dtype))
                part = _mm(J * rep, self.sel.get("sum_r", kind.r, pe.t, J.dtype))
                acc = part if acc is None else acc + part
            if acc is None:
                acc = jnp.zeros((kind.B, kind.r), v.dtype)
            outs.append(acc.reshape(-1))
        return jnp.concatenate(outs)

    def _left(self, plans, fams, size, vflat, u):
        dtype = u.dtype
        tables = {
            fi: jnp.zeros((nv + 1, t), dtype)
            for fi, (off, nv, t, _) in enumerate(fams)
        }
        for k, kind in enumerate(self.kinds):
            if not plans[k]:
                continue
            rows = u[kind.row_offset: kind.row_offset + kind.B * kind.r]
            rows = rows.reshape(kind.B, kind.r)
            for pe in plans[k]:
                J = vflat[k][pe.s]
                rep = _mm(rows, self.sel.get("rep_r", kind.r, pe.t, J.dtype))
                contrib = _mm(J * rep, self.sel.get("sum_t", kind.r, pe.t, J.dtype))
                tables[pe.fi] = self._reduce_rows(
                    tables[pe.fi], pe.local, contrib, pe.srt, pe.pplan,
                    pe.wplan
                )
        out = jnp.zeros((size,), dtype)
        for fi, (off, nv, t, _) in enumerate(fams):
            out = jax.lax.dynamic_update_slice(
                out, tables[fi][:nv].reshape(-1), (off,)
            )
        return out

    def sq_col_norm(self, plans, fams, size, vflat):
        """diag(J'J) over this partition's columns, all lanes 2-D."""
        dtype = None
        tables = {
            fi: None for fi, _ in enumerate(fams)
        }
        for k, kind in enumerate(self.kinds):
            for pe in plans[k]:
                J = vflat[k][pe.s]
                dtype = J.dtype
                contrib = _mm(J * J, self.sel.get("sum_t", kind.r, pe.t, J.dtype))
                if tables[pe.fi] is None:
                    tables[pe.fi] = jnp.zeros(
                        (fams[pe.fi][1] + 1, fams[pe.fi][2]), dtype
                    )
                tables[pe.fi] = self._reduce_rows(
                    tables[pe.fi], pe.local, contrib, pe.srt, pe.pplan,
                    pe.wplan
                )
        out = jnp.zeros((size,), dtype or jnp.float64)
        for fi, (off, nv, t, _) in enumerate(fams):
            if tables[fi] is None:
                continue
            out = jax.lax.dynamic_update_slice(
                out, tables[fi][:nv].reshape(-1), (off,)
            )
        return out

    def fused_post_eval(self, plans, fams, size, vflat, u,
                        with_blocks=True):
        """ONE segment reduction per (kind, slot) computing, on
        concatenated lanes, everything the minimizer needs per evaluation:
        gradient J'u, squared column norms diag(J'J), and the per-block
        J'J diagonal blocks. Returns (g, sqn, blocks_flat_list) in this
        partition's layout — the lane-concatenation trick of
        parallel/sharded_ba.py generalized. with_blocks=False drops the
        (t*t)-lane J'J outer from the reduce (callers whose solver emits
        its own blocks — e.g. the one-kernel dense-Schur assembly — save
        the widest part of the pass; blocks come back zero-shaped)."""
        tables = [None] * len(fams)
        dtype = None
        for k, kind in enumerate(self.kinds):
            if not plans[k]:
                continue
            rows = u[kind.row_offset: kind.row_offset + kind.B * kind.r]
            rows = rows.reshape(kind.B, kind.r)
            for pe in plans[k]:
                J = vflat[k][pe.s]
                t = pe.t
                dtype = J.dtype
                rep = _mm(rows, self.sel.get("rep_r", kind.r, t, J.dtype))
                sum_t = self.sel.get("sum_t", kind.r, t, J.dtype)
                parts = [
                    _mm(J * rep, sum_t),  # J'u rows       (t)
                    _mm(J * J, sum_t),  # diag(J'J) rows   (t)
                ]
                if with_blocks:
                    parts.append(outer_flat(
                        J, J, outer_selectors(kind.r, t, t, J.dtype)))
                contrib = jnp.concatenate(parts, axis=1)
                width = 2 * t + (t * t if with_blocks else 0)
                if tables[pe.fi] is None:
                    tables[pe.fi] = jnp.zeros((pe.nv + 1, width), J.dtype)
                tables[pe.fi] = self._reduce_rows(
                    tables[pe.fi], pe.local, contrib, pe.srt, pe.pplan,
                    pe.wplan
                )
        dtype = dtype or jnp.float64
        g = jnp.zeros((size,), dtype)
        sqn = jnp.zeros((size,), dtype)
        blocks = []
        for fi, (off, nv, t, _) in enumerate(fams):
            tab = tables[fi]
            if tab is None:
                blocks.append(jnp.zeros((nv, t * t), dtype))
                continue
            g = jax.lax.dynamic_update_slice(
                g, tab[:nv, :t].reshape(-1), (off,)
            )
            sqn = jax.lax.dynamic_update_slice(
                sqn, tab[:nv, t: 2 * t].reshape(-1), (off,)
            )
            blocks.append(tab[:nv, 2 * t:] if with_blocks
                          else jnp.zeros((nv, t * t), dtype))
        return g, sqn, blocks

    def block_jtj(self, plans, fams, vflat):
        """Per-family (nv, t*t) flat diagonal blocks of J'J — the block
        Jacobi preconditioner source (block_jacobi_preconditioner.cc), no
        rank-3 temporaries."""
        tables = [None] * len(fams)
        for k, kind in enumerate(self.kinds):
            for pe in plans[k]:
                J = vflat[k][pe.s]
                t = pe.t
                sel = outer_selectors(kind.r, t, t, J.dtype)
                contrib = outer_flat(J, J, sel)  # (B, t*t)
                if tables[pe.fi] is None:
                    tables[pe.fi] = jnp.zeros((pe.nv + 1, t * t), J.dtype)
                tables[pe.fi] = self._reduce_rows(
                    tables[pe.fi], pe.local, contrib, pe.srt, pe.pplan,
                    pe.wplan
                )
        out = []
        for fi, (off, nv, t, _) in enumerate(fams):
            tab = tables[fi]
            if tab is None:
                tab = jnp.zeros((nv + 1, t * t), jnp.float64)
            out.append(tab[:nv])
        return out

    @staticmethod
    def part_rows(fams, v):
        """Split a partition-layout vector into per-family (nv, t) tables."""
        out = []
        for (off, nv, t, _) in fams:
            out.append(
                jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
            )
        return out

    @staticmethod
    def scaled_block_inverses(fams, jtj_flats, scale, D2):
        """Inverse flats of  S_b (J'J)_b S_b + diag(D2)_b  per family, where
        S_b/D2 are the per-block rows of `scale`/`D2` in partition layout."""
        out = []
        for (off, nv, t, _), blk in zip(fams, jtj_flats):
            s_rows = jax.lax.dynamic_slice(scale, (off,), (nv * t,)).reshape(nv, t)
            d_rows = jax.lax.dynamic_slice(D2, (off,), (nv * t,)).reshape(nv, t)
            souter = outer_flat(
                s_rows, s_rows, outer_selectors(1, t, t, blk.dtype)
            )
            M = blk * souter + _mm(d_rows, diag_embed_selector(t, blk.dtype))
            out.append(spd_inverse_flat(M, t))
        return out

    @staticmethod
    def apply_inverse_rows(fams, inv_flats, v):
        """x = blockdiag^{-1} v from inverse flats (nv, t*t)."""
        outs = []
        for (off, nv, t, _), M in zip(fams, inv_flats):
            seg = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
            sol = block_matvec_flat(M, seg, matvec_selectors(t, M.dtype))
            outs.append(sol.reshape(-1))
        return jnp.concatenate(outs) if outs else v

    def _inv_flatten(self, fams, factors):
        """Per-family (nv, t*t) dense inverses from Cholesky factors."""
        out = []
        for (off, nv, t, _), L in zip(fams, factors):
            eye = jnp.broadcast_to(jnp.eye(t, dtype=L.dtype), (nv, t, t))
            minv = jax.vmap(
                lambda Li, I: jax.scipy.linalg.cho_solve((Li, True), I)
            )(L, eye)
            out.append(minv.reshape(nv, t * t))
        return out

    def _inv_apply(self, fams, inv_flats, v):
        outs = []
        for (off, nv, t, _), M in zip(fams, inv_flats):
            seg = jax.lax.dynamic_slice(v, (off,), (nv * t,)).reshape(nv, t)
            rep = _mm(seg, self.sel.get("rep_t", t, t, M.dtype))
            sol = _mm(M * rep, self.sel.get("sum_r", t, t, M.dtype))
            outs.append(sol.reshape(-1))
        return jnp.concatenate(outs) if outs else v


    # -- fused one-kernel matvecs (ops/pallas_kernels.implicit_schur_matvec)

    # cameras above this count switch the fused matvec to per-tile camera
    # windows (plan_camera_windows) — below it the single in-VMEM one-hot
    # is cheap and proven
    _WINDOW_THRESHOLD = 1024

    def _kernel_slots(self, plans_e, plans_f, e_fams, f_fams):
        """Qualification for the fused Pallas matvec: ONE kind, one sorted
        e-slot (point-aligned tiles), one f-slot, single family per side,
        f32. Returns (pe, pf, windows) or None; `windows` is the
        plan_camera_windows tuple for large camera counts (None below the
        threshold — the global in-VMEM one-hot)."""
        if PALLAS_MODE == "off":
            return None
        if PALLAS_MODE != "interpret" and jax.default_backend() == "cpu":
            return None
        active = [k for k, _ in enumerate(self.kinds)
                  if plans_e[k] or plans_f[k]]
        if len(self.kinds) != 1 or len(active) != 1:
            return None
        k = active[0]
        if len(plans_e[k]) != 1 or len(plans_f[k]) != 1:
            return None
        if len(e_fams) != 1 or len(f_fams) != 1:
            return None
        pe, pf = plans_e[k][0], plans_f[k][0]
        if not pe.srt or pe.pplan is None or pe.rplan is None:
            return None
        windows = None
        if pf.nv > self._WINDOW_THRESHOLD:
            windows = self._camera_windows(pe, pf)
        return pe, pf, windows

    def _camera_windows(self, pe, pf):
        key = (id(pe.local), id(pf.local))
        cache = getattr(self, "_win_cache", None)
        if cache is None:
            cache = self._win_cache = {}
        if key not in cache:
            from . import pallas_kernels as pk

            cache[key] = pk.plan_camera_windows(
                np.asarray(pe.local), np.asarray(pf.local),
                np.asarray(pe.rplan[1]), pe.nv, pf.nv)
        return cache[key]

    def _kernel_scaled_rows(self, vflat, pe, pf, se, sf):
        """Transposed scaled lanes + id planes for the fused matvec,
        built once per evaluation (loop-invariant across CG iterations)."""
        from . import pallas_kernels as pk

        k = 0
        kind = self.kinds[k]
        Jf = vflat[k][pf.s]
        Je = vflat[k][pe.s]
        sf_rows = self._gather(sf, pf.off, pf.nv, pf.t, pf.local)
        se_rows = self._gather(se, pe.off, pe.nv, pe.t, pe.local, pe.pplan)
        Js_f = Jf * _mm(sf_rows, self.sel.get("rep_t", kind.r, pf.t, Jf.dtype))
        Js_e = Je * _mm(se_rows, self.sel.get("rep_t", kind.r, pe.t, Je.dtype))
        max_rows = pe.rplan[2]
        JT, ids_T = pk.prep_matvec_rows(
            Js_f, Js_e, pe.local, pf.local, max_rows, kind.r, pf.t, pe.t)
        return JT, ids_T, kind.r, max_rows


class FlatSchurOps(_FlatOpsBase):
    """Flattened products over the e/f partition (ITERATIVE_SCHUR)."""

    def __init__(self, pm: pt.PartitionedMeta):
        super().__init__(pm.base.kinds, pm.base.arrays)
        self.pm = pm
        self.plans_e = self._build(self._slots(pm.e_idx_keys, pm.e_bid_keys,
                                               pm.e_fams, pm.e_family_indices))
        self.plans_f = self._build(self._slots(pm.f_idx_keys, pm.f_bid_keys,
                                               pm.f_fams, pm.f_family_indices))

    def _slots(self, idx_keys, bid_keys, fams, part_list):
        for k, kind in enumerate(self.pm.base.kinds):
            for s, slot in enumerate(kind.slots):
                key = bid_keys[k][s]
                if key < 0 or not slot.any_variable:
                    continue
                fi = list(part_list).index(slot.family_index)
                off, nv, t, bid_off = fams[fi]
                yield (k, s, fi, off, nv, t, bid_off, key, idx_keys[k][s])

    def right_f(self, vflat, z):
        return self._right(self.plans_f, vflat, z)

    def right_e(self, vflat, y):
        return self._right(self.plans_e, vflat, y)

    def left_f(self, vflat, u):
        return self._left(self.plans_f, self.pm.f_fams, self.pm.f_size, vflat, u)

    def left_e(self, vflat, u):
        return self._left(self.plans_e, self.pm.e_fams, self.pm.e_size, vflat, u)

    def fused_post_eval_e(self, vflat, u):
        return self.fused_post_eval(self.plans_e, self.pm.e_fams,
                                    self.pm.e_size, vflat, u)

    def fused_post_eval_f(self, vflat, u, with_blocks=True):
        return self.fused_post_eval(self.plans_f, self.pm.f_fams,
                                    self.pm.f_size, vflat, u,
                                    with_blocks=with_blocks)

    def sq_col_norm_e(self, vflat):
        return self.sq_col_norm(self.plans_e, self.pm.e_fams, self.pm.e_size, vflat)

    def sq_col_norm_f(self, vflat):
        return self.sq_col_norm(self.plans_f, self.pm.f_fams, self.pm.f_size, vflat)

    def block_ete(self, vflat):
        """Flat per-e-block E'E diagonal blocks."""
        return self.block_jtj(self.plans_e, self.pm.e_fams, vflat)

    def block_ftf(self, vflat):
        """Flat per-f-block F'F diagonal blocks."""
        return self.block_jtj(self.plans_f, self.pm.f_fams, vflat)

    def minv_flatten(self, factors):
        return self._inv_flatten(self.pm.e_fams, factors)

    def minv_apply(self, minv_flats, v):
        return self._inv_apply(self.pm.e_fams, minv_flats, v)

    def schur_multiply(self, vflat, minv_flats, D_f, z):
        """S z == partition.schur_multiply, loop-resident tensors all 2-D."""
        fz = self.right_f(vflat, z)
        etfz = self.left_e(vflat, fz)
        e_part = self.right_e(vflat, self.minv_apply(minv_flats, etfz))
        out = self.left_f(vflat, fz - e_part)
        return out + (D_f * D_f) * z

    def make_kernel_matvec(self, vflat, se, sf):
        """Fused one-Pallas-kernel S·z over SCALED lanes (J pre-multiplied
        by se/sf): returns matvec(z, minv_flat) -> (S_wo_diag z, u) or None
        when the structure does not qualify. u = Minv E_s'F_s z gives the
        back-substitution y_e = minv(etb) - u(z_final) for free."""
        suite = self.make_kernel_suite(vflat, se, sf)
        return None if suite is None else suite[0]

    def kernel_masks(self):
        """Streamed one-hot mask planes for the fused matvec
        (pallas_kernels.build_matvec_masks): structure-constant, so build
        them ONCE per minimize (outside the LM while-loop) and pass to
        make_kernel_suite — never as a baked jit constant (GB-scale at
        Venice size) and never per-iteration."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None:
            return None
        pe, pf, _ = qual
        from . import pallas_kernels as pk

        # pe.local is sorted by point (qualification requires pe.srt) —
        # the same id order _kernel_scaled_rows feeds prep_matvec_rows
        return pk.build_matvec_masks(
            jnp.asarray(pe.local, jnp.int32),
            jnp.asarray(pf.local, jnp.int32),
            jnp.asarray(pe.rplan[1]), pe.nv, pe.rplan[2])

    def eval_kernel_qual(self, program):
        """Static qualification for the fused EVALUATION kernel
        (pallas_kernels.eval_fused): the matvec structure rules PLUS
        single 2-slot kind, Euclidean families both sides, a
        row-vectorized residual (cost.residual_rows), float observation
        data totalling <= 8 lanes, f32 compute. Robust losses are
        allowed — the Triggs corrector is folded into the kernel
        (loss_rho below). Returns (pe, pf, windows, rows_fn, fam_f,
        fam_e, data_leaves, loss_rho) or None."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None:
            return None
        if jnp.dtype(program.compute_dtype) != jnp.float32:
            return None
        if len(program.kinds) != 1:
            return None
        kind = program.kinds[0]  # the PROGRAM kind (cost/loss/data/fams)
        if len(kind.slots) != 2:
            return None
        from ..loss import LossFunction, TrivialLoss

        loss_rho = None
        if kind.loss is not None and not isinstance(kind.loss, TrivialLoss):
            if not isinstance(kind.loss, LossFunction):
                return None
            loss_rho = kind.loss.evaluate
        rows_fn = getattr(kind.cost, "residual_rows", None)
        if rows_fn is None or kind.r > 8:
            return None
        pe, pf, windows = qual
        fam_f = kind.slots[pf.s].family
        fam_e = kind.slots[pe.s].family
        from ..manifolds import EuclideanManifold

        # Non-Euclidean manifolds qualify when they provide the
        # Mosaic-lowerable rows-form PlusJacobian columns — the kernel
        # then feeds them as jvp tangents (the in-kernel chain rule,
        # residual_block.cc:70-196); Euclidean keeps the one-hot path.
        for fam in (fam_f, fam_e):
            m = getattr(fam, "manifold", None)
            if (m is not None and not isinstance(m, EuclideanManifold)
                    and not getattr(m, "supports_rows_columns", False)):
                return None
        if fam_e.asize > 8 or fam_f.asize > 16 or pe.t > 8 or pf.t > 16:
            return None
        if kind.data is None:
            return None
        leaves = jax.tree_util.tree_leaves(kind.data)
        lanes = 0
        for lf in leaves:
            a = np.asarray(lf)
            if a.dtype.kind not in "fiu" or a.shape[0] != kind.B:
                return None
            lanes += int(np.prod(a.shape[1:])) if a.ndim > 1 else 1
        if lanes > 8:
            return None
        return pe, pf, windows, rows_fn, fam_f, fam_e, leaves, loss_rho

    def eval_invariants(self, program, q):
        """Loop-invariant device tensors for eval_fused, built ONCE per
        minimize (prepare_invariants): id planes + transposed data
        lanes + streamed masks. All from baked numpy constants; the
        (8, n_pad) products are computed in-graph, pre-loop."""
        from . import pallas_kernels as pk

        pe, pf, windows, rows_fn, fam_f, fam_e, leaves, _loss = q
        kind = program.kinds[0]
        max_rows = pe.rplan[2]
        B = kind.B
        n_pad = pk.padded_rows(B, max_rows)
        cols = []
        for lf in leaves:
            a = jnp.asarray(np.asarray(lf), jnp.float32)
            cols.append(a.reshape(B, -1))
        data = jnp.concatenate(cols, axis=1)  # (B, d)
        d = data.shape[1]
        obs_T = jnp.zeros((max(8, d), n_pad), jnp.float32)
        obs_T = jax.lax.dynamic_update_slice(obs_T, data.T, (0, 0))
        pid_row = jnp.concatenate(
            [jnp.asarray(pe.local, jnp.int32),
             jnp.full((n_pad - B,), -1, jnp.int32)])
        cid_row = jnp.concatenate(
            [jnp.asarray(pf.local, jnp.int32),
             jnp.full((n_pad - B,), -1, jnp.int32)])
        ids_T = jnp.concatenate([
            pid_row[None, :], cid_row[None, :],
            jnp.zeros((6, n_pad), jnp.int32)], axis=0)
        masks = pk.build_matvec_masks(
            jnp.asarray(pe.local, jnp.int32),
            jnp.asarray(pf.local, jnp.int32),
            jnp.asarray(pe.rplan[1]), pe.nv, max_rows)
        gb = pk.row_tile_gather_bases(
            np.asarray(pe.local), np.asarray(pe.rplan[0]), pe.nv)
        return {"obs_T": obs_T, "ids_T": ids_T, "masks": masks,
                "gather_bases": jnp.asarray(gb)}

    def eval_fused_x(self, program, q, inv, x):
        """Fused evaluation at state x: returns (cost f64, rT, JT)."""
        from . import pallas_kernels as pk

        pe, pf, windows, rows_fn, fam_f, fam_e, _, loss_rho = q
        kind = program.kinds[0]
        max_rows = pe.rplan[2]
        xf = jax.lax.dynamic_slice(
            x, (fam_f.state_offset,),
            (fam_f.count * fam_f.asize,)).astype(jnp.float32)
        xe = jax.lax.dynamic_slice(
            x, (fam_e.state_offset,),
            (fam_e.count * fam_e.asize,)).astype(jnp.float32)
        C, af = fam_f.count, fam_f.asize
        P, ae = fam_e.count, fam_e.asize
        ga = max(16, -(-af // 8) * 8)
        C_pad = pk._cam_pad(C, windows)
        xf_T = jnp.zeros((ga, C_pad), jnp.float32)
        xf_T = jax.lax.dynamic_update_slice(
            xf_T, xf.reshape(C, af).T, (0, 0))
        nb = P + 1 + pk.BLOCKS_PER_TILE
        pw = jnp.zeros((nb, 128), jnp.float32)
        pw = jax.lax.dynamic_update_slice(pw, xe.reshape(P, ae), (0, 0))
        wkw = dict(win_starts=windows[0], win_width=windows[1],
                   n_win=windows[2]) if windows is not None else {}
        num_tiles = len(pe.rplan[1]) - 1
        from ..manifolds import EuclideanManifold

        def _pj(fam):
            m = getattr(fam, "manifold", None)
            if m is None or isinstance(m, EuclideanManifold):
                return None
            return m.plus_jacobian_columns_rows

        jt, rt, cost_part = pk.eval_fused(
            xf_T, pw, inv["obs_T"], inv["ids_T"], pe.rplan[0], pe.rplan[1],
            inv["gather_bases"],
            P, C, kind.r, pf.t, pe.t, rows_fn, max_rows=max_rows,
            unroll=16 if num_tiles >= 4096 else 8,
            interpret=PALLAS_MODE == "interpret",
            masks_T=inv["masks"], loss_rho=loss_rho,
            pj_cols_f=_pj(fam_f), pj_cols_e=_pj(fam_e), **wkw)
        cost = (0.5 * jnp.sum(cost_part.astype(jnp.float64))
                + jnp.asarray(program.fixed_cost, jnp.float64))
        return cost, rt, jt

    def post_eval_kernel_jt(self, JT, rT, ids_T, masks=None):
        """post_eval_fused over prebuilt transposed lanes (the jt-form
        evaluation path: no prep transpose at all)."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None:
            return None
        pe, pf, windows = qual
        from . import pallas_kernels as pk

        kind = self.kinds[0]
        tf, te = pf.t, pe.t
        max_rows = pe.rplan[2]
        wkw = dict(win_starts=windows[0], win_width=windows[1],
                   n_win=windows[2]) if windows is not None else {}
        num_tiles = len(pe.rplan[1]) - 1
        cam, ptab = pk.post_eval_fused(
            JT, ids_T, rT, pe.rplan[0], pe.rplan[1], pe.nv, pf.nv,
            kind.r, tf, te, max_rows=max_rows, masks_T=masks,
            unroll=16 if num_tiles >= 4096 else 8,
            interpret=PALLAS_MODE == "interpret", **wkw)
        gf = max(8, -(-tf // 8) * 8)
        g_e = ptab[:pe.nv, :te].reshape(-1)
        sqn_e = ptab[:pe.nv, te: 2 * te].reshape(-1)
        ete = ptab[:pe.nv, 2 * te: 2 * te + te * te]
        g_f = cam[:tf, :pf.nv].T.reshape(-1)
        sqn_f = cam[gf: gf + tf, :pf.nv].T.reshape(-1)
        return g_e, sqn_e, ete, g_f, sqn_f

    def make_kernel_suite_raw(self, JT, ids_T, se, sf, masks=None):
        """Scale-FOLDED kernel suite over UNSCALED transposed lanes (the
        jt-form path): no (B,·)-wide scaled prep pass at all. The Jacobi
        scales fold into the small operands instead:

          matvec:  S_s z = sf (.) F'(fz - E u'),  fz = F (sf (.) z),
                   u' = [se Minv_s se] E'fz      (pw carries the fold)
          normal:  J_s'J_s x through pre-scaled inputs / post-scaled
                   outputs
          SJ:      blocks_s[c] = sf_c (x) sf_c (.) (F'F - W' Minv_s W)
                   with W = diag(se) E'F (the kernel's sp slot)

        Returns (matvec, jacobi_blocks, normal, fold_minv)."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None:
            return None
        pe, pf, windows = qual
        from . import pallas_kernels as pk

        kind = self.kinds[0]
        r = kind.r
        tf, te = pf.t, pe.t
        gf = max(8, -(-tf // 8) * 8)
        max_rows = pe.rplan[2]
        interp = PALLAS_MODE == "interpret"
        num_tiles = len(pe.rplan[1]) - 1
        unroll = 16 if num_tiles >= 4096 else 8
        P, C = pe.nv, pf.nv
        se_rows = se.reshape(P, te)
        sf_rows = sf.reshape(C, tf)
        se_outer = (se_rows[:, :, None] * se_rows[:, None, :]).reshape(
            P, te * te)

        def fold_minv(minv_flat):
            folded = minv_flat * se_outer
            # per-tile pretransposed table (build_minv_tile_table): built
            # once per linearization, re-used by every CG matvec — 24 of
            # 128 sublanes of blk DMA per tile and no in-kernel transpose
            return folded, pk.build_minv_tile_table(
                folded, pe.rplan[1], te)

        def matvec(z, minv_folded, emit_u=False):
            if isinstance(minv_folded, tuple):
                minv_folded, mtab = minv_folded
            else:
                mtab = None
            cam, u = pk.isc_matvec(
                JT, ids_T, sf * z, minv_folded, pe.rplan[0], pe.rplan[1],
                P, C, r, tf, te, max_rows=max_rows, interpret=interp,
                emit_u=emit_u, windows=windows, masks_T=masks,
                minv_tiled=mtab, unroll=unroll)
            cam = sf * cam
            if emit_u:
                return cam, (u / se_rows).reshape(-1)
            return cam, None

        def normal(xc, xp_rows):
            cam, ptv = pk.normal_matvec(
                JT, ids_T, sf * xc, xp_rows * se_rows, pe.rplan[0],
                pe.rplan[1], P, C, r, tf, te, max_rows=max_rows,
                interpret=interp, windows=windows, masks_T=masks,
                unroll=unroll)
            return sf * cam, ptv * se_rows

        def _sj_from_flat(flat, minv_folded_unused, d2f):
            blocks = flat[:C].reshape(C, tf, gf)[:, :, :tf]
            blocks = blocks * (sf_rows[:, :, None] * sf_rows[:, None, :])
            d_rows = d2f.reshape(C, tf)
            M = blocks.reshape(C, tf * tf) + _mm(
                d_rows, diag_embed_selector(tf, jnp.float32))
            return [spd_inverse_flat(M, tf)]

        if windows is not None:
            if windows[3] * tf * gf * 4 > 10 * 1024 * 1024:
                return matvec, None, normal, fold_minv

            def jacobi_blocks_w(minv_flat, d2f):
                BT = pk.BLOCKS_PER_TILE
                pw = jnp.zeros((P + 1 + BT, 128), jnp.float32)
                pw = jax.lax.dynamic_update_slice(pw, se_rows, (0, 0))
                pw = jax.lax.dynamic_update_slice(
                    pw, minv_flat, (0, 8))
                flat = pk.sj_assembly_windowed(
                    JT, ids_T, pw, pe.rplan[0], pe.rplan[1], windows,
                    P, C, r, tf, te, max_rows=max_rows, interpret=interp,
                    unroll=unroll)
                return _sj_from_flat(flat, None, d2f)

            return matvec, jacobi_blocks_w, normal, fold_minv

        def jacobi_blocks(minv_flat, d2f):
            BT = pk.BLOCKS_PER_TILE
            pw = jnp.zeros((P + 1 + BT, 128), jnp.float32)
            pw = jax.lax.dynamic_update_slice(pw, se_rows, (0, 0))
            pw = jax.lax.dynamic_update_slice(pw, minv_flat, (0, 8))
            C_pad = max(128, -(-(C + 1) // 128) * 128)
            sc_T = jnp.zeros((gf, C_pad), jnp.float32)
            sc_T = jax.lax.dynamic_update_slice(sc_T, sf_rows.T, (0, 0))
            corr, ftf, _ = pk.schur_assembly(
                JT, ids_T, sc_T, pw, pe.rplan[0], pe.rplan[1], P, C, r,
                tf, te, max_rows=max_rows, interpret=interp,
                mode="schur_jacobi")
            blocks = (ftf - corr)[:C].reshape(C, tf, gf)[:, :, :tf]
            d_rows = d2f.reshape(C, tf)
            M = blocks.reshape(C, tf * tf) + _mm(
                d_rows, diag_embed_selector(tf, jnp.float32))
            return [spd_inverse_flat(M, tf)]

        return matvec, jacobi_blocks, normal, fold_minv

    def post_eval_kernel(self, vflat, u, masks=None):
        """One-pass fused post-evaluation reduce
        (pallas_kernels.post_eval_fused): g_e/sqn_e/E'E blocks +
        g_f/sqn_f in a single J read, replacing the multi-pass XLA
        selector chain (~95 ms/iter at Venice scale). Returns
        (g_e, sqn_e, ete_blocks, g_f, sqn_f) in partition layouts, or
        None when the structure doesn't qualify."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None or vflat[0][qual[0].s].dtype != jnp.float32:
            return None
        pe, pf, windows = qual
        from . import pallas_kernels as pk

        kind = self.kinds[0]
        Jf, Je = vflat[0][pf.s], vflat[0][pe.s]
        tf, te = pf.t, pe.t
        max_rows = pe.rplan[2]
        JT, ids_T = pk.prep_matvec_rows(
            Jf, Je, pe.local, pf.local, max_rows, kind.r, tf, te)
        B = Jf.shape[0]
        rows = u[kind.row_offset: kind.row_offset + kind.B * kind.r]
        rows = rows.reshape(kind.B, kind.r)
        rT = jnp.zeros((8, pk.padded_rows(B, max_rows)), Jf.dtype)
        rT = jax.lax.dynamic_update_slice(rT, rows.T.astype(Jf.dtype),
                                          (0, 0))
        wkw = dict(win_starts=windows[0], win_width=windows[1],
                   n_win=windows[2]) if windows is not None else {}
        num_tiles = len(pe.rplan[1]) - 1
        cam, ptab = pk.post_eval_fused(
            JT, ids_T, rT, pe.rplan[0], pe.rplan[1], pe.nv, pf.nv,
            kind.r, tf, te, max_rows=max_rows, masks_T=masks,
            unroll=16 if num_tiles >= 4096 else 8,
            interpret=PALLAS_MODE == "interpret", **wkw)
        gf = max(8, -(-tf // 8) * 8)
        g_e = ptab[:pe.nv, :te].reshape(-1)
        sqn_e = ptab[:pe.nv, te: 2 * te].reshape(-1)
        ete = ptab[:pe.nv, 2 * te: 2 * te + te * te]
        g_f = cam[:tf, :pf.nv].T.reshape(-1)
        sqn_f = cam[gf: gf + tf, :pf.nv].T.reshape(-1)
        return g_e, sqn_e, ete, g_f, sqn_f

    def make_kernel_suite(self, vflat, se, sf, masks=None):
        """(matvec, jacobi_blocks) over ONE scaled transposed J prep, or
        None. jacobi_blocks(minv_flat, d2f) returns the inverse flats of
        block-diag(S) (schur_jacobi_preconditioner.h:78) computed by the
        assembly kernel in mode='schur_jacobi' — the XLA chain builds
        (B, te*tf) W and (B, tf*tf) corrections in HBM per LM iteration;
        the kernel keeps them in VMEM. `masks` = kernel_masks() output
        for the streamed-mask matvec (optional)."""
        qual = self._kernel_slots(self.plans_e, self.plans_f,
                                  self.pm.e_fams, self.pm.f_fams)
        if qual is None or vflat[0][qual[0].s].dtype != jnp.float32:
            return None
        pe, pf, windows = qual
        from . import pallas_kernels as pk

        JT, ids_T, r, max_rows = self._kernel_scaled_rows(
            vflat, pe, pf, se, sf)
        interp = PALLAS_MODE == "interpret"
        tf, te = pf.t, pe.t
        gf = max(8, -(-tf // 8) * 8)
        num_tiles = len(pe.rplan[1]) - 1
        unroll = 16 if num_tiles >= 4096 else 8

        def fold_minv(minv_flat):
            return minv_flat, pk.build_minv_tile_table(
                minv_flat, pe.rplan[1], te)

        def matvec(z, minv_flat, emit_u=False):
            if isinstance(minv_flat, tuple):
                minv_flat, mtab = minv_flat
            else:
                mtab = None
            cam, u = pk.isc_matvec(
                JT, ids_T, z, minv_flat, pe.rplan[0], pe.rplan[1],
                pe.nv, pf.nv, r, tf, te, max_rows=max_rows,
                interpret=interp, emit_u=emit_u, windows=windows,
                masks_T=masks, minv_tiled=mtab, unroll=unroll)
            return cam, (u.reshape(-1) if emit_u else None)

        def normal(xc, xp_rows):
            """(F_s'(J_s x), E_s'(J_s x)) for x = [xc; xp] in scaled
            coords — one J pass (pallas_kernels.normal_matvec) replacing
            the right_e/right_f + left_e/left_f XLA chains in rhs/mcc."""
            cam, ptv = pk.normal_matvec(
                JT, ids_T, xc, xp_rows, pe.rplan[0], pe.rplan[1],
                pe.nv, pf.nv, r, tf, te, max_rows=max_rows,
                interpret=interp, windows=windows,
                masks_T=masks, unroll=unroll)
            return cam, ptv

        if windows is not None:
            # large C: global one-hot masks don't fit VMEM — assemble
            # block-diag(S) through the camera-windowed kernel
            # (pallas_kernels.sj_assembly_windowed); the single
            # (C_pad, tf*gf) accumulator is ~8 MB at C=13.7k.
            if windows[3] * tf * gf * 4 > 10 * 1024 * 1024:
                return matvec, None, normal, fold_minv  # SJ exceeds VMEM

            def jacobi_blocks_w(minv_flat, d2f):
                P, C = pe.nv, pf.nv
                BT = pk.BLOCKS_PER_TILE
                dt = JT.dtype
                pw = jnp.zeros((P + 1 + BT, 128), dt)
                pw = jax.lax.dynamic_update_slice(
                    pw, jnp.ones((P, te), dt), (0, 0))
                pw = jax.lax.dynamic_update_slice(pw, minv_flat, (0, 8))
                flat = pk.sj_assembly_windowed(
                    JT, ids_T, pw, pe.rplan[0], pe.rplan[1], windows,
                    P, C, r, tf, te, max_rows=max_rows, interpret=interp,
                    unroll=unroll)
                blocks = flat[:C].reshape(C, tf, gf)[:, :, :tf]
                d_rows = d2f.reshape(C, tf)
                M = blocks.reshape(C, tf * tf) + _mm(
                    d_rows, diag_embed_selector(tf, dt))
                return [spd_inverse_flat(M, tf)]

            return matvec, jacobi_blocks_w, normal, fold_minv

        def jacobi_blocks(minv_flat, d2f):
            P, C = pe.nv, pf.nv
            BT = pk.BLOCKS_PER_TILE
            dt = JT.dtype
            pw = jnp.zeros((P + 1 + BT, 128), dt)
            pw = jax.lax.dynamic_update_slice(
                pw, jnp.ones((P, te), dt), (0, 0))  # sp slot: lanes folded
            pw = jax.lax.dynamic_update_slice(pw, minv_flat, (0, 8))
            C_pad = max(128, -(-(C + 1) // 128) * 128)
            sc_T = jnp.zeros((gf, C_pad), dt)
            sc_T = jax.lax.dynamic_update_slice(
                sc_T, jnp.ones((tf, C), dt), (0, 0))
            corr, ftf, _ = pk.schur_assembly(
                JT, ids_T, sc_T, pw, pe.rplan[0], pe.rplan[1], P, C, r,
                tf, te, max_rows=max_rows, interpret=interp,
                mode="schur_jacobi")
            blocks = (ftf - corr)[:C].reshape(C, tf, gf)[:, :, :tf]
            d_rows = d2f.reshape(C, tf)
            M = blocks.reshape(C, tf * tf) + _mm(
                d_rows, diag_embed_selector(tf, dt))
            return [spd_inverse_flat(M, tf)]

        return matvec, jacobi_blocks, normal, fold_minv



class FlatJacobianOps(_FlatOpsBase):
    """Flattened J / J' products over the full tangent (CGNR path:
    bsr.right_multiply / bsr.left_multiply equivalents)."""

    def __init__(self, meta):
        super().__init__(meta.kinds, meta.arrays)
        self.meta = meta
        self.fams = tuple(
            (f.tangent_offset, f.num_var, f.t, f.block_id_offset)
            for f in meta.families
        )
        self.plans = self._build(self._slots())

    def _slots(self):
        for k, kind in enumerate(self.meta.kinds):
            for s, slot in enumerate(kind.slots):
                if not slot.any_variable:
                    continue
                fi = slot.family_index
                off, nv, t, bid_off = self.fams[fi]
                yield (k, s, fi, off, nv, t, bid_off,
                       slot.block_id_key, slot.tangent_idx_key)

    def right(self, vflat, x):
        """J x."""
        return self._right(self.plans, vflat, x)

    def left(self, vflat, u):
        """J' u."""
        return self._left(self.plans, self.fams, self.meta.tangent_size,
                          vflat, u)

    def fused_post_eval_all(self, vflat, u):
        """(gradient, diag(J'J), per-family J'J blocks) in one reduction
        pass per slot."""
        return self.fused_post_eval(self.plans, self.fams,
                                    self.meta.tangent_size, vflat, u)

    def sq_col_norm_all(self, vflat):
        """diag(J'J) over the full tangent."""
        return self.sq_col_norm(self.plans, self.fams, self.meta.tangent_size,
                                vflat)

    def block_jtj_all(self, vflat):
        """Flat per-variable-block diagonal blocks of J'J."""
        return self.block_jtj(self.plans, self.fams, vflat)

    def inv_flatten(self, factors):
        return self._inv_flatten(self.fams, factors)

    def inv_apply(self, inv_flats, v):
        return self._inv_apply(self.fams, inv_flats, v)

    def normal_multiply(self, vflat, D, x):
        """(J'J + D^2) x, loop-resident tensors all 2-D."""
        return self.left(vflat, self.right(vflat, x)) + (D * D) * x

    def make_kernel_matvec(self, vflat, scale):
        """Fused one-Pallas-kernel (J_s'J_s)x for two-family programs with
        one sorted (point-like) family — the CGNR hot op. Returns
        matvec(x) in the full tangent layout, or None."""
        if len(self.kinds) != 1 or len(self.plans[0]) != 2:
            return None
        a, b = self.plans[0]
        pe = a if (a.srt and a.pplan is not None) else b
        pf = b if pe is a else a
        qual = self._kernel_slots(
            [[pe]], [[pf]], [self.fams[pe.fi]], [self.fams[pf.fi]])
        if qual is None or vflat[0][pe.s].dtype != jnp.float32:
            return None
        windows = qual[2]
        from . import pallas_kernels as pk

        JT, ids_T, r, max_rows = self._kernel_scaled_rows(
            vflat, pe, pf, scale, scale)
        interp = PALLAS_MODE == "interpret"
        size = self.meta.tangent_size

        def matvec(x):
            xc = jax.lax.dynamic_slice(x, (pf.off,), (pf.nv * pf.t,))
            xp = jax.lax.dynamic_slice(
                x, (pe.off,), (pe.nv * pe.t,)).reshape(pe.nv, pe.t)
            cam, pt = pk.normal_matvec(
                JT, ids_T, xc, xp, pe.rplan[0], pe.rplan[1],
                pe.nv, pf.nv, r, pf.t, pe.t, max_rows=max_rows,
                interpret=interp, windows=windows)
            out = jnp.zeros((size,), x.dtype)
            out = jax.lax.dynamic_update_slice(out, cam, (pf.off,))
            out = jax.lax.dynamic_update_slice(
                out, pt.reshape(-1), (pe.off,))
            return out

        return matvec
