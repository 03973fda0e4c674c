"""CompiledProgram: lowering a Problem to static batched arrays + jitted evaluators.

This is the TPU-native fusion of the reference's Program
(/root/reference/internal/ceres/program.cc — SetParameterOffsetsAndIndex:144,
CreateReducedProgram:291, RemoveFixedBlocks:309) and ProgramEvaluator
(/root/reference/internal/ceres/program_evaluator.h:118-397). Where the
reference ParallelFor's over residual blocks with per-thread scratch and
writes Jacobian blocks in place, here residual blocks are bucketed into
*kinds* (same cost function + loss + per-slot manifold family — the analog of
"detect structure" / the 21 generated template specializations), each kind is
evaluated as ONE vmapped forward-mode autodiff call (dense batched ops on the
MXU), and gradients/Jacobians are assembled by scatter-add (segment-sum) —
no locks, deterministic by construction.

Layout invariants (what makes this fast):
 - state vector x is family-major and block-contiguous: gathering a family is
   a reshape, not a gather;
 - within a family, variable blocks come first, then constant blocks; the
   tangent vector is family-major over variable blocks only;
 - constant blocks scatter into a 1-element padding slot (index == tangent
   size) that is sliced off — branch-free handling of constants, the analog
   of the reference dropping fixed blocks from the Jacobian
   (program.cc:309).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .loss import correct_residuals_and_jacobians
from .manifolds import EuclideanManifold, Manifold
from .problem import ParameterBlock, Problem, ResidualBlock


@dataclasses.dataclass
class Family:
    """Blocks sharing (ambient size, manifold); vmapped together.

    Either a group of individual ParameterBlocks, or one
    ParameterBlockArray (`array` set, `blocks` empty) — the zero-overhead
    scale path."""

    manifold: Optional[Manifold]  # None => Euclidean fast path
    blocks: List[ParameterBlock]
    asize: int
    num_var: int  # leading blocks are variable; the rest constant
    state_offset: int = 0
    tangent_offset: int = 0
    lower: Optional[np.ndarray] = None  # (num_var, asize) or None
    upper: Optional[np.ndarray] = None
    array: object = None  # ParameterBlockArray or None

    @property
    def tsize(self) -> int:
        if self.manifold is None:
            return self.asize
        return self.manifold.tangent_size

    @property
    def count(self) -> int:
        if self.array is not None:
            return self.array.B
        return len(self.blocks)


@dataclasses.dataclass
class SlotPlan:
    """Per-parameter-slot indexing for one kind."""

    family: Family
    state_idx: np.ndarray  # (B, asize) int32 gather into x
    tangent_idx: np.ndarray  # (B, tsize) int32 scatter into gradient (sentinel=T)
    pos_in_family: np.ndarray  # (B,) int32 row in the family's (count, a) view
    any_variable: bool


@dataclasses.dataclass
class Kind:
    """One residual-block bucket: same cost fn, loss, slot families."""

    cost: object
    loss: object
    rbs: List[ResidualBlock]
    slots: List[SlotPlan]
    data: object  # stacked pytree (leaves (B, ...)) or None
    row_offset: int
    B: int
    r: int


def _family_key(blk: ParameterBlock):
    mkey = blk.manifold.batch_key() if blk.manifold is not None else ("Euclidean", blk.size)
    return (blk.size, mkey)


def _stack_data(rbs: List[ResidualBlock]):
    datas = [rb.data for rb in rbs]
    if all(d is None for d in datas):
        return None
    if any(d is None for d in datas):
        raise ValueError("all residual blocks of a kind must carry data, or none")
    leaves_list = [jax.tree_util.tree_flatten(d) for d in datas]
    treedef = leaves_list[0][1]
    stacked = [
        jnp.asarray(np.stack([lv[i] for lv, _ in leaves_list]))
        for i in range(len(leaves_list[0][0]))
    ]
    return jax.tree_util.tree_unflatten(treedef, stacked)


class CompiledProgram:
    """Static evaluation plan + jitted evaluators for a Problem snapshot."""

    def __init__(self, problem: Problem, apply_loss: bool = True,
                 compute_dtype: str = "float64", sort_rows: bool = False):
        self.problem = problem
        self.apply_loss = apply_loss
        # "float32" evaluates residuals/Jacobians in fp32 (the TPU-native
        # precision; fp64 is emulated) while the solver state and all
        # host-side control flow stay fp64 — Options.evaluation_dtype.
        self.compute_dtype = jnp.dtype(compute_dtype)
        # sort_rows: reorder each kind's rows by its largest family's block
        # ids so the solver's per-block scatter-adds are SORTED segment
        # reductions (the TPU analog of the reference's cumulative-nnz row
        # partitioning, block_sparse_matrix.cc). Used by the solve driver;
        # Problem.evaluate keeps the user's residual-block add order.
        self.sort_rows = sort_rows
        self.structure_version = problem.structure_version
        self._fn_cache: Dict[str, object] = {}
        self._minimizer_cache: Dict[object, object] = {}
        self._build()

    @classmethod
    def cached(cls, problem: Problem, apply_loss: bool = True,
               compute_dtype: str = "float64", sort_rows: bool = False):
        """Structure-version fast path: reuse the compiled program (and with
        it every jitted evaluator and cached fused minimizer) across
        repeated solves of the same Problem.  Any structural mutation —
        add/remove blocks, constancy, manifolds, bounds — bumps
        Problem.structure_version and invalidates the entry; parameter
        VALUES are read live (initial_state), so value updates between
        solves hit the cache."""
        key = (bool(apply_loss), str(jnp.dtype(compute_dtype)),
               bool(sort_rows))
        cache = getattr(problem, "_compiled_cache", None)
        if cache is None:
            cache = problem._compiled_cache = {}
        prog = cache.get(key)
        if prog is not None and prog.structure_version == problem.structure_version:
            return prog
        prog = cls(problem, apply_loss=apply_loss,
                   compute_dtype=compute_dtype, sort_rows=sort_rows)
        cache[key] = prog
        return prog

    def _cast_in(self, x):
        if self.compute_dtype == jnp.float64:
            return x
        return x.astype(self.compute_dtype)

    def _cast_data(self, data):
        if data is None or self.compute_dtype == jnp.float64:
            return data
        return jax.tree_util.tree_map(
            lambda a: a.astype(self.compute_dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
            else a,
            data,
        )

    # ------------------------------------------------------------------ build

    def _build(self):
        problem = self.problem
        rbs_all = problem.residual_blocks()

        # Reduced program (program.cc:291): keep residual blocks with at
        # least one variable parameter; all-constant ones contribute
        # fixed_cost. Blocks referenced by no active residual are dropped
        # from the state vector.
        active_rbs: List[ResidualBlock] = []
        fixed_rbs: List[ResidualBlock] = []
        for rb in rbs_all:
            if any(not b.constant for b in rb.blocks):
                active_rbs.append(rb)
            else:
                fixed_rbs.append(rb)
        self.active_rbs = active_rbs
        self.fixed_rbs = fixed_rbs

        used: Dict[int, ParameterBlock] = {}
        for rb in active_rbs:
            for b in rb.blocks:
                used.setdefault(id(b), b)
        # Deterministic order: problem insertion order.
        used_blocks = [b for b in problem.parameter_blocks() if id(b) in used]

        # Families.
        fam_map: Dict[tuple, Family] = {}
        for b in used_blocks:
            key = _family_key(b)
            fam = fam_map.get(key)
            if fam is None:
                fam = Family(manifold=b.manifold, blocks=[], asize=b.size, num_var=0)
                fam_map[key] = fam
            fam.blocks.append(b)
        self.families: List[Family] = list(fam_map.values())
        self._fam_of_key = fam_map

        # Order blocks variable-first within each family; assign offsets.
        state_off = 0
        tangent_off = 0
        self._block_pos: Dict[int, Tuple[Family, int]] = {}
        for fam in self.families:
            variable = [b for b in fam.blocks if not b.constant]
            constant = [b for b in fam.blocks if b.constant]
            fam.blocks = variable + constant
            fam.num_var = len(variable)
            fam.state_offset = state_off
            fam.tangent_offset = tangent_off
            state_off += fam.count * fam.asize
            tangent_off += fam.num_var * fam.tsize
            for i, b in enumerate(fam.blocks):
                self._block_pos[id(b)] = (fam, i)
            if any(b.has_bounds() for b in variable):
                lo = np.full((fam.num_var, fam.asize), -np.inf)
                hi = np.full((fam.num_var, fam.asize), np.inf)
                for i, b in enumerate(variable):
                    if b.lower_bounds is not None:
                        lo[i] = b.lower_bounds
                    if b.upper_bounds is not None:
                        hi[i] = b.upper_bounds
                fam.lower, fam.upper = lo, hi
        # Array families (the batched fast path): appended after the
        # individual-block families; referenced arrays only.
        used_arrays = {}
        for rec in problem.batched_residual_blocks():
            for arr, _ in rec.slots:
                used_arrays.setdefault(id(arr), arr)
        self._array_family: Dict[int, Family] = {}
        for arr in problem.parameter_block_arrays():
            if id(arr) not in used_arrays:
                continue
            fam = Family(
                manifold=arr.manifold,
                blocks=[],
                asize=arr.size,
                num_var=0 if arr.constant else arr.B,
                state_offset=state_off,
                tangent_offset=tangent_off,
                array=arr,
            )
            if not arr.constant and (
                arr.lower_bounds is not None or arr.upper_bounds is not None
            ):
                fam.lower = (
                    arr.lower_bounds
                    if arr.lower_bounds is not None
                    else np.full((arr.B, arr.size), -np.inf)
                )
                fam.upper = (
                    arr.upper_bounds
                    if arr.upper_bounds is not None
                    else np.full((arr.B, arr.size), np.inf)
                )
            self.families.append(fam)
            self._array_family[id(arr)] = fam
            state_off += arr.B * arr.size
            tangent_off += fam.num_var * fam.tsize

        self.state_size = state_off
        self.tangent_size = tangent_off

        # Kinds: bucket active residual blocks.
        kind_map: Dict[tuple, List[ResidualBlock]] = {}
        for rb in active_rbs:
            slot_fams = tuple(id(self._block_pos[id(b)][0]) for b in rb.blocks)
            dshape = (
                None
                if rb.data is None
                else tuple(
                    (np.shape(leaf), np.asarray(leaf).dtype.str)
                    for leaf in jax.tree_util.tree_leaves(rb.data)
                )
            )
            key = (id(rb.cost), id(rb.loss), slot_fams, dshape)
            kind_map.setdefault(key, []).append(rb)

        def _sort_perm(slots: List[SlotPlan]):
            """Permutation ordering rows by the largest variable family's
            block ids (None when already sorted or sorting disabled)."""
            if not self.sort_rows or not slots:
                return None
            best = max(
                (s for s in slots if s.any_variable),
                key=lambda s: s.family.count,
                default=None,
            )
            if best is None:
                return None
            pos = best.pos_in_family
            if np.all(pos[1:] >= pos[:-1]):
                return None
            return np.argsort(pos, kind="stable")

        def _apply_perm(slots, perm):
            return [
                SlotPlan(
                    family=s.family,
                    state_idx=s.state_idx[perm],
                    tangent_idx=s.tangent_idx[perm],
                    pos_in_family=s.pos_in_family[perm],
                    any_variable=s.any_variable,
                )
                for s in slots
            ]

        self.kinds: List[Kind] = []
        row_off = 0
        for key, rbs in kind_map.items():
            cost = rbs[0].cost
            B = len(rbs)
            r = cost.num_residuals
            slots: List[SlotPlan] = []
            for si, size in enumerate(cost.parameter_block_sizes):
                fam, _ = self._block_pos[id(rbs[0].blocks[si])]
                pos = np.array(
                    [self._block_pos[id(rb.blocks[si])][1] for rb in rbs], dtype=np.int32
                )
                state_idx = (
                    fam.state_offset + pos[:, None] * fam.asize + np.arange(fam.asize)[None, :]
                ).astype(np.int32)
                t = fam.tsize
                is_var = pos < fam.num_var
                tstart = np.where(
                    is_var, fam.tangent_offset + pos * t, self.tangent_size
                ).astype(np.int64)
                tangent_idx = np.where(
                    is_var[:, None],
                    tstart[:, None] + np.arange(t)[None, :],
                    self.tangent_size,
                ).astype(np.int32)
                slots.append(
                    SlotPlan(
                        family=fam,
                        state_idx=state_idx,
                        tangent_idx=tangent_idx,
                        pos_in_family=pos,
                        any_variable=bool(is_var.any()),
                    )
                )
            data = _stack_data(rbs)
            perm = _sort_perm(slots)
            if perm is not None:
                slots = _apply_perm(slots, perm)
                rbs = [rbs[i] for i in perm]
                if data is not None:
                    data = jax.tree_util.tree_map(lambda a: a[perm], data)
            self.kinds.append(
                Kind(
                    cost=cost,
                    loss=rbs[0].loss if self.apply_loss else None,
                    rbs=rbs,
                    slots=slots,
                    data=data,
                    row_offset=row_off,
                    B=B,
                    r=r,
                )
            )
            row_off += B * r

        # Batched records: each is one Kind directly (zero per-block work).
        self.batched_fixed = []  # all-constant batched records -> fixed cost
        for rec in problem.batched_residual_blocks():
            if all(arr.constant for arr, _ in rec.slots):
                self.batched_fixed.append(rec)
                continue
            slots = []
            for si, (arr, idx) in enumerate(rec.slots):
                fam = self._array_family[id(arr)]
                a = fam.asize
                state_idx = (
                    fam.state_offset + idx[:, None] * a + np.arange(a)[None, :]
                ).astype(np.int32)
                t = fam.tsize
                if arr.constant:
                    tangent_idx = np.full((rec.B, t), self.tangent_size, np.int32)
                    any_var = False
                else:
                    tangent_idx = (
                        fam.tangent_offset + idx[:, None] * t + np.arange(t)[None, :]
                    ).astype(np.int32)
                    any_var = True
                slots.append(
                    SlotPlan(
                        family=fam,
                        state_idx=state_idx,
                        tangent_idx=tangent_idx,
                        pos_in_family=idx.astype(np.int32),
                        any_variable=any_var,
                    )
                )
            data = None
            if rec.data is not None:
                data = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(np.asarray(a)), rec.data
                )
            perm = _sort_perm(slots)
            if perm is not None:
                slots = _apply_perm(slots, perm)
                if data is not None:
                    data = jax.tree_util.tree_map(lambda a: a[perm], data)
            self.kinds.append(
                Kind(
                    cost=rec.cost,
                    loss=rec.loss if self.apply_loss else None,
                    rbs=[],
                    slots=slots,
                    data=data,
                    row_offset=row_off,
                    B=rec.B,
                    r=rec.cost.num_residuals,
                )
            )
            row_off += rec.B * rec.cost.num_residuals

        self.num_residuals = row_off

        # Fixed cost from all-constant residual blocks (program.cc:309).
        self.fixed_cost = 0.0
        if fixed_rbs or self.batched_fixed:
            total = 0.0
            for rb in fixed_rbs:
                params = [jnp.asarray(b.values) for b in rb.blocks]
                res = rb.cost.residuals(params, rb.data)
                s = float(jnp.sum(res * res))
                if self.apply_loss and rb.loss is not None:
                    rho0, _, _ = rb.loss.evaluate(jnp.asarray(s))
                    total += 0.5 * float(rho0)
                else:
                    total += 0.5 * s
            for rec in self.batched_fixed:
                params = tuple(
                    jnp.asarray(arr.values[idx]) for arr, idx in rec.slots
                )
                data = (
                    jax.tree_util.tree_map(jnp.asarray, rec.data)
                    if rec.data is not None
                    else None
                )
                fn = jax.vmap(
                    lambda ps, d: rec.cost.residuals(list(ps), d),
                    in_axes=((0,) * len(rec.slots), None if data is None else 0),
                )
                res = fn(params, data)
                s = jnp.sum(res * res, axis=-1)
                if self.apply_loss and rec.loss is not None:
                    rho0, _, _ = rec.loss.evaluate(s)
                    total += 0.5 * float(jnp.sum(rho0))
                else:
                    total += 0.5 * float(jnp.sum(s))
            self.fixed_cost = total

    # ---------------------------------------------------------------- state IO

    def initial_state(self) -> jax.Array:
        parts = []
        for fam in self.families:
            if fam.array is not None:
                parts.append(fam.array.values.reshape(-1))
            else:
                for b in fam.blocks:
                    parts.append(b.values)
        if not parts:
            return jnp.zeros((0,), dtype=jnp.float64)
        return jnp.asarray(np.concatenate(parts))

    def write_state(self, x) -> None:
        """Write solver state back into the user-owned arrays."""
        xv = np.asarray(x)
        for fam in self.families:
            off = fam.state_offset
            if fam.array is not None:
                n = fam.array.B * fam.asize
                fam.array.values[...] = xv[off : off + n].reshape(
                    fam.array.B, fam.asize
                )
                continue
            for b in fam.blocks:
                b.values[:] = xv[off : off + fam.asize]
                off += fam.asize

    def state_norm(self, x) -> jax.Array:
        return jnp.linalg.norm(x)

    # ------------------------------------------------------------- evaluators

    def _vmapped_eval(self, kind: Kind, with_jac: bool):
        cost = kind.cost

        if with_jac:

            def one(params, data):
                return cost.residuals_and_jacobians(list(params), data)

        else:

            def one(params, data):
                return cost.residuals(list(params), data)

        in_axes = ((0,) * len(kind.slots), None if kind.data is None else 0)
        return jax.vmap(one, in_axes=in_axes)

    def _plus_jacobians(self, x):
        """Per-family (count, asize, tsize) PlusJacobians (only non-Euclidean)."""
        out = {}
        for fam in self.families:
            if fam.manifold is None or isinstance(fam.manifold, EuclideanManifold):
                continue
            xf = jax.lax.dynamic_slice(
                x, (fam.state_offset,), (fam.count * fam.asize,)
            ).reshape(fam.count, fam.asize)
            out[id(fam)] = jax.vmap(fam.manifold.plus_jacobian)(xf)
        return out

    def make_args(self, pad_to: int = 1):
        """Bundle the per-kind observation arrays (gather indices + stacked
        data + a validity weight) into a pytree so they can be jit ARGUMENTS
        — the hook for sharding them over a device mesh (parallel/mesh.py).
        Padding rows replicate the last observation with weight 0 so every
        kind's batch divides the mesh size."""
        args = []
        for kind in self.kinds:
            B = kind.B
            pad = (-B) % pad_to
            idx = np.concatenate([np.arange(B), np.full(pad, B - 1)]).astype(np.int64)
            w = np.concatenate([np.ones(B), np.zeros(pad)])
            slots = []
            for s in kind.slots:
                state_idx = s.state_idx[idx]
                tangent_idx = np.where(
                    w[:, None] > 0, s.tangent_idx[idx], self.tangent_size
                ).astype(np.int32)
                pos = s.pos_in_family[idx]
                slots.append(
                    {
                        "state_idx": jnp.asarray(state_idx),
                        "tangent_idx": jnp.asarray(tangent_idx),
                        "pos_in_family": jnp.asarray(pos),
                    }
                )
            data = None
            if kind.data is not None:
                data = jax.tree_util.tree_map(
                    lambda a: jnp.asarray(np.asarray(a)[idx]), kind.data
                )
            args.append({"slots": slots, "data": data, "w": jnp.asarray(w)})
        return args

    def _eval_core(self, x, with_jac: bool, dense_jac: bool, args=None,
                   need_grad: bool = True):
        """Shared evaluation body; returns dict of outputs.

        With `args` (from make_args), the observation arrays are traced
        inputs (shardable); without, they are baked constants. args-mode
        supports cost/gradient/block_jacs (batch sizes may be padded) but
        not the dense Jacobian layout. `need_grad=False` skips the
        per-element gradient scatter (the fused minimizer computes the
        gradient from the flat block layout instead, ops/flatops.py)."""
        assert args is None or not dense_jac
        x = self._cast_in(x)
        total_cost = jnp.asarray(self.fixed_cost, dtype=jnp.float64)
        res_chunks = []
        T = self.tangent_size
        grad = (
            jnp.zeros((T + 1,), dtype=jnp.float64)
            if (with_jac and need_grad)
            else None
        )
        J_dense = (
            jnp.zeros((self.num_residuals, T + 1), dtype=jnp.float64)
            if (with_jac and dense_jac)
            else None
        )
        block_jacs = []  # list over kinds of list over slots of (B, r, t)
        plus_jacs = self._plus_jacobians(x) if with_jac else {}

        # Family state tables for block-ROW gathers: a slot's parameters are
        # one contiguous row of its family's (count, asize) view, so
        # xf[pos] is a row gather (~20 ns/row on TPU) instead of asize
        # scalar gathers per observation (ops/flatops.py module docstring).
        fam_tables = {}
        for fam in self.families:
            fam_tables[id(fam)] = jax.lax.dynamic_slice(
                x, (fam.state_offset,), (fam.count * fam.asize,)
            ).reshape(fam.count, fam.asize)

        for ki, kind in enumerate(self.kinds):
            if args is not None:
                a = args[ki]
                tangent_idx = [sl["tangent_idx"] for sl in a["slots"]]
                pos_in_family = [sl["pos_in_family"] for sl in a["slots"]]
                kdata = self._cast_data(a["data"])
                w = self._cast_in(a["w"])
            else:
                tangent_idx = [jnp.asarray(s.tangent_idx) for s in kind.slots]
                pos_in_family = [jnp.asarray(s.pos_in_family) for s in kind.slots]
                kdata = self._cast_data(kind.data)
                w = None
            params = tuple(
                jnp.take(fam_tables[id(s.family)], pos, axis=0)
                for s, pos in zip(kind.slots, pos_in_family)
            )
            fn = self._vmapped_eval(kind, with_jac)
            if with_jac:
                res, jacs = fn(params, kdata)
                if w is not None:
                    res = res * w[:, None]
                    jacs = [J * w[:, None, None] for J in jacs]
                tjacs = []
                for s, pos, J in zip(kind.slots, pos_in_family, jacs):
                    fam = s.family
                    pj = plus_jacs.get(id(fam))
                    if pj is None:
                        tj = J  # Euclidean: tangent == ambient
                    else:
                        pj_b = jnp.take(pj, pos, axis=0)
                        tj = jnp.einsum("bra,bat->brt", J, pj_b)
                    tjacs.append(tj)
                cost_b, res_c, tjacs = correct_residuals_and_jacobians(
                    kind.loss, res, tjacs
                )
            else:
                res = fn(params, kdata)
                if w is not None:
                    res = res * w[:, None]
                cost_b, res_c, _ = correct_residuals_and_jacobians(kind.loss, res, [])
                tjacs = None
            total_cost = total_cost + jnp.sum(cost_b)
            res_chunks.append(res_c.reshape(-1))
            if with_jac:
                block_jacs.append(tjacs)
                for s, ti, tj in zip(kind.slots, tangent_idx, tjacs):
                    if not s.any_variable or (grad is None and not dense_jac):
                        continue
                    if grad is not None:
                        contrib = jnp.einsum("brt,br->bt", tj, res_c)
                        grad = grad.at[ti.reshape(-1)].add(contrib.reshape(-1))
                    if dense_jac:
                        rows = kind.row_offset + np.arange(kind.B * kind.r).reshape(
                            kind.B, kind.r
                        )
                        J_dense = J_dense.at[
                            jnp.asarray(rows)[:, :, None],
                            ti[:, None, :],
                        ].add(tj)

        residuals = (
            jnp.concatenate(res_chunks)
            if res_chunks
            else jnp.zeros((0,), dtype=jnp.float64)
        )
        out = {"cost": total_cost, "residuals": residuals}
        if with_jac:
            if grad is not None:
                out["gradient"] = grad[:T]
            out["block_jacs"] = block_jacs
            if dense_jac:
                out["jacobian"] = J_dense[:, :T]
        return out

    # Cached jitted entry points -------------------------------------------

    def _get_fn(self, name, builder):
        fn = self._fn_cache.get(name)
        if fn is None:
            fn = builder()
            self._fn_cache[name] = fn
        return fn

    def evaluate_cost(self, x):
        fn = self._get_fn(
            "cost", lambda: jax.jit(lambda x: self._eval_core(x, False, False)["cost"])
        )
        return fn(x)

    def evaluate_residuals(self, x):
        def build():
            def f(x):
                o = self._eval_core(x, False, False)
                return o["cost"], o["residuals"]

            return jax.jit(f)

        return self._get_fn("residuals", build)(x)

    def evaluate_dense(self, x):
        """-> (cost, residuals, gradient, dense tangent-space Jacobian)."""

        def build():
            def f(x):
                o = self._eval_core(x, True, True)
                return o["cost"], o["residuals"], o["gradient"], o["jacobian"]

            return jax.jit(f)

        return self._get_fn("dense", build)(x)

    def evaluate_grad(self, x):
        """-> (cost, residuals, gradient) without materializing J."""

        def build():
            def f(x):
                o = self._eval_core(x, True, False)
                return o["cost"], o["residuals"], o["gradient"]

            return jax.jit(f)

        return self._get_fn("grad", build)(x)

    def evaluate_bsr(self, x):
        """-> (cost, residuals, gradient, block_jacs) — the block-sparse
        Jacobian as per-kind per-slot (B, r, t) tensors (see ops/bsr.py)."""

        def build():
            def f(x):
                o = self._eval_core(x, True, False)
                return o["cost"], o["residuals"], o["gradient"], o["block_jacs"]

            return jax.jit(f)

        return self._get_fn("bsr", build)(x)

    # Step application ------------------------------------------------------

    def has_bounds(self) -> bool:
        return any(f.lower is not None for f in self.families)

    def plus(self, x, delta):
        fn = self._get_fn("plus", lambda: jax.jit(self._plus_impl))
        return fn(x, delta)

    def _plus_impl(self, x, delta):
        """x ⊞ delta with box-bound projection, per ParameterBlock::Plus."""
        parts = []
        for fam in self.families:
            xf = jax.lax.dynamic_slice(
                x, (fam.state_offset,), (fam.count * fam.asize,)
            ).reshape(fam.count, fam.asize)
            if fam.num_var > 0:
                df = jax.lax.dynamic_slice(
                    delta, (fam.tangent_offset,), (fam.num_var * fam.tsize,)
                ).reshape(fam.num_var, fam.tsize)
                xv = xf[: fam.num_var]
                if fam.manifold is None or isinstance(fam.manifold, EuclideanManifold):
                    xv = xv + df
                else:
                    xv = jax.vmap(fam.manifold.plus)(xv, df)
                if fam.lower is not None:
                    xv = jnp.clip(xv, jnp.asarray(fam.lower), jnp.asarray(fam.upper))
                xf = jnp.concatenate([xv, xf[fam.num_var :]], axis=0)
            parts.append(xf.reshape(-1))
        if not parts:
            return x
        return jnp.concatenate(parts)

    # Bounds helpers for projected gradient (trust_region_minimizer.cc:281) --

    def ambient_bounds(self):
        """(lower, upper) arrays over the full state vector (inf-filled)."""
        lo = np.full(self.state_size, -np.inf)
        hi = np.full(self.state_size, np.inf)
        for fam in self.families:
            if fam.lower is None:
                continue
            o = fam.state_offset
            nv = fam.num_var
            lo[o : o + nv * fam.asize] = fam.lower.reshape(-1)
            hi[o : o + nv * fam.asize] = fam.upper.reshape(-1)
        return lo, hi

    def tangent_box(self):
        """(tmap, lower, upper) over the TANGENT vector for the coordinates
        where bounds act 1:1 (Euclidean families): tmap[i] is the state
        index of tangent coordinate i, or -1 where no box applies (manifold
        blocks — their ambient bounds are enforced by the projection in
        _plus_impl only). Used for the active-set step restriction."""
        from .manifolds import EuclideanManifold

        tmap = np.full(self.tangent_size, -1, np.int64)
        lo = np.full(self.tangent_size, -np.inf)
        hi = np.full(self.tangent_size, np.inf)
        for fam in self.families:
            if fam.lower is None:
                continue
            if fam.manifold is not None and not isinstance(
                fam.manifold, EuclideanManifold
            ):
                continue
            if fam.asize != fam.tsize:
                continue
            n = fam.num_var * fam.tsize
            t0 = fam.tangent_offset
            tmap[t0: t0 + n] = fam.state_offset + np.arange(n)
            lo[t0: t0 + n] = fam.lower[: fam.num_var].reshape(-1)
            hi[t0: t0 + n] = fam.upper[: fam.num_var].reshape(-1)
        return tmap, lo, hi
