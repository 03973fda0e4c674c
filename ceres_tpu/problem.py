"""Problem: the user-facing modeling graph.

TPU-native re-design of the reference's Problem/ProblemImpl
(/root/reference/include/ceres/problem.h:120-553,
/root/reference/internal/ceres/problem_impl.cc — InternalAddParameterBlock
:123, AddResidualBlock :268, RemoveParameterBlock :436). The dynamic
pointer-graph is kept host-side only; `ceres_tpu.program.CompiledProgram`
lowers it to static batched arrays ("symbolic once, numeric many") whenever
the structure version changes.

Parameter blocks are identified by the user-owned numpy array object (the
analog of the double* key in the reference's pointer->block hash map); the
solver writes results back into those arrays, matching reference semantics.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .cost_function import CostFunction
from .loss import LossFunction
from .manifolds import EuclideanManifold, Manifold


class ParameterBlock:
    """Host-side record (parameter_block.h:391 analog)."""

    __slots__ = (
        "values",
        "size",
        "manifold",
        "constant",
        "lower_bounds",
        "upper_bounds",
        "index",
        "residual_blocks",
        "_owner",
    )

    def __init__(self, values: np.ndarray, manifold: Optional[Manifold] = None):
        if values.ndim != 1:
            raise ValueError("parameter block must be a 1-D array")
        self.values = values
        self.size = int(values.shape[0])
        self.manifold = manifold
        self.constant = False
        self.lower_bounds = None  # lazily allocated
        self.upper_bounds = None
        self.index = -1
        self.residual_blocks: set = set()  # enable_fast_removal is free here
        self._owner = None  # owning Problem; bound mutations bump its version

    @property
    def tangent_size(self) -> int:
        if self.constant:
            return 0
        return self.manifold.tangent_size if self.manifold else self.size

    def effective_manifold(self) -> Manifold:
        return self.manifold if self.manifold is not None else EuclideanManifold(self.size)

    def set_lower_bound(self, coord: int, value: float):
        if self.lower_bounds is None:
            self.lower_bounds = np.full(self.size, -np.inf)
        self.lower_bounds[coord] = value
        if self._owner is not None:
            self._owner._bump()

    def set_upper_bound(self, coord: int, value: float):
        if self.upper_bounds is None:
            self.upper_bounds = np.full(self.size, np.inf)
        self.upper_bounds[coord] = value
        if self._owner is not None:
            self._owner._bump()

    def has_bounds(self) -> bool:
        return self.lower_bounds is not None or self.upper_bounds is not None


@dataclasses.dataclass
class ResidualBlock:
    """Host-side record (residual_block.h analog)."""

    cost: CostFunction
    loss: Optional[LossFunction]
    blocks: Tuple[ParameterBlock, ...]
    data: object  # per-block pytree of arrays (observations), or None
    rb_id: int

    def num_residuals(self) -> int:
        return self.cost.num_residuals


class ParameterBlockArray:
    """B same-sized parameter blocks stored as one (B, size) array — the
    scale-native block container (no per-block Python objects). The whole
    array shares one manifold and becomes one evaluation family."""

    __slots__ = ("values", "B", "size", "manifold", "constant", "lower_bounds",
                 "upper_bounds")

    def __init__(self, values: np.ndarray, manifold: Optional[Manifold] = None):
        if values.ndim != 2:
            raise ValueError("parameter block array must be 2-D (B, size)")
        if values.dtype != np.float64:
            raise TypeError("parameter blocks must be float64")
        if manifold is not None and manifold.ambient_size != values.shape[1]:
            raise ValueError("manifold ambient size mismatch")
        self.values = values
        self.B = int(values.shape[0])
        self.size = int(values.shape[1])
        self.manifold = manifold
        self.constant = False
        self.lower_bounds = None  # (B, size) or None
        self.upper_bounds = None


@dataclasses.dataclass
class BatchedResidualBlocks:
    """B residual blocks of one kind added in one call: slot i references
    rows `indices[i]` of a ParameterBlockArray."""

    cost: CostFunction
    loss: Optional[LossFunction]
    slots: Tuple  # tuple of (ParameterBlockArray, np.ndarray indices (B,))
    data: object  # stacked pytree with leading dim B, or None
    rb_id: int
    B: int


class Problem:
    """Nonlinear least squares problem (problem.h:120 analog).

    add_residual_block accepts single blocks (Ceres style); the TPU-scale
    fast path is add_parameter_block_array + add_residual_block_batch,
    which add thousands of same-kind blocks with zero per-block Python.
    """

    def __init__(self):
        self._ptr_to_block: Dict[int, ParameterBlock] = {}
        self._blocks: List[ParameterBlock] = []
        self._block_arrays: List[ParameterBlockArray] = []
        self._residual_blocks: Dict[int, ResidualBlock] = {}
        self._batched_residuals: Dict[int, BatchedResidualBlocks] = {}
        self._next_rb_id = 0
        self.structure_version = 0  # bump on any structural mutation

    # -- batched fast path --------------------------------------------------

    def add_parameter_block_array(
        self, values: np.ndarray, manifold: Optional[Manifold] = None
    ) -> ParameterBlockArray:
        arr = ParameterBlockArray(np.asanyarray(values), manifold)
        self._block_arrays.append(arr)
        self._bump()
        return arr

    def set_parameter_block_array_constant(self, arr: ParameterBlockArray):
        arr.constant = True
        self._bump()

    def set_parameter_block_array_bounds(
        self, arr: ParameterBlockArray, lower=None, upper=None
    ):
        """Box bounds for every block in a batched array (the scale-path
        analog of SetParameterLowerBound/SetParameterUpperBound,
        problem.h:333-341). `lower`/`upper` broadcast to (B, size)."""
        shape = (arr.B, arr.size)
        if lower is not None:
            arr.lower_bounds = np.broadcast_to(
                np.asarray(lower, np.float64), shape
            ).copy()
            if arr.upper_bounds is None:
                arr.upper_bounds = np.full(shape, np.inf)
        if upper is not None:
            arr.upper_bounds = np.broadcast_to(
                np.asarray(upper, np.float64), shape
            ).copy()
            if arr.lower_bounds is None:
                arr.lower_bounds = np.full(shape, -np.inf)
        self._bump()

    def set_parameter_block_array_bounds(self, arr: ParameterBlockArray,
                                         lower=None, upper=None):
        if lower is not None:
            arr.lower_bounds = np.broadcast_to(lower, (arr.B, arr.size)).copy()
        if upper is not None:
            arr.upper_bounds = np.broadcast_to(upper, (arr.B, arr.size)).copy()
        self._bump()

    def add_residual_block_batch(
        self,
        cost: CostFunction,
        loss: Optional[LossFunction],
        slots,
        data=None,
    ) -> int:
        """Add B same-kind residual blocks at once. `slots[i]` is
        (ParameterBlockArray, indices (B,)); `data` leaves must have
        leading dim B."""
        sizes = cost.parameter_block_sizes
        if len(slots) != len(sizes):
            raise ValueError("slot count != cost function parameter blocks")
        norm_slots = []
        B = None
        for (arr, idx), expected in zip(slots, sizes):
            if not isinstance(arr, ParameterBlockArray):
                raise TypeError("batched slots must reference ParameterBlockArray")
            if arr.size != expected:
                raise ValueError(
                    f"array block size {arr.size} != cost function size {expected}"
                )
            idx = np.ascontiguousarray(idx, dtype=np.int64)
            if B is None:
                B = idx.shape[0]
            elif idx.shape[0] != B:
                raise ValueError("slot index arrays disagree on batch size")
            if idx.size and (idx.min() < 0 or idx.max() >= arr.B):
                raise ValueError("slot indices out of range")
            norm_slots.append((arr, idx))
        if data is not None:
            import jax

            for leaf in jax.tree_util.tree_leaves(data):
                if np.shape(leaf)[0] != B:
                    raise ValueError("data leading dimension != batch size")
        rec = BatchedResidualBlocks(
            cost=cost, loss=loss, slots=tuple(norm_slots), data=data,
            rb_id=self._next_rb_id, B=B,
        )
        self._next_rb_id += 1
        self._batched_residuals[rec.rb_id] = rec
        self._bump()
        return rec.rb_id

    def remove_residual_block_batch(self, rb_id: int):
        del self._batched_residuals[rb_id]
        self._bump()

    def batched_residual_blocks(self) -> List[BatchedResidualBlocks]:
        return list(self._batched_residuals.values())

    def parameter_block_arrays(self) -> List[ParameterBlockArray]:
        return list(self._block_arrays)

    # -- parameter blocks ---------------------------------------------------

    def _bump(self):
        self.structure_version += 1

    def add_parameter_block(
        self,
        values: np.ndarray,
        size: Optional[int] = None,
        manifold: Optional[Manifold] = None,
    ) -> ParameterBlock:
        """problem.h:258. `values` is the user-owned state; results are
        written back into it after the solve."""
        values = np.asanyarray(values)
        if values.dtype != np.float64:
            raise TypeError("parameter blocks must be float64 numpy arrays")
        key = id(values)
        existing = self._ptr_to_block.get(key)
        if existing is not None:
            if size is not None and existing.size != size:
                raise ValueError("duplicate parameter block with different size")
            if manifold is not None:
                self.set_manifold(values, manifold)
            return existing
        if size is not None and size != values.shape[0]:
            raise ValueError(f"size {size} != array length {values.shape[0]}")
        if manifold is not None and manifold.ambient_size != values.shape[0]:
            raise ValueError("manifold ambient size mismatch")
        blk = ParameterBlock(values, manifold)
        blk._owner = self
        self._ptr_to_block[key] = blk
        self._blocks.append(blk)
        self._bump()
        return blk

    def _resolve(self, values) -> ParameterBlock:
        if isinstance(values, ParameterBlock):
            return values
        blk = self._ptr_to_block.get(id(values))
        if blk is None:
            raise KeyError("unknown parameter block; pass the same array object")
        return blk

    def remove_parameter_block(self, values):
        """problem_impl.cc:436: also removes dependent residual blocks."""
        blk = self._resolve(values)
        for rb_id in list(blk.residual_blocks):
            self.remove_residual_block(rb_id)
        del self._ptr_to_block[id(blk.values)]
        self._blocks.remove(blk)
        self._bump()

    def set_parameter_block_constant(self, values):
        blk = self._resolve(values)
        if not blk.constant:
            blk.constant = True
            self._bump()

    def set_parameter_block_variable(self, values):
        blk = self._resolve(values)
        if blk.constant:
            blk.constant = False
            self._bump()

    def is_parameter_block_constant(self, values) -> bool:
        return self._resolve(values).constant

    def set_manifold(self, values, manifold: Optional[Manifold]):
        blk = self._resolve(values)
        if manifold is not None and manifold.ambient_size != blk.size:
            raise ValueError("manifold ambient size mismatch")
        blk.manifold = manifold
        self._bump()

    def get_manifold(self, values) -> Optional[Manifold]:
        return self._resolve(values).manifold

    def set_parameter_lower_bound(self, values, coord: int, bound: float):
        self._resolve(values).set_lower_bound(coord, bound)
        self._bump()

    def set_parameter_upper_bound(self, values, coord: int, bound: float):
        self._resolve(values).set_upper_bound(coord, bound)
        self._bump()

    def get_parameter_lower_bound(self, values, coord: int) -> float:
        blk = self._resolve(values)
        return float(blk.lower_bounds[coord]) if blk.lower_bounds is not None else -np.inf

    def get_parameter_upper_bound(self, values, coord: int) -> float:
        blk = self._resolve(values)
        return float(blk.upper_bounds[coord]) if blk.upper_bounds is not None else np.inf

    # -- residual blocks ----------------------------------------------------

    def add_residual_block(
        self,
        cost: CostFunction,
        loss: Optional[LossFunction],
        parameter_blocks: Sequence,
        data=None,
    ) -> int:
        """problem.h:230. Returns a residual block id usable with
        remove_residual_block. Parameter blocks not yet added are added
        implicitly (reference behavior)."""
        blocks = []
        sizes = cost.parameter_block_sizes
        if len(parameter_blocks) != len(sizes):
            raise ValueError(
                f"cost function expects {len(sizes)} parameter blocks, got {len(parameter_blocks)}"
            )
        for values, expected in zip(parameter_blocks, sizes):
            if isinstance(values, ParameterBlock):
                blk = values
            else:
                blk = self._ptr_to_block.get(id(values)) or self.add_parameter_block(values)
            if blk.size != expected:
                raise ValueError(f"parameter block size {blk.size} != cost function size {expected}")
            blocks.append(blk)
        if len({id(b) for b in blocks}) != len(blocks):
            raise ValueError("duplicate parameter blocks in a single residual block")
        rb = ResidualBlock(cost, loss, tuple(blocks), data, self._next_rb_id)
        self._next_rb_id += 1
        self._residual_blocks[rb.rb_id] = rb
        for b in blocks:
            b.residual_blocks.add(rb.rb_id)
        self._bump()
        return rb.rb_id

    def add_residual_blocks(
        self,
        cost: CostFunction,
        loss: Optional[LossFunction],
        parameter_blocks: Sequence[Sequence],
        data=None,
    ) -> List[int]:
        """Batched fast path: one call adds N same-kind residual blocks.
        `parameter_blocks[i]` are the blocks of the i-th residual; `data` (if
        given) must be a pytree whose leaves have leading dim N."""
        ids = []
        n = len(parameter_blocks)
        for i, pbs in enumerate(parameter_blocks):
            d = None
            if data is not None:
                d = _tree_index(data, i)
            ids.append(self.add_residual_block(cost, loss, pbs, d))
        assert len(ids) == n
        return ids

    def remove_residual_block(self, rb_id: int):
        rb = self._residual_blocks.pop(rb_id)
        for b in rb.blocks:
            b.residual_blocks.discard(rb_id)
        self._bump()

    # -- introspection ------------------------------------------------------

    def num_parameter_blocks(self) -> int:
        return len(self._blocks) + sum(a.B for a in self._block_arrays)

    def num_parameters(self) -> int:
        return sum(b.size for b in self._blocks) + sum(
            a.B * a.size for a in self._block_arrays
        )

    def num_residual_blocks(self) -> int:
        return len(self._residual_blocks) + sum(
            r.B for r in self._batched_residuals.values()
        )

    def num_residuals(self) -> int:
        return sum(rb.num_residuals() for rb in self._residual_blocks.values()) + sum(
            r.B * r.cost.num_residuals for r in self._batched_residuals.values()
        )

    def parameter_blocks(self) -> List[ParameterBlock]:
        return list(self._blocks)

    def residual_blocks(self) -> List[ResidualBlock]:
        return list(self._residual_blocks.values())

    def parameter_block_for(self, values) -> ParameterBlock:
        return self._resolve(values)

    # -- evaluation (problem.h:477) ----------------------------------------

    def evaluate(
        self,
        apply_loss_function: bool = True,
        residuals: bool = False,
        gradient: bool = False,
        jacobian: bool = False,
        jacobian_format: str = "dense",
    ):
        """Whole-problem evaluation at the current parameter values.

        Returns (cost, residuals?, gradient?, jacobian?) with None for
        outputs not requested. Gradient/jacobian are in tangent space over
        non-constant blocks, ordered by the compiled program's layout.

        `jacobian_format="crs"` returns the Jacobian as an
        `ops.bsr.CRSMatrix` built from the block-sparse evaluation without
        ever materializing the dense matrix (the reference's CRS contract,
        problem.h:477 / crs_matrix.h — usable at BA scale)."""
        from .program import CompiledProgram

        if jacobian_format not in ("dense", "crs"):
            raise ValueError(f"unknown jacobian_format {jacobian_format!r}")
        prog = CompiledProgram(self, apply_loss=apply_loss_function)
        x = prog.initial_state()
        out_cost, out_res, out_grad, out_jac = None, None, None, None
        if jacobian and jacobian_format == "crs":
            from .ops import bsr as bsr_mod

            c, r, g, bjacs = prog.evaluate_bsr(x)
            meta = bsr_mod.build_meta(prog)
            out_jac = bsr_mod.to_crs(
                meta, [[np.asarray(v) for v in kind] for kind in bjacs])
            out_cost, out_res, out_grad = float(c), np.asarray(r), np.asarray(g)
        elif gradient or jacobian:
            c, r, g, J = prog.evaluate_dense(x)
            out_cost, out_res, out_grad, out_jac = float(c), np.asarray(r), np.asarray(g), np.asarray(J)
        elif residuals:
            c, r = prog.evaluate_residuals(x)
            out_cost, out_res = float(c), np.asarray(r)
        else:
            out_cost = float(prog.evaluate_cost(x))
        result = [out_cost]
        if residuals:
            result.append(out_res)
        if gradient:
            result.append(out_grad)
        if jacobian:
            result.append(out_jac)
        return result[0] if len(result) == 1 else tuple(result)

    def evaluate_residual_block(self, rb_id: int, apply_loss_function: bool = True):
        """problem.h:514 EvaluateResidualBlock: one block, current values."""
        import jax.numpy as jnp

        from .loss import correct_residuals_and_jacobians

        rb = self._residual_blocks[rb_id]
        params = [jnp.asarray(b.values) for b in rb.blocks]
        res, jacs = rb.cost.residuals_and_jacobians(params, rb.data)
        loss = rb.loss if apply_loss_function else None
        cost_b, res_b, jacs_b = correct_residuals_and_jacobians(
            loss, res[None, :], [J[None] for J in jacs]
        )
        return (
            float(cost_b[0]),
            np.asarray(res_b[0]),
            [np.asarray(J[0]) for J in jacs_b],
        )


def _tree_index(tree, i):
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a)[i], tree)
