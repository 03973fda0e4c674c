"""Block-sparse trust-region kernels: the scalable LM path.

Provides the same five fused entry points as DenseTrustRegionKernels but
over the block Jacobian (ops/bsr.py) with an iterative CGNR step — the
reference's evaluator + CgnrSolver combination
(/root/reference/internal/ceres/cgnr_solver.cc,
program_evaluator.h:118-397) with zero per-iteration host round-trips
inside the linear solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import bsr
from ..options import Options
from .linear.cgnr import cgnr_solve


def _build_cluster(pm, options: Options, tridiagonal: bool):
    """Visibility clustering of the f-blocks (cameras) + the batched block
    assembler (visibility_based_preconditioner.cc:127-322)."""
    import numpy as np

    from ..utils import clustering
    from .linear.preconditioners import ClusterBlockAssembler, ClusterStructure

    meta = pm.base
    pts, cams = [], []
    num_f = sum(nv for (_, nv, _, _) in pm.f_fams)
    num_e = sum(nv for (_, nv, _, _) in pm.e_fams)
    for k, kind in enumerate(meta.kinds):
        e_slot = None
        for s, slot in enumerate(kind.slots):
            if pm.e_bid_keys[k][s] >= 0 and slot.any_variable:
                e_slot = s
        if e_slot is None:
            continue
        eb = meta.arrays[pm.e_bid_keys[k][e_slot]]
        for s, slot in enumerate(kind.slots):
            if pm.f_bid_keys[k][s] < 0 or not slot.any_variable:
                continue
            fb = meta.arrays[pm.f_bid_keys[k][s]]
            ok = (eb < num_e) & (fb < num_f)
            pts.append(eb[ok])
            cams.append(fb[ok])
    point_ids = np.concatenate(pts) if pts else np.zeros(0, np.int32)
    camera_ids = np.concatenate(cams) if cams else np.zeros(0, np.int32)
    edges = clustering.compute_visibility_graph(point_ids, camera_ids, num_f)
    if options.visibility_clustering_type.name == "SINGLE_LINKAGE":
        membership = clustering.single_linkage_clustering(num_f, edges)
    else:
        membership = clustering.canonical_views_clustering(num_f, edges)
    forest = None
    if tridiagonal:
        forest = clustering.maximum_spanning_forest_degree2(num_f, edges, membership)
    cs = ClusterStructure(pm, membership, forest)
    assembler = ClusterBlockAssembler(pm, cs)
    return cs, assembler


class BlockTrustRegionKernels:
    """Same interface as DenseTrustRegionKernels; `jacobian` is the values
    pytree (list per kind of list per slot of (B, r, t)).

    step_solver: "CGNR" | "DENSE_SCHUR" | "ITERATIVE_SCHUR" — the latter two
    need e_families (the Schur partition, utils/ordering.py)."""

    def __init__(self, program, options: Options, step_solver: str = "CGNR",
                 e_families=None):
        self.program = program
        self.options = options
        meta = bsr.build_meta(program)
        self.meta = meta
        prog = program
        pm = None
        if step_solver in ("DENSE_SCHUR", "ITERATIVE_SCHUR", "SPARSE_SCHUR"):
            from ..ops import partition as pt_mod

            pm = pt_mod.build_partition(meta, e_families)
            self.pm = pm

        @jax.jit
        def eval_full(x):
            o = prog._eval_core(x, True, False)
            cost, residuals, gradient = o["cost"], o["residuals"], o["gradient"]
            values = o["block_jacs"]
            pg = prog._plus_impl(x, -gradient)
            dx = x - pg
            gmax = jnp.max(jnp.abs(dx)) if dx.shape[0] else jnp.asarray(0.0)
            return cost, residuals, gradient, values, jnp.linalg.norm(dx), gmax

        @jax.jit
        def jacobi_scale(values):
            return 1.0 / (1.0 + jnp.sqrt(bsr.squared_column_norm(meta, values)))

        min_d, max_d = options.min_lm_diagonal, options.max_lm_diagonal

        @jax.jit
        def lm_diagonal(values, scale):
            vs = bsr.scale_columns(meta, values, scale)
            return jnp.clip(bsr.squared_column_norm(meta, vs), min_d, max_d)

        eta = options.eta
        max_li = options.max_linear_solver_iterations
        min_li = options.min_linear_solver_iterations
        precond = (
            "JACOBI"
            if options.preconditioner_type.name in ("JACOBI", "SCHUR_JACOBI")
            else "IDENTITY"
        )

        if step_solver == "DENSE_SCHUR":
            from .linear.dense_schur import dense_schur_solve

            @jax.jit
            def compute_step(values, residuals, scale, diagonal, radius):
                vs = bsr.scale_columns(meta, values, scale)
                D = jnp.sqrt(diagonal / radius)
                y = dense_schur_solve(pm, vs, residuals, D)
                step = -y
                model_residuals = bsr.right_multiply(meta, vs, step)
                model_cost_change = -jnp.dot(
                    model_residuals, residuals + model_residuals / 2.0
                )
                return step, step * scale, model_cost_change, jnp.asarray(1, jnp.int32)

        elif step_solver == "ITERATIVE_SCHUR" and options.use_explicit_schur_complement:
            # CG on the explicitly assembled block-sparse S
            # (schur_complement_solver.cc:338) — profitable when CG needs
            # many iterations: one assembly vs 4 implicit products/iter.
            from .linear.cg import conjugate_gradients
            from .linear.implicit_schur import (
                back_substitute,
                build_schur_system,
                make_schur_jacobi_preconditioner,
            )
            from .linear.sparse_schur import SparseSchurSolver
            from ..ops import partition as pt_mod

            sss = SparseSchurSolver(pm)
            matvec = sss.csr_matvec_fn()
            self.sparse_schur = sss

            @jax.jit
            def compute_step(values, residuals, scale, diagonal, radius):
                vs = bsr.scale_columns(meta, values, scale)
                D = jnp.sqrt(diagonal / radius)
                D_e = pt_mod.extract_e(pm, D)
                D_f = pt_mod.extract_f(pm, D)
                svals = sss._numeric_impl(vs, D_e, D_f)
                sys = build_schur_system(pm, vs, residuals, D_e)
                precond = make_schur_jacobi_preconditioner(pm, vs, sys, D_f)
                res = conjugate_gradients(
                    lambda z: matvec(svals, z),
                    sys.rhs,
                    jnp.zeros_like(sys.rhs),
                    precond,
                    max_num_iterations=max_li,
                    min_num_iterations=min_li,
                    q_tolerance=eta,
                    r_tolerance=-1.0,
                )
                y_e = back_substitute(pm, vs, sys, res.x)
                step = -pt_mod.combine(pm, y_e, res.x)
                model_residuals = bsr.right_multiply(meta, vs, step)
                mcc = -jnp.dot(model_residuals, residuals + model_residuals / 2.0)
                return step, step * scale, mcc, res.num_iterations

        elif step_solver == "ITERATIVE_SCHUR":
            from .linear.implicit_schur import iterative_schur_solve

            pname = options.preconditioner_type.name
            if pname == "JACOBI":
                pname = "SCHUR_JACOBI"  # ISC's JACOBI acts as block-diag(S)
            cluster_structure = None
            cluster_assembler = None
            if pname in ("CLUSTER_JACOBI", "CLUSTER_TRIDIAGONAL"):
                cluster_structure, cluster_assembler = _build_cluster(
                    pm, options, tridiagonal=(pname == "CLUSTER_TRIDIAGONAL")
                )
            from ..ops.flatops import FlatSchurOps

            flat_ops = FlatSchurOps(pm)

            @jax.jit
            def compute_step(values, residuals, scale, diagonal, radius):
                vs = bsr.scale_columns(meta, values, scale)
                D = jnp.sqrt(diagonal / radius)
                y, res = iterative_schur_solve(
                    pm,
                    vs,
                    residuals,
                    D,
                    q_tolerance=eta,
                    max_num_iterations=max_li,
                    min_num_iterations=min_li,
                    preconditioner=pname,
                    spse_terms=options.max_num_spse_iterations,
                    cluster_assembler=cluster_assembler,
                    cluster_structure=cluster_structure,
                    use_spse_initialization=options.use_spse_initialization,
                    spse_init_terms=options.max_num_spse_iterations,
                    flat_ops=flat_ops,
                )
                step = -y
                model_residuals = bsr.right_multiply(meta, vs, step)
                model_cost_change = -jnp.dot(
                    model_residuals, residuals + model_residuals / 2.0
                )
                return step, step * scale, model_cost_change, res.num_iterations

        elif step_solver == "SPARSE_SCHUR":
            from .linear.sparse_schur import SparseSchurSolver

            sss = SparseSchurSolver(pm)
            self.sparse_schur = sss
            scale_fn = jax.jit(lambda values, scale: bsr.scale_columns(meta, values, scale))

            @jax.jit
            def _mcc2(vs, step, residuals):
                model_residuals = bsr.right_multiply(meta, vs, step)
                return -jnp.dot(model_residuals, residuals + model_residuals / 2.0)

            def compute_step(values, residuals, scale, diagonal, radius):
                vs = scale_fn(values, scale)
                D = jnp.sqrt(diagonal / radius)
                y, term = sss.solve(vs, residuals, D)
                if y is None:
                    nan = jnp.full((meta.tangent_size,), jnp.nan)
                    return nan, nan, jnp.asarray(jnp.nan), jnp.asarray(1, jnp.int32)
                step = -y
                mcc = _mcc2(vs, step, residuals)
                return step, step * scale, mcc, jnp.asarray(1, jnp.int32)

        elif step_solver == "SPARSE_NORMAL_CHOLESKY":
            from .linear.sparse_normal import SparseNormalCholeskySolver

            snc = SparseNormalCholeskySolver(
                meta,
                use_mixed_precision=options.use_mixed_precision_solves,
                max_num_refinement_iterations=options.max_num_refinement_iterations,
                dynamic=options.dynamic_sparsity,
            )
            self.sparse_solver = snc
            scale_fn = jax.jit(lambda values, scale: bsr.scale_columns(meta, values, scale))

            @jax.jit
            def _mcc(vs, step, residuals):
                model_residuals = bsr.right_multiply(meta, vs, step)
                return -jnp.dot(model_residuals, residuals + model_residuals / 2.0)

            def compute_step(values, residuals, scale, diagonal, radius):
                vs = scale_fn(values, scale)
                D = jnp.sqrt(diagonal / radius)
                y, term = snc.solve(vs, residuals, D)
                if y is None:
                    nan = jnp.full((meta.tangent_size,), jnp.nan)
                    return nan, nan, jnp.asarray(jnp.nan), jnp.asarray(1, jnp.int32)
                step = -y
                mcc = _mcc(vs, step, residuals)
                return step, step * scale, mcc, jnp.asarray(1, jnp.int32)

        elif (
            step_solver == "CGNR"
            and options.preconditioner_type.name == "SUBSET"
            and options.residual_blocks_for_subset_preconditioner
        ):
            # SUBSET preconditioner (subset_preconditioner.h:70): host CG
            # with device SpMV and native-Cholesky preconditioner applies.
            from .linear.cg import conjugate_gradients_host
            from .linear.preconditioners import SubsetPreconditioner

            subset_ids = set(options.residual_blocks_for_subset_preconditioner)
            masks = []
            for kind in prog.kinds:
                masks.append(
                    jnp.asarray(
                        [1.0 if rb.rb_id in subset_ids else 0.0 for rb in kind.rbs]
                    )
                )
            subset = SubsetPreconditioner(meta, [True] * len(meta.kinds))
            self.subset_preconditioner = subset
            scale_fn = jax.jit(lambda values, scale: bsr.scale_columns(meta, values, scale))

            @jax.jit
            def _masked(vs):
                return [
                    [V * masks[k][:, None, None] for V in slots]
                    for k, slots in enumerate(vs)
                ]

            @jax.jit
            def _rhs(vs, residuals):
                return bsr.left_multiply(meta, vs, residuals)

            @jax.jit
            def _mcc3(vs, step, residuals):
                mr = bsr.right_multiply(meta, vs, step)
                return -jnp.dot(mr, residuals + mr / 2.0)

            def compute_step(values, residuals, scale, diagonal, radius):
                vs = scale_fn(values, scale)
                D = jnp.sqrt(diagonal / radius)
                subset.update(_masked(vs), D)

                @jax.jit
                def lhs(x):
                    jx = bsr.right_multiply(meta, vs, x)
                    return bsr.left_multiply(meta, vs, jx) + (D * D) * x

                rhs = _rhs(vs, residuals)
                res = conjugate_gradients_host(
                    lhs,
                    rhs,
                    jnp.zeros_like(rhs),
                    subset.apply,
                    max_num_iterations=max_li,
                    min_num_iterations=min_li,
                    q_tolerance=eta,
                    r_tolerance=-1.0,
                )
                step = -res.x
                mcc = _mcc3(vs, step, residuals)
                return step, step * scale, mcc, res.num_iterations

        else:
            from ..ops.flatops import FlatJacobianOps

            flat_jops = FlatJacobianOps(meta)

            @jax.jit
            def compute_step(values, residuals, scale, diagonal, radius):
                vs = bsr.scale_columns(meta, values, scale)
                D = jnp.sqrt(diagonal / radius)
                res = cgnr_solve(
                    meta,
                    vs,
                    residuals,
                    D,
                    q_tolerance=eta,
                    r_tolerance=-1.0,
                    max_num_iterations=max_li,
                    min_num_iterations=min_li,
                    preconditioner=precond,
                    flat_ops=flat_jops,
                )
                step = -res.x
                model_residuals = bsr.right_multiply(meta, vs, step)
                model_cost_change = -jnp.dot(
                    model_residuals, residuals + model_residuals / 2.0
                )
                delta = step * scale
                return step, delta, model_cost_change, res.num_iterations

        @jax.jit
        def candidate(x, delta):
            cx = prog._plus_impl(x, delta)
            o = prog._eval_core(cx, False, False)
            return cx, o["cost"], jnp.linalg.norm(x - cx)

        @jax.jit
        def cost_at(x, delta):
            cx = prog._plus_impl(x, delta)
            return prog._eval_core(cx, False, False)["cost"]

        self.eval_full = eval_full
        self.jacobi_scale = jacobi_scale
        self.lm_diagonal = lm_diagonal
        self.compute_step = compute_step
        self.candidate = candidate
        self.cost_at = cost_at
