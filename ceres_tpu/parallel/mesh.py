"""Generic mesh-sharded evaluation for ANY compiled problem.

The device-mesh tier of SURVEY.md §5.8 for arbitrary Problems (the
BA-specialized pipeline lives in parallel/sharded_ba.py): the compiled
program's per-observation arrays (gather indices, stacked data, validity
weights) become jit arguments laid out over an 'obs' mesh axis with the
state vector replicated. GSPMD then partitions every vmapped kind
evaluation across devices and inserts the psum (over ICI) for the cost
reduction and the gradient scatter-add — the role the reference's
per-thread gradient replicas + reduction play on CPU
(program_evaluator.h:252-284), with deterministic fixed-order reductions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


class ShardedProgramEvaluator:
    """Sharded cost/gradient evaluation of a CompiledProgram over a Mesh."""

    def __init__(self, program, mesh: Mesh, axis: str = "obs"):
        self.program = program
        self.mesh = mesh
        n = mesh.devices.size
        args = program.make_args(pad_to=n)

        def shard_leaf(leaf):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        self.args = jax.tree_util.tree_map(shard_leaf, args)
        repl = NamedSharding(mesh, P())
        prog = program

        def grad_fn(x, args):
            o = prog._eval_core(x, True, False, args=args)
            return o["cost"], o["gradient"]

        def cost_fn(x, args):
            return prog._eval_core(x, False, False, args=args)["cost"]

        arg_shardings = jax.tree_util.tree_map(
            lambda leaf: leaf.sharding, self.args
        )
        self._grad = jax.jit(
            grad_fn,
            in_shardings=(repl, arg_shardings),
            out_shardings=(repl, repl),
        )
        self._cost = jax.jit(
            cost_fn, in_shardings=(repl, arg_shardings), out_shardings=repl
        )
        self._plus = jax.jit(
            prog._plus_impl, in_shardings=(repl, repl), out_shardings=repl
        )

    def evaluate_grad(self, x):
        return self._grad(x, self.args)

    def evaluate_cost(self, x):
        return self._cost(x, self.args)

    def plus(self, x, delta):
        return self._plus(x, delta)


def sharded_gradient_descent_step(evaluator: ShardedProgramEvaluator, x, lr):
    """Minimal full training step over the mesh (used by the multichip
    dry run): evaluate sharded cost+gradient, apply a step via Plus."""
    cost, g = evaluator.evaluate_grad(x)
    x_new = evaluator.plus(x, -lr * g)
    return x_new, cost


class ShardedBlockKernels:
    """Trust-region kernels with BOTH evaluation and the CGNR linear solve
    sharded over the mesh — the full multi-chip LM for any compiled
    problem. Same interface as solvers.bsr_kernels.BlockTrustRegionKernels;
    preconditioner is scalar Jacobi diag(J'J + D^2)^{-1} (elementwise, so
    it shards trivially; block-Jacobi lands with the sharded batched
    Cholesky next round)."""

    def __init__(self, program, options, mesh: Mesh, axis: str = "obs"):
        from ..ops import bsr
        from ..solvers.linear.cg import conjugate_gradients

        self.program = program
        self.options = options
        n = mesh.devices.size
        args = program.make_args(pad_to=n)

        def shard_leaf(leaf):
            spec = P(axis, *([None] * (leaf.ndim - 1)))
            return jax.device_put(leaf, NamedSharding(mesh, spec))

        self.args = jax.tree_util.tree_map(shard_leaf, args)
        arg_sh = jax.tree_util.tree_map(lambda l: l.sharding, self.args)
        repl = NamedSharding(mesh, P())
        prog = program
        kind_shapes = [
            (a["w"].shape[0], prog.kinds[k].r) for k, a in enumerate(args)
        ]
        T = prog.tangent_size
        eta = options.eta
        max_li = options.max_linear_solver_iterations
        min_li = options.min_linear_solver_iterations
        min_d, max_d = options.min_lm_diagonal, options.max_lm_diagonal

        def _eval_full(x, args):
            o = prog._eval_core(x, True, False, args=args)
            cost, residuals, gradient = o["cost"], o["residuals"], o["gradient"]
            values = o["block_jacs"]
            pg = prog._plus_impl(x, -gradient)
            dx = x - pg
            gmax = jnp.max(jnp.abs(dx)) if dx.shape[0] else jnp.asarray(0.0)
            return cost, residuals, gradient, values, jnp.linalg.norm(dx), gmax

        # values shardings: per kind/slot (B', r, t) sharded on axis 0.
        def val_sharding(k):
            return [
                NamedSharding(mesh, P(axis, None, None))
                for _ in prog.kinds[k].slots
            ]

        values_sh = [val_sharding(k) for k in range(len(prog.kinds))]
        res_sh = NamedSharding(mesh, P())  # residual vector kept replicated

        self._eval_full = jax.jit(
            _eval_full,
            in_shardings=(repl, arg_sh),
            out_shardings=(repl, res_sh, repl, values_sh, repl, repl),
        )

        def _jacobi_scale(values, args):
            return 1.0 / (
                1.0 + jnp.sqrt(bsr.squared_column_norm_args(kind_shapes, args, values, T))
            )

        self._jacobi_scale = jax.jit(
            _jacobi_scale, in_shardings=(values_sh, arg_sh), out_shardings=repl
        )

        def _lm_diagonal(values, scale, args):
            vs = bsr.scale_columns_args(args, values, scale)
            return jnp.clip(
                bsr.squared_column_norm_args(kind_shapes, args, vs, T), min_d, max_d
            )

        self._lm_diagonal = jax.jit(
            _lm_diagonal,
            in_shardings=(values_sh, repl, arg_sh),
            out_shardings=repl,
        )

        def _compute_step(values, residuals, scale, diagonal, radius, args):
            vs = bsr.scale_columns_args(args, values, scale)
            D = jnp.sqrt(diagonal / radius)

            def lhs(x):
                jx = bsr.right_multiply_args(kind_shapes, args, vs, x)
                return (
                    bsr.left_multiply_args(kind_shapes, args, vs, jx, T)
                    + (D * D) * x
                )

            rhs = bsr.left_multiply_args(kind_shapes, args, vs, residuals, T)
            minv = 1.0 / (diagonal + D * D)
            res = conjugate_gradients(
                lhs,
                rhs,
                jnp.zeros_like(rhs),
                lambda v: minv * v,
                min_num_iterations=min_li,
                max_num_iterations=max_li,
                residual_reset_period=10,
                r_tolerance=-1.0,
                q_tolerance=eta,
            )
            step = -res.x
            model_residuals = bsr.right_multiply_args(kind_shapes, args, vs, step)
            mcc = -jnp.dot(model_residuals, residuals + model_residuals / 2.0)
            return step, step * scale, mcc, res.num_iterations

        self._compute_step = jax.jit(
            _compute_step,
            in_shardings=(values_sh, res_sh, repl, repl, repl, arg_sh),
            out_shardings=(repl, repl, repl, repl),
        )

        def _candidate(x, delta, args):
            cx = prog._plus_impl(x, delta)
            o = prog._eval_core(cx, False, False, args=args)
            return cx, o["cost"], jnp.linalg.norm(x - cx)

        self._candidate = jax.jit(
            _candidate,
            in_shardings=(repl, repl, arg_sh),
            out_shardings=(repl, repl, repl),
        )

        def _cost_at(x, delta, args):
            cx = prog._plus_impl(x, delta)
            return prog._eval_core(cx, False, False, args=args)["cost"]

        self._cost_at = jax.jit(
            _cost_at, in_shardings=(repl, repl, arg_sh), out_shardings=repl
        )

    # kernel interface ------------------------------------------------------

    def eval_full(self, x):
        return self._eval_full(x, self.args)

    def jacobi_scale(self, values):
        return self._jacobi_scale(values, self.args)

    def lm_diagonal(self, values, scale):
        return self._lm_diagonal(values, scale, self.args)

    def compute_step(self, values, residuals, scale, diagonal, radius):
        return self._compute_step(values, residuals, scale, diagonal, radius, self.args)

    def candidate(self, x, delta):
        return self._candidate(x, delta, self.args)

    def cost_at(self, x, delta):
        return self._cost_at(x, delta, self.args)


def solve_sharded(options, problem, mesh: "Mesh | None" = None, summary=None):
    """ceres_tpu.solve with the WHOLE trust-region inner math sharded over
    a device mesh: evaluation, gradients, and the CGNR Krylov loop
    (SURVEY.md §5.8 — ICI psums for every J^T-side reduction)."""
    import time as _time

    import numpy as _np

    from ..program import CompiledProgram
    from ..solvers.trust_region import TrustRegionMinimizer
    from ..summary import Summary

    if summary is None:
        summary = Summary()
    if mesh is None:
        mesh = make_mesh()
    t0 = _time.monotonic()
    program = CompiledProgram(problem)
    options._program = program
    summary.fixed_cost = program.fixed_cost
    summary.num_devices = mesh.devices.size
    kernels = ShardedBlockKernels(program, options, mesh)
    summary.preprocessor_time_in_seconds = _time.monotonic() - t0
    minimizer = TrustRegionMinimizer(program, kernels, options, summary)
    x = minimizer.minimize(program.initial_state())
    program.write_state(_np.asarray(x))
    if _np.isfinite(minimizer.x_cost):
        summary.final_cost = minimizer.x_cost
    summary.total_time_in_seconds = _time.monotonic() - t0
    return summary
