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
