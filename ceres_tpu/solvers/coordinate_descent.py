"""Inner iterations: batched coordinate descent over independent sets.

TPU-native re-design of /root/reference/internal/ceres/
coordinate_descent_minimizer.cc:130 (Ruhe & Wedin Algorithm II,
solver.h:634-715). The reference partitions parameter blocks into
independent sets by graph coloring and ParallelFor's a tiny per-block
DENSE_QR trust-region solve over each set. Here an independent set is a
*family* in which no residual kind owns two slots (the same invariant as a
Schur e-partition) — for BA that yields exactly {points}, {cameras} — and
the per-block solves become ONE vmapped batched LM update per family:
block-diagonal J'J assembly, batched Cholesky, per-block accept/reject.
All blocks of a set move simultaneously; sets are visited sequentially.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..options import Options
from ..ops import bsr


class CoordinateDescentMinimizer:
    def __init__(self, program, options: Options, num_lm_steps: int = 3):
        self.program = program
        self.options = options
        self.num_lm_steps = num_lm_steps
        self.meta = bsr.build_meta(program)
        # Independent sets. A family no residual kind touches twice is one
        # set (the BA case: {points}, {cameras}). A family with intra-kind
        # coupling (pose graphs: one pose family, binary residuals) is
        # DECOMPOSED at block granularity by graph coloring — each color
        # class is an independent set, the reference's CreateOrdering
        # semantics (coordinate_descent_minimizer.h:84) at batched shape:
        # the per-color update is the same vmapped family step with the
        # non-color blocks' deltas masked to zero.
        from ..utils.ordering import color_family_blocks

        self.sets: List[tuple] = []  # (family_index, color_mask | None)
        for fi, fam in enumerate(program.families):
            if fam.num_var == 0:
                continue
            ok = True
            for kind in program.kinds:
                if sum(1 for s in kind.slots if s.family is fam) > 1:
                    ok = False
                    break
            if ok:
                self.sets.append((fi, None))
            else:
                colors, nc = color_family_blocks(program, fi)
                for c in range(nc):
                    self.sets.append((fi, np.asarray(colors == c)))
        # Visit larger sets first (points before cameras), mirroring the
        # reference's ordering of independent sets by size.
        def _set_size(entry):
            fi, mask = entry
            fam = program.families[fi]
            n = fam.num_var if mask is None else int(mask.sum())
            return n * fam.tsize

        self.sets.sort(key=_set_size, reverse=True)
        self._step_fns = {}

    def _family_step(self, fi: int):
        """Batched: one LM-regularized Gauss-Newton update of every block in
        family fi with per-block accept/reject."""
        fn = self._step_fns.get(fi)
        if fn is not None:
            return fn
        prog = self.program
        meta = self.meta
        fam = prog.families[fi]
        nv, t = fam.num_var, fam.tsize

        fam_meta_index = fi  # meta.families parallels prog.families
        f_meta = meta.families[fam_meta_index]

        def per_block_quantities(x):
            """grad (nv, t), JtJ blocks (nv, t, t), cost per block (nv,)."""
            o = prog._eval_core(x, True, False)
            values = o["block_jacs"]
            g = jnp.zeros((nv + 1, t))
            A = jnp.zeros((nv + 1, t, t))
            c = jnp.zeros((nv + 1,))
            for k, kind in enumerate(prog.kinds):
                res_rows = o["residuals"][
                    kind.row_offset : kind.row_offset + kind.B * kind.r
                ].reshape(kind.B, kind.r)
                cost_b = 0.5 * jnp.sum(res_rows * res_rows, axis=1)
                for s, slot in enumerate(kind.slots):
                    if slot.family is not fam or not slot.any_variable:
                        continue
                    V = values[k][s]
                    pos = jnp.asarray(slot.pos_in_family)
                    tgt = jnp.where(pos < nv, pos, nv)
                    g = g.at[tgt].add(jnp.einsum("brt,br->bt", V, res_rows))
                    A = A.at[tgt].add(jnp.einsum("brc,brd->bcd", V, V))
                    c = c.at[tgt].add(cost_b)
            return o["cost"], g[:nv], A[:nv], c[:nv]

        def apply_delta(x, delta_blocks):
            """Scatter per-block tangent deltas into a full tangent vector
            and Plus."""
            full = jnp.zeros((prog.tangent_size,))
            full = jax.lax.dynamic_update_slice(
                full, delta_blocks.reshape(-1), (fam.tangent_offset,)
            )
            return prog._plus_impl(x, full)

        num_steps = self.num_lm_steps

        @jax.jit
        def step(x, mask):
            def body(_, carry):
                x, radius = carry
                total, g, A, c = per_block_quantities(x)
                diag = jnp.clip(jax.vmap(jnp.diag)(A), 1e-6, 1e32)
                Areg = A + jax.vmap(jnp.diag)(diag) / radius[:, None, None]
                L = jnp.linalg.cholesky(Areg)
                delta = -jax.vmap(
                    lambda Li, b: jax.scipy.linalg.cho_solve((Li, True), b)
                )(L, g)
                ok = mask & jnp.all(jnp.isfinite(delta), axis=1)
                delta = jnp.where(ok[:, None], delta, 0.0)
                x_new = apply_delta(x, delta)
                _, _, _, c_new = per_block_quantities(x_new)
                accept = ok & (c_new < c)
                delta = jnp.where(accept[:, None], delta, 0.0)
                x_final = apply_delta(x, delta)
                # radius evolves only for blocks this set owns
                radius = jnp.where(
                    mask, jnp.where(accept, radius * 2.0, radius * 0.25),
                    radius)
                return (x_final, radius)

            radius0 = jnp.full((nv,), 1e4)
            x_out, _ = jax.lax.fori_loop(0, num_steps, body, (x, radius0))
            return x_out

        self._step_fns[fi] = step
        return step

    def minimize(self, x):
        for fi, mask in self.sets:
            nv = self.program.families[fi].num_var
            m = (jnp.ones((nv,), bool) if mask is None
                 else jnp.asarray(mask))
            x = self._family_step(fi)(x, m)
        return x
