"""Schur ordering: choosing which blocks to eliminate first.

TPU-native analog of the reference's automatic MIS ordering
(/root/reference/internal/ceres/parameter_block_ordering.cc —
ComputeStableSchurOrdering, graph_algorithms.h:97-165) and of
ReorderProgramForSchurTypeLinearSolver (reorder_program.h:76).

Granularity difference by design: the compiled program batches blocks into
(size, manifold) *families*, so the e-partition is a set of families. A
family set is independent iff no residual kind has two slots inside it —
for BA/SLAM this picks exactly the point blocks, matching the reference's
block-level greedy MIS. Contiguous-chunk reordering is unnecessary here:
kind-major batching already gives the eliminator unit-stride access.
"""
from __future__ import annotations

from typing import List, Optional, Sequence


def eligible_e_sets(program) -> List[int]:
    """Greedy maximum-tangent-size independent family set.

    Returns family indices to eliminate (possibly empty). Mirrors the
    greedy MIS of graph_algorithms.h:97: order candidates by eliminated
    size (descending) and add while independence holds."""
    families = program.families
    kinds = program.kinds

    def is_valid(chosen: set) -> bool:
        for kind in kinds:
            n = 0
            for s in kind.slots:
                fi = _family_index(program, s.family)
                if fi in chosen:
                    n += 1
            if n > 1:
                return False
        return True

    # Candidates: families with variable blocks only.
    order = sorted(
        (fi for fi, f in enumerate(families) if f.num_var > 0),
        key=lambda fi: families[fi].num_var * families[fi].tsize,
        reverse=True,
    )
    chosen: set = set()
    for fi in order:
        trial = chosen | {fi}
        if is_valid(trial):
            chosen = trial
    # Never eliminate everything: keep at least one f-family so the Schur
    # system is non-trivial (reference falls back when no e-blocks too).
    if len(chosen) == sum(1 for f in families if f.num_var > 0):
        # Drop the smallest family from the eliminated set.
        if chosen:
            smallest = min(chosen, key=lambda fi: families[fi].num_var * families[fi].tsize)
            chosen.discard(smallest)
    return sorted(chosen)


def color_family_blocks(program, fi: int):
    """Greedy graph coloring of the VARIABLE blocks of family `fi` over
    the residual co-occurrence graph — the block-granular independent-set
    decomposition of the reference
    (coordinate_descent_minimizer.h:84 CreateOrdering,
    parameter_block_ordering.h:74, graph_algorithms.h:165): two blocks get
    different colors iff some residual touches both, so every color class
    is an independent set even inside a single family (the pose-graph
    case: one pose family, binary residuals).

    Returns (colors, num_colors): colors is an int32 (num_var,) array;
    a family no residual kind touches twice is one color. Greedy order is
    by descending degree (Welsh-Powell), numpy-vectorized edge extraction.
    """
    import numpy as np

    fam = program.families[fi]
    nv = fam.num_var
    if nv == 0:
        return np.zeros((0,), np.int32), 0
    edges = []
    for kind in program.kinds:
        ours = [s for s in kind.slots if s.family is fam and s.any_variable]
        for a in range(len(ours)):
            for b in range(a + 1, len(ours)):
                pa = np.asarray(ours[a].pos_in_family)
                pb = np.asarray(ours[b].pos_in_family)
                keep = (pa < nv) & (pb < nv) & (pa != pb)
                if keep.any():
                    edges.append(np.stack([pa[keep], pb[keep]], axis=1))
    if not edges:
        return np.zeros((nv,), np.int32), 1
    e = np.concatenate(edges, axis=0)
    e = np.concatenate([e, e[:, ::-1]], axis=0)  # symmetric
    e = np.unique(e, axis=0)
    # CSR adjacency
    deg = np.bincount(e[:, 0], minlength=nv)
    ptr = np.zeros(nv + 1, np.int64)
    ptr[1:] = np.cumsum(deg)
    adj = e[np.argsort(e[:, 0], kind="stable"), 1]
    colors = np.full(nv, -1, np.int32)
    order = np.argsort(-deg, kind="stable")
    for v in order:
        nb = colors[adj[ptr[v]:ptr[v + 1]]]
        used = set(int(c) for c in nb if c >= 0)
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors, int(colors.max()) + 1


def _family_index(program, family) -> int:
    for i, f in enumerate(program.families):
        if f is family:
            return i
    raise KeyError


def e_set_from_user_ordering(program, ordering: Sequence[Sequence]) -> Optional[List[int]]:
    """Map a user ParameterBlockOrdering (list of groups of user arrays) to
    an e-family set: group 0's blocks are eliminated. Requires group 0 to
    cover whole families (the batched granularity). Group entries may be
    individual parameter arrays OR ParameterBlockArray handles (the
    scale-path blocks from Problem.add_parameter_block_array — one handle
    covers its whole family)."""
    if not ordering or len(ordering) < 2:
        return None
    group0 = ordering[0]
    arr_to_fam = {
        id(f.array): fi
        for fi, f in enumerate(program.families)
        if f.array is not None
    }
    ids = set()
    chosen_blocks = set()
    for values in group0:
        fi = arr_to_fam.get(id(values))
        if fi is not None:  # a whole batched family at once
            ids.add(fi)
            continue
        blk = program.problem.parameter_block_for(values)
        fam, _ = program._block_pos[id(blk)]
        ids.add(_family_index(program, fam))
        chosen_blocks.add(id(blk))
    # check coverage: every variable block of each chosen family in group 0
    for fi in ids:
        fam = program.families[fi]
        if fam.array is not None and id(fam.array) in arr_to_fam:
            continue  # array families are covered by their handle
        for b in fam.blocks[: fam.num_var]:
            if id(b) not in chosen_blocks:
                raise ValueError(
                    "linear_solver_ordering group 0 must cover whole "
                    "(size, manifold) families in the TPU build"
                )
    return sorted(ids)
