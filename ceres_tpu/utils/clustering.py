"""Visibility graphs and camera clustering for the cluster preconditioners.

TPU-native equivalent of /root/reference/internal/ceres/visibility.{h,cc}
(ComputeVisibility / CreateSchurComplementGraph, visibility.h:40-66),
canonical_views_clustering.{h,cc} (:98) and single_linkage_clustering.{h,cc}
(:57). These run host-side once per solve (graph algorithms on the problem
structure), exactly as in the reference; only the preconditioner *apply* is
device code.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def compute_visibility_graph(point_ids: np.ndarray, camera_ids: np.ndarray,
                             num_cameras: int) -> Dict[Tuple[int, int], float]:
    """Camera-camera edge weights from shared-point visibility
    (visibility.cc CreateSchurComplementGraph): weight(i,j) =
    #shared points / sqrt(#points_i * #points_j)."""
    from collections import defaultdict

    cams_of_point = defaultdict(list)
    for p, c in zip(point_ids, camera_ids):
        cams_of_point[int(p)].append(int(c))
    counts = np.zeros(num_cameras, np.int64)
    shared = defaultdict(int)
    for p, cams in cams_of_point.items():
        cams = sorted(set(cams))
        for c in cams:
            counts[c] += 1
        for i in range(len(cams)):
            for j in range(i + 1, len(cams)):
                shared[(cams[i], cams[j])] += 1
    edges = {}
    for (i, j), s in shared.items():
        d = np.sqrt(float(counts[i]) * float(counts[j]))
        if d > 0:
            edges[(i, j)] = s / d
    return edges


def single_linkage_clustering(num_vertices: int,
                              edges: Dict[Tuple[int, int], float],
                              min_similarity: float = 0.9) -> np.ndarray:
    """Union-find merge of edges above threshold
    (single_linkage_clustering.cc:57). Returns cluster id per vertex."""
    parent = np.arange(num_vertices)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, j), w in edges.items():
        if w >= min_similarity:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[ri] = rj
    roots = {find(i) for i in range(num_vertices)}
    remap = {r: k for k, r in enumerate(sorted(roots))}
    return np.asarray([remap[find(i)] for i in range(num_vertices)], np.int32)


def canonical_views_clustering(
    num_vertices: int,
    edges: Dict[Tuple[int, int], float],
    size_penalty_weight: float = 5.0,
    similarity_penalty_weight: float = 100.0,
    min_views: int = 0,
) -> np.ndarray:
    """Greedy canonical-view selection (canonical_views_clustering.cc:98,
    Simon et al. "Scene Summarization for Online Image Collections"
    objective): repeatedly add the view maximizing
      sum_i max(0, sim(i, c) - max_sim_to_existing(i))
      - size_penalty - similarity_penalty * sim(c, existing)
    then assign every vertex to its most similar canonical view."""
    sim = {}
    adj: List[Dict[int, float]] = [dict() for _ in range(num_vertices)]
    for (i, j), w in edges.items():
        adj[i][j] = w
        adj[j][i] = w
    canonical: List[int] = []
    best_sim = np.zeros(num_vertices)
    while True:
        best_gain, best_v = -np.inf, -1
        for v in range(num_vertices):
            if v in canonical:
                continue
            gain = 0.0
            # coverage improvement (v covers itself with sim 1)
            gain += max(0.0, 1.0 - best_sim[v])
            for u, w in adj[v].items():
                gain += max(0.0, w - best_sim[u])
            gain -= size_penalty_weight
            for c in canonical:
                gain -= similarity_penalty_weight * adj[v].get(c, 0.0)
            if gain > best_gain:
                best_gain, best_v = gain, v
        if best_v < 0 or best_gain <= 0.0:
            break
        canonical.append(best_v)
        best_sim[best_v] = 1.0
        for u, w in adj[best_v].items():
            best_sim[u] = max(best_sim[u], w)
        if len(canonical) >= num_vertices:
            break
    if not canonical:
        canonical = [0]
    # assignment
    membership = np.zeros(num_vertices, np.int32)
    for v in range(num_vertices):
        best_w, best_c = -1.0, 0
        for k, c in enumerate(canonical):
            w = 1.0 if v == c else adj[v].get(c, 0.0)
            if w > best_w:
                best_w, best_c = w, k
        membership[v] = best_c
    return membership


def maximum_spanning_forest_degree2(
    num_vertices: int, edges: Dict[Tuple[int, int], float], membership: np.ndarray
) -> List[Tuple[int, int]]:
    """Degree-2-constrained maximum spanning forest over the *cluster*
    graph (visibility_based_preconditioner.h:95-140 ForestEdges for
    CLUSTER_TRIDIAGONAL): greedy over cluster-pair weights."""
    from collections import defaultdict

    num_clusters = int(membership.max()) + 1 if num_vertices else 0
    cw = defaultdict(float)
    for (i, j), w in edges.items():
        ci, cj = int(membership[i]), int(membership[j])
        if ci != cj:
            cw[(min(ci, cj), max(ci, cj))] += w
    order = sorted(cw.items(), key=lambda kv: -kv[1])
    degree = np.zeros(num_clusters, np.int32)
    parent = np.arange(num_clusters)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for (i, j), w in order:
        if degree[i] >= 2 or degree[j] >= 2:
            continue
        ri, rj = find(i), find(j)
        if ri == rj:
            continue
        parent[ri] = rj
        degree[i] += 1
        degree[j] += 1
        forest.append((i, j))
    return forest
