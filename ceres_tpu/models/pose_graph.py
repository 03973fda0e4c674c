"""Pose graph SLAM (2D and 3D).

TPU-native equivalent of /root/reference/examples/slam/pose_graph_2d/
(pose_graph_2d.cc, angle_manifold.h, pose_graph_2d_error_term.h) and
pose_graph_3d/ (pose_graph_3d.cc, pose_graph_3d_error_term.h, types.h —
g2o format readers). 3D uses the Eigen-order quaternion manifold and the
information-matrix-weighted SE3 residual; 2D uses scalar (x, y, yaw)
blocks with an angle (SO2) manifold.
"""
from __future__ import annotations

import dataclasses
import pathlib
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .. import (
    AutoDiffCostFunction,
    AutoDiffManifold,
    EigenQuaternionManifold,
    HuberLoss,
    Problem,
)
from .. import rotation as rot


# --------------------------------------------------------------------------
# 2D
# --------------------------------------------------------------------------


def normalize_angle(a):
    """(-pi, pi] normalization (pose_graph_2d/normalize_angle.h)."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def angle_manifold() -> AutoDiffManifold:
    """SO2 manifold on a scalar angle (pose_graph_2d/angle_manifold.h)."""
    return AutoDiffManifold(
        lambda x, d: normalize_angle(x + d),
        lambda y, x: normalize_angle(y - x),
        1,
        1,
    )


def pose_graph_2d_residual(xa, ya, yawa, xb, yb, yawb, data):
    """pose_graph_2d_error_term.h: sqrt_info * [R_a^T (p_b - p_a) - p_ab;
    normalize(yaw_b - yaw_a - yaw_ab)]."""
    p_ab, yaw_ab, sqrt_info = data
    c, s = jnp.cos(yawa[0]), jnp.sin(yawa[0])
    RaT = jnp.array([[c, s], [-s, c]])
    dp = RaT @ jnp.stack([xb[0] - xa[0], yb[0] - ya[0]])
    r = jnp.concatenate(
        [dp - p_ab, normalize_angle(yawb[0] - yawa[0] - yaw_ab)[None]]
    )
    return sqrt_info @ r


POSE2D_COST = AutoDiffCostFunction(
    pose_graph_2d_residual, 3, [1, 1, 1, 1, 1, 1], name="pose2d"
)


@dataclasses.dataclass
class Pose2:
    x: float
    y: float
    yaw: float


@dataclasses.dataclass
class Constraint2:
    id_begin: int
    id_end: int
    x: float
    y: float
    yaw: float
    information: np.ndarray  # (3,3)


def read_g2o_2d(path) -> Tuple[Dict[int, Pose2], List[Constraint2]]:
    """pose_graph_2d g2o reader (SE2 vertices + edges)."""
    poses: Dict[int, Pose2] = {}
    constraints: List[Constraint2] = []
    for line in pathlib.Path(path).read_text().splitlines():
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "VERTEX_SE2":
            poses[int(tok[1])] = Pose2(float(tok[2]), float(tok[3]), float(tok[4]))
        elif tok[0] == "EDGE_SE2":
            a, b = int(tok[1]), int(tok[2])
            x, y, yaw = (float(v) for v in tok[3:6])
            up = [float(v) for v in tok[6:12]]
            info = np.array(
                [
                    [up[0], up[1], up[2]],
                    [up[1], up[3], up[4]],
                    [up[2], up[4], up[5]],
                ]
            )
            constraints.append(Constraint2(a, b, x, y, yaw, info))
    return poses, constraints


def build_problem_2d(poses: Dict[int, Pose2], constraints: List[Constraint2],
                     loss=None):
    """pose_graph_2d.cc BuildOptimizationProblem: first pose held constant,
    angle manifold on every yaw."""
    arrays = {
        pid: (np.array([p.x]), np.array([p.y]), np.array([p.yaw]))
        for pid, p in poses.items()
    }
    problem = Problem()
    am = angle_manifold()
    for pid in arrays:
        problem.add_parameter_block(arrays[pid][2], manifold=am)
    for c in constraints:
        xa, ya, yawa = arrays[c.id_begin]
        xb, yb, yawb = arrays[c.id_end]
        sqrt_info = np.linalg.cholesky(c.information).T
        problem.add_residual_block(
            POSE2D_COST,
            loss,
            [xa, ya, yawa, xb, yb, yawb],
            data=(np.array([c.x, c.y]), np.float64(c.yaw), sqrt_info),
        )
    first = min(arrays)
    for arr in arrays[first]:
        problem.set_parameter_block_constant(arr)
    return problem, arrays


def synthetic_2d(num_poses=100, loop_closures=8, noise=0.02, seed=0):
    """Circle trajectory with odometry + loop closure edges."""
    rng = np.random.default_rng(seed)
    R = 10.0
    gt = []
    for i in range(num_poses):
        th = 2 * np.pi * i / num_poses
        gt.append(Pose2(R * np.cos(th), R * np.sin(th), normalize_angle_np(th + np.pi / 2)))
    info = np.diag([100.0, 100.0, 400.0])

    def rel(a: Pose2, b: Pose2):
        c, s = np.cos(a.yaw), np.sin(a.yaw)
        RaT = np.array([[c, s], [-s, c]])
        dp = RaT @ np.array([b.x - a.x, b.y - a.y])
        return dp[0], dp[1], normalize_angle_np(b.yaw - a.yaw)

    constraints = []
    for i in range(num_poses - 1):
        dx, dy, dth = rel(gt[i], gt[i + 1])
        constraints.append(
            Constraint2(
                i, i + 1,
                dx + noise * rng.standard_normal(),
                dy + noise * rng.standard_normal(),
                dth + noise * rng.standard_normal(),
                info,
            )
        )
    for _ in range(loop_closures):
        i = int(rng.integers(0, num_poses))
        j = int(rng.integers(0, num_poses))
        if i == j:
            continue
        dx, dy, dth = rel(gt[i], gt[j])
        constraints.append(
            Constraint2(i, j, dx + noise * rng.standard_normal(),
                        dy + noise * rng.standard_normal(),
                        dth + noise * rng.standard_normal(), info)
        )
    # noisy initial poses by integrating odometry
    poses = {0: Pose2(gt[0].x, gt[0].y, gt[0].yaw)}
    for i in range(num_poses - 1):
        c = constraints[i]
        a = poses[i]
        ca, sa = np.cos(a.yaw), np.sin(a.yaw)
        poses[i + 1] = Pose2(
            a.x + ca * c.x - sa * c.y,
            a.y + sa * c.x + ca * c.y,
            normalize_angle_np(a.yaw + c.yaw),
        )
    return poses, constraints, gt


def normalize_angle_np(a):
    return a - 2.0 * np.pi * np.floor((a + np.pi) / (2.0 * np.pi))


# --------------------------------------------------------------------------
# 3D
# --------------------------------------------------------------------------


def pose_graph_3d_residual(pa, qa, pb, qb, data):
    """pose_graph_3d_error_term.h. Quaternions in Eigen order [x,y,z,w];
    residual = sqrt_info * [q_a^{-1}(p_b-p_a) - p_ab; 2 vec(q_ab_meas^{-1}
    q_a^{-1} q_b)]."""
    p_ab, q_ab, sqrt_info = data
    # to w-first for the rotation helpers
    def wfirst(q):
        return jnp.concatenate([q[3:4], q[:3]])

    qa_w = wfirst(qa)
    qb_w = wfirst(qb)
    qab_w = wfirst(q_ab)
    qa_inv = rot.quaternion_conjugate(qa_w)
    p_est = rot.unit_quaternion_rotate_point(qa_inv, pb - pa)
    q_ab_est = rot.quaternion_product(qa_inv, qb_w)
    dq = rot.quaternion_product(rot.quaternion_conjugate(qab_w), q_ab_est)
    r = jnp.concatenate([p_est - p_ab, 2.0 * dq[1:]])
    return sqrt_info @ r


POSE3D_COST = AutoDiffCostFunction(pose_graph_3d_residual, 6, [3, 4, 3, 4],
                                   name="pose3d")


@dataclasses.dataclass
class Constraint3:
    id_begin: int
    id_end: int
    t: np.ndarray  # (3,)
    q: np.ndarray  # (4,) eigen order [x,y,z,w]
    information: np.ndarray  # (6,6)


def read_g2o_3d(path):
    """pose_graph_3d/types.h readers: VERTEX_SE3:QUAT / EDGE_SE3:QUAT."""
    poses: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    constraints: List[Constraint3] = []
    for line in pathlib.Path(path).read_text().splitlines():
        tok = line.split()
        if not tok:
            continue
        if tok[0] == "VERTEX_SE3:QUAT":
            pid = int(tok[1])
            vals = [float(v) for v in tok[2:9]]
            poses[pid] = (np.array(vals[:3]), np.array(vals[3:7]))
        elif tok[0] == "EDGE_SE3:QUAT":
            a, b = int(tok[1]), int(tok[2])
            vals = [float(v) for v in tok[3:10]]
            up = [float(v) for v in tok[10:31]]
            info = np.zeros((6, 6))
            k = 0
            for i in range(6):
                for j in range(i, 6):
                    info[i, j] = info[j, i] = up[k]
                    k += 1
            constraints.append(
                Constraint3(a, b, np.array(vals[:3]), np.array(vals[3:7]), info)
            )
    return poses, constraints


def build_problem_3d(poses, constraints, loss=None):
    """pose_graph_3d.cc BuildOptimizationProblem: EigenQuaternionManifold on
    orientations, first pose constant."""
    arrays = {
        pid: (np.ascontiguousarray(p), np.ascontiguousarray(q))
        for pid, (p, q) in poses.items()
    }
    problem = Problem()
    qm = EigenQuaternionManifold()
    for pid in arrays:
        problem.add_parameter_block(arrays[pid][1], manifold=qm)
    for c in constraints:
        pa, qa = arrays[c.id_begin]
        pb, qb = arrays[c.id_end]
        sqrt_info = np.linalg.cholesky(c.information).T
        problem.add_residual_block(
            POSE3D_COST, loss, [pa, qa, pb, qb], data=(c.t, c.q, sqrt_info)
        )
    first = min(arrays)
    problem.set_parameter_block_constant(arrays[first][0])
    problem.set_parameter_block_constant(arrays[first][1])
    return problem, arrays


def synthetic_3d(num_poses=50, loop_closures=6, noise=0.01, seed=0):
    """Noisy helix with loop closures; returns (poses, constraints, gt)."""
    rng = np.random.default_rng(seed)
    gt = []
    for i in range(num_poses):
        th = 4 * np.pi * i / num_poses
        pos = np.array([5 * np.cos(th), 5 * np.sin(th), 0.1 * i])
        aa = np.array([0.0, 0.0, th + np.pi / 2])
        q_w = np.array(rot.angle_axis_to_quaternion(jnp.asarray(aa)))
        q_eigen = np.concatenate([q_w[1:], q_w[:1]])
        gt.append((pos, q_eigen))
    info = np.diag([100.0] * 3 + [400.0] * 3)

    def rel(a, b):
        pa, qa = a
        pb, qb = b
        qa_w = np.concatenate([qa[3:4], qa[:3]])
        qb_w = np.concatenate([qb[3:4], qb[:3]])
        qa_inv = np.array(rot.quaternion_conjugate(jnp.asarray(qa_w)))
        dp = np.array(
            rot.unit_quaternion_rotate_point(jnp.asarray(qa_inv), jnp.asarray(pb - pa))
        )
        dq_w = np.array(
            rot.quaternion_product(jnp.asarray(qa_inv), jnp.asarray(qb_w))
        )
        return dp, np.concatenate([dq_w[1:], dq_w[:1]])

    constraints = []

    def noisy(dp, dq):
        dp = dp + noise * rng.standard_normal(3)
        aa_noise = noise * rng.standard_normal(3)
        nq_w = np.array(rot.angle_axis_to_quaternion(jnp.asarray(aa_noise)))
        dq_w = np.concatenate([dq[3:4], dq[:3]])
        out_w = np.array(rot.quaternion_product(jnp.asarray(dq_w), jnp.asarray(nq_w)))
        return dp, np.concatenate([out_w[1:], out_w[:1]])

    for i in range(num_poses - 1):
        dp, dq = rel(gt[i], gt[i + 1])
        dp, dq = noisy(dp, dq)
        constraints.append(Constraint3(i, i + 1, dp, dq, info))
    for _ in range(loop_closures):
        i, j = rng.integers(0, num_poses, 2)
        if i == j:
            continue
        dp, dq = rel(gt[int(i)], gt[int(j)])
        dp, dq = noisy(dp, dq)
        constraints.append(Constraint3(int(i), int(j), dp, dq, info))

    # integrate odometry for noisy initial estimate
    poses = {0: (gt[0][0].copy(), gt[0][1].copy())}
    for i in range(num_poses - 1):
        c = constraints[i]
        pa, qa = poses[i]
        qa_w = np.concatenate([qa[3:4], qa[:3]])
        dq_w = np.concatenate([c.q[3:4], c.q[:3]])
        p_new = pa + np.array(
            rot.unit_quaternion_rotate_point(jnp.asarray(qa_w), jnp.asarray(c.t))
        )
        q_new_w = np.array(rot.quaternion_product(jnp.asarray(qa_w), jnp.asarray(dq_w)))
        q_new_w /= np.linalg.norm(q_new_w)
        poses[i + 1] = (p_new, np.concatenate([q_new_w[1:], q_new_w[:1]]))
    return poses, constraints, gt
