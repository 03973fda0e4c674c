"""Bundle adjustment in the large (BAL) problems.

TPU-native equivalent of /root/reference/examples/bal_problem.{h,cc},
simple_bundle_adjuster.cc (the Snavely reprojection model) and the
synthetic-Jacobian generator fake_bundle_adjustment_jacobian.{h,cc}
(fake_bundle_adjustment_jacobian.h:42) used to test scale-shaped code
without datasets.

Camera: 9 params — angle-axis rotation (3), translation (3), focal f,
radial distortion k1, k2. BAL convention: P = R X + t, p = -P/P_z,
predicted = f * (1 + k1 r^2 + k2 r^4) * p.
"""
from __future__ import annotations

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from .. import AutoDiffCostFunction, HuberLoss, Problem
from ..rotation import angle_axis_rotate_point


def snavely_reprojection_residual(camera, point, observed):
    """simple_bundle_adjuster.cc SnavelyReprojectionError, batched-friendly."""
    p = angle_axis_rotate_point(camera[:3], point) + camera[3:6]
    xp = -p[0] / p[2]
    yp = -p[1] / p[2]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (camera[7] + camera[8] * r2)
    predicted_x = camera[6] * distortion * xp
    predicted_y = camera[6] * distortion * yp
    return jnp.stack([predicted_x - observed[0], predicted_y - observed[1]])


def snavely_residual_rows(cam, pt, obs):
    """ROW-VECTORIZED snavely residual for the fused Pallas evaluation
    kernel (ops/pallas_kernels.eval_fused): operands are (lanes, rows)
    arrays — cam (>=9, rows), pt (>=3, rows), obs (>=2, rows) — and the
    body uses only Mosaic-lowerable constructs (broadcast row slices, no
    jnp.cross / keepdims indexing, branch via plain where). Same math as
    snavely_reprojection_residual including the small-angle branch."""
    ax, ay, az = cam[0:1], cam[1:2], cam[2:3]
    px, py, pz = pt[0:1], pt[1:2], pt[2:3]
    theta2 = ax * ax + ay * ay + az * az
    # Branch-free Rodrigues: theta = sqrt(theta2 + tiny) has the correct
    # theta -> 0 limit through every term (w*st -> aa, w*wdp*(1-ct) -> 0)
    # and keeps the jvp smooth; Mosaic rejects the (1, rows) boolean
    # select the branchy form needs. Error vs the exact small-angle
    # series is O(theta^2) below sqrt(eps) — inside f32 roundoff.
    tiny = jnp.asarray(1e-30, cam.dtype)
    theta = jnp.sqrt(theta2 + tiny)
    inv_t = 1.0 / theta
    wx, wy, wz = ax * inv_t, ay * inv_t, az * inv_t
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    # w x p
    cxx = wy * pz - wz * py
    cyy = wz * px - wx * pz
    czz = wx * py - wy * px
    wdp = wx * px + wy * py + wz * pz
    k = wdp * (1.0 - ct)
    rx = px * ct + cxx * st + wx * k + cam[3:4]
    ry = py * ct + cyy * st + wy * k + cam[4:5]
    rz = pz * ct + czz * st + wz * k + cam[5:6]
    xp = -rx / rz
    yp = -ry / rz
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (cam[7:8] + cam[8:9] * r2)
    f = cam[6:7]
    return jnp.concatenate(
        [f * distortion * xp - obs[0:1], f * distortion * yp - obs[1:2]],
        axis=0)


SNAVELY_COST = AutoDiffCostFunction(
    snavely_reprojection_residual, 2, [9, 3], name="snavely"
)
# slot order in the cost is [camera, point]; the rows form takes
# (cam_rows, pt_rows, obs_rows)
SNAVELY_COST.residual_rows = snavely_residual_rows


def snavely_quat_residual(cam, pt, data):
    """Snavely reprojection with a UNIT-QUATERNION camera: cam is
    [q(wxyz, 4), t(3), f, k1, k2] (10 ambient / 9 tangent under
    ProductManifold(Quaternion, Euclidean(6))) — the manifold-BA
    acceptance shape (bundle_adjuster.cc --use_quaternions role)."""
    from .. import rotation

    p3 = rotation.unit_quaternion_rotate_point(cam[:4], pt) + cam[4:7]
    xp = -p3[0] / p3[2]
    yp = -p3[1] / p3[2]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (cam[8] + cam[9] * r2)
    f = cam[7]
    return jnp.stack([f * distortion * xp - data[0],
                      f * distortion * yp - data[1]])


def snavely_quat_residual_rows(cam, pt, obs):
    """ROW-VECTORIZED quaternion-camera snavely residual for eval_fused:
    cam (>=10, rows) [w,x,y,z,tx,ty,tz,f,k1,k2], pt (>=3, rows). Unit-q
    2-cross rotation written lane-wise (no jnp.cross — Mosaic)."""
    w = cam[0:1]
    qx, qy, qz = cam[1:2], cam[2:3], cam[3:4]
    px, py, pz = pt[0:1], pt[1:2], pt[2:3]
    # uv = v x p ; uuv = v x uv ; p' = p + 2(w uv + uuv)
    uvx = qy * pz - qz * py
    uvy = qz * px - qx * pz
    uvz = qx * py - qy * px
    uux = qy * uvz - qz * uvy
    uuy = qz * uvx - qx * uvz
    uuz = qx * uvy - qy * uvx
    rx = px + 2.0 * (w * uvx + uux) + cam[4:5]
    ry = py + 2.0 * (w * uvy + uuy) + cam[5:6]
    rz = pz + 2.0 * (w * uvz + uuz) + cam[6:7]
    xp = -rx / rz
    yp = -ry / rz
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (cam[8:9] + cam[9:10] * r2)
    f = cam[7:8]
    return jnp.concatenate(
        [f * distortion * xp - obs[0:1], f * distortion * yp - obs[1:2]],
        axis=0)


SNAVELY_QUAT_COST = AutoDiffCostFunction(
    snavely_quat_residual, 2, [10, 3], name="snavely_quat")
SNAVELY_QUAT_COST.residual_rows = snavely_quat_residual_rows


def cameras_to_quaternion(cameras: np.ndarray) -> np.ndarray:
    """(C, 9) angle-axis cameras -> (C, 10) unit-quaternion cameras."""
    from .. import rotation

    q = np.asarray(jax.vmap(rotation.angle_axis_to_quaternion)(
        jnp.asarray(cameras[:, :3])))
    return np.concatenate([q, cameras[:, 3:]], axis=1)


def build_problem_batched_quat(bal: BALProblem, loss=None):
    """build_problem_batched with quaternion cameras + manifold: the
    jt-mode manifold acceptance path (eval_fused pj_cols chain rule)."""
    from ..manifolds import (EuclideanManifold, ProductManifold,
                             QuaternionManifold)

    cam_values = cameras_to_quaternion(np.ascontiguousarray(bal.cameras))
    pt_values = np.ascontiguousarray(bal.points)
    p = Problem()
    man = ProductManifold(QuaternionManifold(), EuclideanManifold(6))
    cams = p.add_parameter_block_array(cam_values, manifold=man)
    pts = p.add_parameter_block_array(pt_values)
    p.add_residual_block_batch(
        SNAVELY_QUAT_COST,
        loss,
        [(cams, bal.camera_index), (pts, bal.point_index)],
        data=bal.observations,
    )
    return p, cam_values, pt_values


@dataclasses.dataclass
class BALProblem:
    cameras: np.ndarray  # (num_cameras, 9)
    points: np.ndarray  # (num_points, 3)
    camera_index: np.ndarray  # (num_obs,)
    point_index: np.ndarray  # (num_obs,)
    observations: np.ndarray  # (num_obs, 2)

    @property
    def num_cameras(self):
        return self.cameras.shape[0]

    @property
    def num_points(self):
        return self.points.shape[0]

    @property
    def num_observations(self):
        return self.observations.shape[0]


def read_bal_file(path) -> BALProblem:
    """BAL text format (bal_problem.cc): header then observations then
    parameters."""
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    num_cameras = int(next(it))
    num_points = int(next(it))
    num_obs = int(next(it))
    cam_idx = np.zeros(num_obs, np.int32)
    pt_idx = np.zeros(num_obs, np.int32)
    obs = np.zeros((num_obs, 2))
    for i in range(num_obs):
        cam_idx[i] = int(next(it))
        pt_idx[i] = int(next(it))
        obs[i, 0] = float(next(it))
        obs[i, 1] = float(next(it))
    cameras = np.array([float(next(it)) for _ in range(9 * num_cameras)]).reshape(
        num_cameras, 9
    )
    points = np.array([float(next(it)) for _ in range(3 * num_points)]).reshape(
        num_points, 3
    )
    return BALProblem(cameras, points, cam_idx, pt_idx, obs)


def synthetic_bal(
    num_cameras=16,
    num_points=500,
    visibility=0.3,
    noise=1.0,
    seed=0,
) -> BALProblem:
    """Synthetic BA instance with realistic structure (the reference's
    fake_bundle_adjustment_jacobian pattern: random camera/point blocks
    with controllable visibility density) — observations generated from a
    ground-truth model plus pixel noise so the global optimum is known to
    be near the ground truth."""
    rng = np.random.default_rng(seed)
    # Cameras on a rough ring looking at the origin cluster.
    cameras = np.zeros((num_cameras, 9))
    cameras[:, :3] = rng.standard_normal((num_cameras, 3)) * 0.1  # small rotations
    angles = np.linspace(0, 2 * np.pi, num_cameras, endpoint=False)
    cameras[:, 3] = 0.5 * np.cos(angles)
    cameras[:, 4] = 0.5 * np.sin(angles)
    cameras[:, 5] = 10.0 + rng.uniform(-0.5, 0.5, num_cameras)  # in front
    cameras[:, 6] = 500.0 + rng.uniform(-25, 25, num_cameras)  # focal
    cameras[:, 7] = rng.uniform(-1e-7, 1e-7, num_cameras)
    cameras[:, 8] = rng.uniform(-1e-13, 1e-13, num_cameras)
    points = rng.standard_normal((num_points, 3)) * 2.0

    seen = rng.random((num_points, num_cameras)) < visibility
    empty = ~seen.any(axis=1)
    if empty.any():
        seen[empty, rng.integers(0, num_cameras, int(empty.sum()))] = True
    pt_idx, cam_idx = np.nonzero(seen)
    cam_idx = cam_idx.astype(np.int32)
    pt_idx = pt_idx.astype(np.int32)

    import jax

    obs_clean = jax.vmap(
        lambda c, p: snavely_reprojection_residual(c, p, jnp.zeros(2))
    )(jnp.asarray(cameras[cam_idx]), jnp.asarray(points[pt_idx]))
    obs = np.asarray(obs_clean) + noise * rng.standard_normal((len(cam_idx), 2))
    return BALProblem(cameras, points, cam_idx, pt_idx, obs)


def perturb(bal: BALProblem, rotation_sigma=0.0, translation_sigma=0.0,
            point_sigma=0.0, seed=1) -> BALProblem:
    """bal_problem.cc Perturb equivalent."""
    rng = np.random.default_rng(seed)
    cams = bal.cameras.copy()
    pts = bal.points.copy()
    cams[:, :3] += rotation_sigma * rng.standard_normal((bal.num_cameras, 3))
    cams[:, 3:6] += translation_sigma * rng.standard_normal((bal.num_cameras, 3))
    pts += point_sigma * rng.standard_normal(pts.shape)
    return BALProblem(cams, pts, bal.camera_index, bal.point_index, bal.observations)


def build_problem(bal: BALProblem, loss=None, use_huber=False) -> "tuple[Problem, list, list]":
    """Build a ceres_tpu Problem with per-block adds (Ceres-style API);
    returns (problem, camera_arrays, point_arrays) — the arrays are the
    live parameter blocks. For large problems prefer
    build_problem_batched."""
    cams = [np.ascontiguousarray(bal.cameras[i]) for i in range(bal.num_cameras)]
    pts = [np.ascontiguousarray(bal.points[j]) for j in range(bal.num_points)]
    if use_huber and loss is None:
        loss = HuberLoss(1.0)
    p = Problem()
    for k in range(bal.num_observations):
        p.add_residual_block(
            SNAVELY_COST,
            loss,
            [cams[bal.camera_index[k]], pts[bal.point_index[k]]],
            data=bal.observations[k],
        )
    return p, cams, pts


def build_problem_batched(bal: BALProblem, loss=None, use_huber=False):
    """Scale path: parameter block arrays + one batched residual add —
    O(1) Python objects regardless of problem size. Returns
    (problem, camera_array, point_array); results are written back into
    the (num_cameras, 9) / (num_points, 3) arrays."""
    if use_huber and loss is None:
        loss = HuberLoss(1.0)
    cam_values = np.ascontiguousarray(bal.cameras)
    pt_values = np.ascontiguousarray(bal.points)
    p = Problem()
    cams = p.add_parameter_block_array(cam_values)
    pts = p.add_parameter_block_array(pt_values)
    p.add_residual_block_batch(
        SNAVELY_COST,
        loss,
        [(cams, bal.camera_index), (pts, bal.point_index)],
        data=bal.observations,
    )
    return p, cam_values, pt_values


def synthetic_bal_large(
    num_cameras=13696,
    num_points=1_000_000,
    mean_track=4.4,
    cam_window=60,
    noise=1.0,
    seed=0,
) -> BALProblem:
    """Venice/Final-scale synthetic BA instance (BASELINE config 4 shape)
    built WITHOUT the (P, C) visibility matrix of synthetic_bal: each
    point draws a power-law-ish track length and samples its cameras from
    a window around an anchor camera (points ordered along the camera
    trajectory — the locality real large BAL datasets have, which the
    large-C fused matvec exploits via plan_camera_windows). O(B) memory."""
    rng = np.random.default_rng(seed)
    C, P = num_cameras, num_points
    cameras = np.zeros((C, 9))
    cameras[:, :3] = rng.standard_normal((C, 3)) * 0.1
    angles = np.linspace(0, 2 * np.pi, C, endpoint=False)
    cameras[:, 3] = 0.5 * np.cos(angles)
    cameras[:, 4] = 0.5 * np.sin(angles)
    cameras[:, 5] = 10.0 + rng.uniform(-0.5, 0.5, C)
    cameras[:, 6] = 500.0 + rng.uniform(-25, 25, C)
    cameras[:, 7] = rng.uniform(-1e-7, 1e-7, C)
    cameras[:, 8] = rng.uniform(-1e-13, 1e-13, C)
    points = rng.standard_normal((P, 3)) * 2.0

    # track lengths: geometric with floor 2 (power-law-ish tail like BAL)
    track = 2 + rng.geometric(1.0 / max(mean_track - 1.0, 1.0), P) - 1
    pt_idx = np.repeat(np.arange(P, dtype=np.int32), track)
    anchor = (pt_idx.astype(np.float64) / P * C).astype(np.int64)
    cam_idx = np.clip(
        anchor + rng.integers(-cam_window, cam_window + 1, pt_idx.shape[0]),
        0, C - 1,
    ).astype(np.int32)

    import jax

    B = cam_idx.shape[0]
    obs = np.empty((B, 2))
    chunk = 1 << 20
    f = jax.jit(jax.vmap(
        lambda c, p: snavely_reprojection_residual(c, p, jnp.zeros(2))))
    for s in range(0, B, chunk):
        e = min(s + chunk, B)
        obs[s:e] = np.asarray(
            f(jnp.asarray(cameras[cam_idx[s:e]]),
              jnp.asarray(points[pt_idx[s:e]])))
    obs += noise * rng.standard_normal((B, 2))
    return BALProblem(cameras, points, cam_idx, pt_idx, obs)
