"""libmv (Blender motion tracking) bundle adjustment.

TPU-native equivalent of /root/reference/examples/libmv_bundle_adjuster.cc:
reads the binary problem format (endian-marked: markers space flag, 8
shared camera intrinsics, cameras as (image, R, t), points as (track, X),
markers as (image, track, x, y)) and refines cameras + points (+ optionally
the shared intrinsics) under the polynomial+tangential distortion model
(ApplyDistortionModelUsingIntrinsicsBlock). The in-tree problems are
production shots from Tears of Steel.
"""
from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import AutoDiffCostFunction, Problem
from .. import rotation as rot

# intrinsics block layout (libmv_bundle_adjuster.cc OFFSET_*):
# focal, ppx, ppy, k1, k2, k3, p1, p2
INTRINSICS_SIZE = 8


@dataclasses.dataclass
class LibmvProblem:
    is_image_space: bool
    intrinsics: np.ndarray  # (8,)
    cameras: np.ndarray  # (n_cams, 6): angle-axis (3) + t (3)
    camera_images: np.ndarray  # original image numbers
    points: np.ndarray  # (n_pts, 3)
    point_tracks: np.ndarray
    marker_cam: np.ndarray  # (n_markers,) index into cameras
    marker_pt: np.ndarray  # (n_markers,) index into points
    markers: np.ndarray  # (n_markers, 2)


def read_libmv_file(path) -> LibmvProblem:
    data = open(path, "rb").read()
    off = 0

    def read(fmt):
        nonlocal off
        size = struct.calcsize(fmt)
        vals = struct.unpack_from(endian + fmt, data, off)
        off += size
        return vals if len(vals) > 1 else vals[0]

    # single-byte endian marker: 'v' little, 'V' big
    endian = "<"
    if data[0:1] == b"V":
        endian = ">"
    elif data[0:1] != b"v":
        raise ValueError("unknown endian marker in libmv problem file")
    off = 1
    flag = read("B")
    is_image_space = flag == ord("P")
    intrinsics = np.asarray(read("8f"))
    n_cams = read("i")
    cam_map = {}
    cams = []
    images = []
    for _ in range(n_cams):
        image = read("i")
        R = np.asarray(read("9f")).reshape(3, 3, order="F")  # column-major
        t = np.asarray(read("3f"))
        aa = np.array(rot.rotation_matrix_to_angle_axis(jnp.asarray(R, jnp.float64)))
        cam_map[image] = len(cams)
        cams.append(np.concatenate([aa, t]))
        images.append(image)
    n_pts = read("i")
    pt_map = {}
    pts = []
    tracks = []
    for _ in range(n_pts):
        track = read("i")
        X = np.asarray(read("3f"))
        pt_map[track] = len(pts)
        pts.append(X)
        tracks.append(track)
    n_markers = read("i")
    mc, mp, mm = [], [], []
    for _ in range(n_markers):
        image = read("i")
        track = read("i")
        x, y = read("2f")
        if image in cam_map and track in pt_map:
            mc.append(cam_map[image])
            mp.append(pt_map[track])
            mm.append((x, y))
    return LibmvProblem(
        is_image_space=is_image_space,
        intrinsics=np.asarray(intrinsics, np.float64),
        cameras=np.asarray(cams),
        camera_images=np.asarray(images),
        points=np.asarray(pts),
        point_tracks=np.asarray(tracks),
        marker_cam=np.asarray(mc, np.int64),
        marker_pt=np.asarray(mp, np.int64),
        markers=np.asarray(mm, np.float64),
    )


def libmv_reprojection_residual(camera, point, intrinsics, observed):
    """Project + polynomial/tangential distortion
    (libmv_bundle_adjuster.cc ApplyDistortionModelUsingIntrinsicsBlock +
    OpenCVReprojectionError)."""
    x = rot.angle_axis_rotate_point(camera[:3], point) + camera[3:6]
    xn = x[0] / x[2]
    yn = x[1] / x[2]
    focal, ppx, ppy, k1, k2, k3, p1, p2 = (intrinsics[i] for i in range(8))
    r2 = xn * xn + yn * yn
    r4 = r2 * r2
    r6 = r4 * r2
    r_coeff = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    xd = xn * r_coeff + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * r_coeff + 2.0 * p2 * xn * yn + p1 * (r2 + 2.0 * yn * yn)
    pred_x = focal * xd + ppx
    pred_y = focal * yd + ppy
    return jnp.stack([pred_x - observed[0], pred_y - observed[1]])


def build_problem(lp: LibmvProblem, refine_intrinsics: Optional[bool] = None):
    """BuildProblem equivalent. refine_intrinsics default: image-space
    markers refine the shared intrinsics block; normalized-space hold it
    constant (libmv_bundle_adjuster.cc flag semantics). Returns
    (problem, cameras_2d, points_2d, intrinsics)."""
    if refine_intrinsics is None:
        refine_intrinsics = lp.is_image_space
    cams = np.ascontiguousarray(lp.cameras)
    pts = np.ascontiguousarray(lp.points)
    intr = np.ascontiguousarray(lp.intrinsics)
    p = Problem()
    cam_arr = p.add_parameter_block_array(cams)
    pt_arr = p.add_parameter_block_array(pts)
    intr_block = p.add_parameter_block(intr)
    if not refine_intrinsics:
        p.set_parameter_block_constant(intr)

    # One batched kind; the shared intrinsics block rides as a 1-element
    # array indexed by zeros.
    intr_arr = p.add_parameter_block_array(intr.reshape(1, INTRINSICS_SIZE))
    if not refine_intrinsics:
        p.set_parameter_block_array_constant(intr_arr)
    cost = AutoDiffCostFunction(
        libmv_reprojection_residual, 2, [6, 3, INTRINSICS_SIZE], name="libmv"
    )
    zeros = np.zeros(len(lp.marker_cam), np.int64)
    p.add_residual_block_batch(
        cost,
        None,
        [(cam_arr, lp.marker_cam), (pt_arr, lp.marker_pt), (intr_arr, zeros)],
        data=lp.markers,
    )
    # remove the unused scalar intrinsics block (bookkeeping only)
    p.remove_parameter_block(intr)
    return p, cams, pts, intr_arr.values
