"""Rotation conversions, differentiable and batchable.

TPU-native equivalent of the reference's templated rotation library
(/root/reference/include/ceres/rotation.h:140-353). Where the reference
templates every function over Jets for forward-mode AD, here every function is
a plain jax-traceable function: `jax.jacfwd`/`grad`/`vmap` replace the Jet
machinery. Small-angle branches use the "double-where" trick so derivatives
stay finite at the branch point.

Quaternion convention: Hamilton, w-first ``[w, x, y, z]`` (as rotation.h).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _safe_sqrt_sum_sq(v, eps=0.0):
    s = jnp.sum(v * v, axis=-1, keepdims=True)
    # Avoid NaN grad at 0: sqrt'(0) is inf; branch handled by callers.
    safe = jnp.where(s > eps, s, 1.0)
    return jnp.sqrt(safe), s


def angle_axis_to_quaternion(angle_axis: Array) -> Array:
    """rotation.h AngleAxisToQuaternion."""
    theta, theta2 = _safe_sqrt_sum_sq(angle_axis)
    small = theta2 <= jnp.finfo(angle_axis.dtype).eps
    half = 0.5 * theta
    k_big = jnp.sin(half) / theta
    k = jnp.where(small, 0.5, k_big)
    w = jnp.where(small[..., 0], 1.0, jnp.cos(half)[..., 0])
    return jnp.concatenate([w[..., None], angle_axis * k], axis=-1)


def quaternion_to_angle_axis(q: Array) -> Array:
    """rotation.h QuaternionToAngleAxis."""
    q1, q2, q3 = q[..., 1], q[..., 2], q[..., 3]
    sin2 = q1 * q1 + q2 * q2 + q3 * q3
    small = sin2 <= jnp.finfo(q.dtype).eps
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, sin2))
    cos_theta = q[..., 0]
    # two_theta in (-2pi, 2pi]; pick shortest representation as reference does.
    two_theta = 2.0 * jnp.where(
        cos_theta < 0.0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k = jnp.where(small, 2.0, two_theta / sin_theta)
    return jnp.stack([q1 * k, q2 * k, q3 * k], axis=-1)


def quaternion_to_rotation_matrix(q: Array) -> Array:
    """rotation.h QuaternionToRotation (normalizes first)."""
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q * jax.lax.rsqrt(jnp.where(n > 0, n, 1.0))
    return unit_quaternion_to_rotation_matrix(q)


def unit_quaternion_to_rotation_matrix(q: Array) -> Array:
    """rotation.h QuaternionToScaledRotation body for a unit quaternion."""
    a, b, c, d = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    aa, ab, ac, ad = a * a, a * b, a * c, a * d
    bb, bc, bd = b * b, b * c, b * d
    cc, cd = c * c, c * d
    dd = d * d
    R = jnp.stack(
        [
            jnp.stack([aa + bb - cc - dd, 2 * (bc - ad), 2 * (ac + bd)], axis=-1),
            jnp.stack([2 * (ad + bc), aa - bb + cc - dd, 2 * (cd - ab)], axis=-1),
            jnp.stack([2 * (bd - ac), 2 * (ab + cd), aa - bb - cc + dd], axis=-1),
        ],
        axis=-2,
    )
    return R


def rotation_matrix_to_quaternion(R: Array) -> Array:
    """rotation.h RotationMatrixToQuaternion (row-major 3x3 -> [w,x,y,z]).

    Branchless Shepperd-style selection of the numerically best of the four
    classic formulas, expressed with jnp.where for XLA.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        t = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-30))
        s = 0.5 / t
        return jnp.stack([0.5 * t, (m21 - m12) * s, (m02 - m20) * s, (m10 - m01) * s], -1)

    def case_x():
        t = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-30))
        s = 0.5 / t
        return jnp.stack([(m21 - m12) * s, 0.5 * t, (m01 + m10) * s, (m02 + m20) * s], -1)

    def case_y():
        t = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-30))
        s = 0.5 / t
        return jnp.stack([(m02 - m20) * s, (m01 + m10) * s, 0.5 * t, (m12 + m21) * s], -1)

    def case_z():
        t = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-30))
        s = 0.5 / t
        return jnp.stack([(m10 - m01) * s, (m02 + m20) * s, (m12 + m21) * s, 0.5 * t], -1)

    qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
    use_w = tr > 0.0
    x_best = (m00 >= m11) & (m00 >= m22)
    y_best = (~x_best) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None],
        qw,
        jnp.where(x_best[..., None], qx, jnp.where(y_best[..., None], qy, qz)),
    )
    return q


def angle_axis_to_rotation_matrix(angle_axis: Array) -> Array:
    """rotation.h AngleAxisToRotationMatrix (Rodrigues)."""
    theta, theta2 = _safe_sqrt_sum_sq(angle_axis)
    eps = jnp.finfo(angle_axis.dtype).eps
    small = theta2[..., 0] <= eps
    axis = angle_axis / jnp.where(theta2 > eps, theta, 1.0)
    wx, wy, wz = axis[..., 0], axis[..., 1], axis[..., 2]
    ct = jnp.cos(theta[..., 0])
    st = jnp.sin(theta[..., 0])
    one_ct = 1.0 - ct
    R_big = jnp.stack(
        [
            jnp.stack([ct + wx * wx * one_ct, wx * wy * one_ct - wz * st, wy * st + wx * wz * one_ct], -1),
            jnp.stack([wz * st + wx * wy * one_ct, ct + wy * wy * one_ct, -wx * st + wy * wz * one_ct], -1),
            jnp.stack([-wy * st + wx * wz * one_ct, wx * st + wy * wz * one_ct, ct + wz * wz * one_ct], -1),
        ],
        -2,
    )
    # Near theta=0: R = I + [w]_x (first-order), as the reference's small branch.
    ax, ay, az = angle_axis[..., 0], angle_axis[..., 1], angle_axis[..., 2]
    one = jnp.ones_like(ax)
    R_small = jnp.stack(
        [
            jnp.stack([one, -az, ay], -1),
            jnp.stack([az, one, -ax], -1),
            jnp.stack([-ay, ax, one], -1),
        ],
        -2,
    )
    return jnp.where(small[..., None, None], R_small, R_big)


def rotation_matrix_to_angle_axis(R: Array) -> Array:
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(R))


def quaternion_product(z: Array, w: Array) -> Array:
    """rotation.h QuaternionProduct: zw = z * w, [w,x,y,z] convention."""
    z0, z1, z2, z3 = z[..., 0], z[..., 1], z[..., 2], z[..., 3]
    w0, w1, w2, w3 = w[..., 0], w[..., 1], w[..., 2], w[..., 3]
    return jnp.stack(
        [
            z0 * w0 - z1 * w1 - z2 * w2 - z3 * w3,
            z0 * w1 + z1 * w0 + z2 * w3 - z3 * w2,
            z0 * w2 - z1 * w3 + z2 * w0 + z3 * w1,
            z0 * w3 + z1 * w2 - z2 * w1 + z3 * w0,
        ],
        -1,
    )


def quaternion_conjugate(q: Array) -> Array:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def unit_quaternion_rotate_point(q: Array, pt: Array) -> Array:
    """rotation.h UnitQuaternionRotatePoint; 2-cross-product formulation
    (cheaper on VPU than building R)."""
    w = q[..., :1]
    v = q[..., 1:]
    uv = jnp.cross(v, pt)
    uuv = jnp.cross(v, uv)
    return pt + 2.0 * (w * uv + uuv)


def quaternion_rotate_point(q: Array, pt: Array) -> Array:
    """rotation.h QuaternionRotatePoint (normalizes first)."""
    n = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q * jax.lax.rsqrt(jnp.where(n > 0, n, 1.0))
    return unit_quaternion_rotate_point(q, pt)


def angle_axis_rotate_point(angle_axis: Array, pt: Array) -> Array:
    """rotation.h AngleAxisRotatePoint (Rodrigues on a point)."""
    theta, theta2 = _safe_sqrt_sum_sq(angle_axis)
    eps = jnp.finfo(angle_axis.dtype).eps
    small = theta2[..., 0] <= eps
    w = angle_axis / jnp.where(theta2 > eps, theta, 1.0)
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    w_cross_pt = jnp.cross(w, pt)
    w_dot_pt = jnp.sum(w * pt, axis=-1, keepdims=True)
    big = pt * ct + w_cross_pt * st + w * (w_dot_pt * (1.0 - ct))
    # Small-angle: pt + aa x pt (first order, matches reference).
    small_val = pt + jnp.cross(angle_axis, pt)
    return jnp.where(small[..., None], small_val, big)


def euler_angles_to_rotation_matrix(euler_deg: Array) -> Array:
    """rotation.h EulerAnglesToRotationMatrix: (pitch, roll, yaw) in degrees,
    R = R_z(yaw? ) — reference uses aerospace sequence R = R_z R_y R_x with
    angles given as (x=roll? ) — it composes about Z, Y, X with degrees input."""
    rad = euler_deg * (jnp.pi / 180.0)
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2]
    s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2]
    # Matches EulerAnglesToRotationMatrix layout in rotation.h.
    return jnp.stack(
        [
            jnp.stack([c1 * c2, -s1 * c3 + c1 * s2 * s3, s1 * s3 + c1 * s2 * c3], -1),
            jnp.stack([s1 * c2, c1 * c3 + s1 * s2 * s3, -c1 * s3 + s1 * s2 * c3], -1),
            jnp.stack([-s2, c2 * s3, c2 * c3], -1),
        ],
        -2,
    )


def cross_product_matrix(v: Array) -> Array:
    """[v]_x skew-symmetric matrix (rotation.h CrossProduct helper analog)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], -1),
            jnp.stack([v[..., 2], z, -v[..., 0]], -1),
            jnp.stack([-v[..., 1], v[..., 0], z], -1),
        ],
        -2,
    )


# ---------------------------------------------------------------------------
# Generalized Euler-angle conventions (rotation.h:214-353 EulerAnglesToRotation
# / RotationMatrixToEulerAngles over include/ceres/internal/euler_angles.h's
# 24 EulerSystem tags). Convention strings mirror the reference tags:
# "IntrinsicZYX", "ExtrinsicXYX", ... Angles are RADIANS, ordered by the
# axis sequence. All functions are jnp-differentiable and vmap-friendly.
# ---------------------------------------------------------------------------

_EULER_AXES = {"X": 0, "Y": 1, "Z": 2}


def _parse_euler_convention(convention: str):
    c = convention.strip()
    if c.startswith("Intrinsic"):
        intrinsic, seq = True, c[len("Intrinsic"):]
    elif c.startswith("Extrinsic"):
        intrinsic, seq = False, c[len("Extrinsic"):]
    else:
        raise ValueError(
            f"convention must start with Intrinsic/Extrinsic: {convention}")
    if len(seq) != 3 or any(a not in _EULER_AXES for a in seq):
        raise ValueError(f"bad axis sequence {seq!r}")
    axes = tuple(_EULER_AXES[a] for a in seq)
    if axes[0] == axes[1] or axes[1] == axes[2]:
        raise ValueError(f"consecutive axes must differ: {seq!r}")
    return intrinsic, axes


def _axis_rotation(axis: int, theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    i, j = (axis + 1) % 3, (axis + 2) % 3
    R = jnp.zeros((3, 3), dtype=jnp.result_type(theta, float))
    R = R.at[axis, axis].set(1.0)
    R = R.at[i, i].set(c).at[j, j].set(c)
    R = R.at[i, j].set(-s).at[j, i].set(s)
    return R


def _is_even(i, j, k):
    return (i, j, k) in ((0, 1, 2), (1, 2, 0), (2, 0, 1))


def euler_angles_to_rotation(convention: str, angles: Array) -> Array:
    """Rotation matrix for any of the 24 Euler conventions
    (EulerAnglesToRotation, rotation.h:221). Intrinsic sequences rotate in
    the body frame (R = R_a1(t1) R_a2(t2) R_a3(t3)); extrinsic in the
    global frame (R = R_a3(t3) R_a2(t2) R_a1(t1))."""
    intrinsic, (a1, a2, a3) = _parse_euler_convention(convention)
    angles = jnp.asarray(angles)
    t1, t2, t3 = angles[0], angles[1], angles[2]
    if intrinsic:
        return _axis_rotation(a1, t1) @ _axis_rotation(a2, t2) @ \
            _axis_rotation(a3, t3)
    return _axis_rotation(a3, t3) @ _axis_rotation(a2, t2) @ \
        _axis_rotation(a1, t1)


def rotation_matrix_to_euler_angles(convention: str, R: Array) -> Array:
    """Inverse of euler_angles_to_rotation (RotationMatrixToEulerAngles,
    rotation.h:253): angles in radians ordered by the axis sequence.
    Tait-Bryan extraction via the Shoemake index formulas; proper Euler
    (repeated first/last axis) via the acos mid-angle branch."""
    intrinsic, axes = _parse_euler_convention(convention)
    R = jnp.asarray(R)
    if not intrinsic:
        # Extrinsic(a1 a2 a3)(t1,t2,t3) == Intrinsic(a3 a2 a1)(t3,t2,t1)
        i, j, k = axes[2], axes[1], axes[0]
    else:
        i, j, k = axes
    if i != k:  # Tait-Bryan
        e = 1.0 if _is_even(i, j, k) else -1.0
        t2 = jnp.arcsin(jnp.clip(e * R[i, k], -1.0, 1.0))
        t1 = jnp.arctan2(-e * R[j, k], R[k, k])
        t3 = jnp.arctan2(-e * R[i, j], R[i, i])
    else:  # proper Euler: i == k, free axis l
        l = 3 - i - j
        e = 1.0 if _is_even(i, j, l) else -1.0
        t2 = jnp.arccos(jnp.clip(R[i, i], -1.0, 1.0))
        t1 = jnp.arctan2(R[j, i], -e * R[l, i])
        t3 = jnp.arctan2(R[i, j], e * R[i, l])
    out = jnp.stack([t1, t2, t3])
    return out[::-1] if not intrinsic else out


EULER_CONVENTIONS = tuple(
    f"{frame}{a}{b}{c}"
    for frame in ("Intrinsic", "Extrinsic")
    for a in "XYZ" for b in "XYZ" for c in "XYZ"
    if a != b and b != c
)
