"""Rotation library tests (reference rotation_test.cc pattern: round trips,
consistency between representations, differentiability)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import rotation as rot


def random_quaternions(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def random_angle_axis(n, seed=1):
    rng = np.random.default_rng(seed)
    axis = rng.standard_normal((n, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    theta = rng.uniform(-np.pi + 1e-3, np.pi - 1e-3, (n, 1))
    return axis * theta


def test_angle_axis_quaternion_round_trip():
    aa = jnp.asarray(random_angle_axis(50))
    q = rot.angle_axis_to_quaternion(aa)
    aa2 = rot.quaternion_to_angle_axis(q)
    np.testing.assert_allclose(aa, aa2, atol=1e-12)


def test_quaternion_rotation_matrix_round_trip():
    q = jnp.asarray(random_quaternions(50))
    R = rot.quaternion_to_rotation_matrix(q)
    q2 = rot.rotation_matrix_to_quaternion(R)
    # q and -q are the same rotation.
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * q2, atol=1e-10)


def test_angle_axis_rotation_matrix_round_trip():
    aa = jnp.asarray(random_angle_axis(50))
    R = rot.angle_axis_to_rotation_matrix(aa)
    aa2 = rot.rotation_matrix_to_angle_axis(R)
    np.testing.assert_allclose(aa, aa2, atol=1e-10)


def test_rotation_matrices_are_orthonormal():
    aa = jnp.asarray(random_angle_axis(20))
    R = rot.angle_axis_to_rotation_matrix(aa)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


def test_rotate_point_consistency():
    aa = jnp.asarray(random_angle_axis(30))
    q = rot.angle_axis_to_quaternion(aa)
    R = rot.angle_axis_to_rotation_matrix(aa)
    pts = jnp.asarray(np.random.default_rng(3).standard_normal((30, 3)))
    p1 = rot.angle_axis_rotate_point(aa, pts)
    p2 = rot.unit_quaternion_rotate_point(q, pts)
    p3 = jnp.einsum("bij,bj->bi", R, pts)
    np.testing.assert_allclose(p1, p2, atol=1e-12)
    np.testing.assert_allclose(p1, p3, atol=1e-12)


def test_small_angle_rotate_point():
    aa = jnp.asarray([[1e-12, 0.0, 0.0], [0.0, 0.0, 0.0]])
    pts = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 2.0, 3.0]])
    out = rot.angle_axis_rotate_point(aa, pts)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(out[1], pts[1])


def test_quaternion_product_matches_matrix_product():
    q1 = jnp.asarray(random_quaternions(10, seed=5))
    q2 = jnp.asarray(random_quaternions(10, seed=6))
    q12 = rot.quaternion_product(q1, q2)
    R1 = rot.quaternion_to_rotation_matrix(q1)
    R2 = rot.quaternion_to_rotation_matrix(q2)
    R12 = rot.quaternion_to_rotation_matrix(q12)
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-12)


def test_rotate_point_is_differentiable_everywhere():
    # The Jet-replacement requirement: gradients must be finite incl. at 0.
    def f(aa):
        return jnp.sum(rot.angle_axis_rotate_point(aa, jnp.asarray([1.0, 2.0, 3.0])))

    for aa in [jnp.zeros(3), jnp.asarray([0.1, -0.2, 0.3])]:
        g = jax.grad(f)(aa)
        assert bool(jnp.all(jnp.isfinite(g))), aa


def test_angle_axis_to_quaternion_differentiable_at_zero():
    J = jax.jacfwd(rot.angle_axis_to_quaternion)(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(J)))
    # d(vector part)/d(aa) at 0 is I/2.
    np.testing.assert_allclose(J[1:, :], 0.5 * jnp.eye(3), atol=1e-12)


def test_euler_angles_orthonormal():
    e = jnp.asarray([[10.0, 20.0, 30.0], [0.0, 0.0, 0.0]])
    R = rot.euler_angles_to_rotation_matrix(e)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(R[1], jnp.eye(3), atol=1e-12)


def test_generalized_euler_round_trip_all_24_conventions():
    """euler_angles_to_rotation / rotation_matrix_to_euler_angles
    (rotation.h:221/253) round-trip on every one of the 24 conventions,
    with the mid-angle kept inside the branch's principal range."""
    from ceres_tpu import rotation as rot

    rng = np.random.default_rng(0)
    assert len(rot.EULER_CONVENTIONS) == 24
    for conv in rot.EULER_CONVENTIONS:
        proper = conv[-3] == conv[-1]
        for _ in range(3):
            t = rng.uniform(-1.2, 1.2, 3)
            if proper:
                t[1] = rng.uniform(0.1, 2.9)  # acos branch: (0, pi)
            R = np.asarray(rot.euler_angles_to_rotation(conv, t))
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-12), conv
            assert np.isclose(np.linalg.det(R), 1.0), conv
            back = np.asarray(rot.rotation_matrix_to_euler_angles(conv, R))
            np.testing.assert_allclose(back, t, atol=1e-10, err_msg=conv)


def test_generalized_euler_matches_explicit_composition():
    """Intrinsic = body-frame composition left-to-right; extrinsic =
    global-frame (reversed product); IntrinsicABC(t) == ExtrinsicCBA(t
    reversed)."""
    from ceres_tpu import rotation as rot

    rng = np.random.default_rng(1)
    t = rng.uniform(-1.0, 1.0, 3)
    Ri = np.asarray(rot.euler_angles_to_rotation("IntrinsicZYX", t))
    Re = np.asarray(rot.euler_angles_to_rotation("ExtrinsicXYZ", t[::-1]))
    np.testing.assert_allclose(Ri, Re, atol=1e-12)
    # aerospace yaw-pitch-roll check against the legacy degree helper
    deg = np.degrees(t)
    legacy = np.asarray(rot.euler_angles_to_rotation_matrix(jnp.asarray(deg)))
    assert legacy.shape == (3, 3)
