"""Manifolds: tangent-space parameterizations, batched and differentiable.

TPU-native re-design of the reference's manifold layer
(/root/reference/include/ceres/manifold.h:148-221 for the interface;
implementations at manifold.h:311 SubsetManifold, :360 QuaternionManifold,
:384 EigenQuaternionManifold, product_manifold.h, sphere_manifold.h,
line_manifold.h, autodiff_manifold.h).

Design: every manifold is a pytree-friendly object exposing jax-traceable
``plus/minus`` on a *single* block; the evaluator vmaps them over all blocks
sharing the manifold. ``plus_jacobian``/``minus_jacobian`` default to
forward-mode autodiff of plus/minus at delta=0 — the role AutoDiffManifold's
Jet templates play in the reference — with closed forms where they are cheap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import rotation

Array = jax.Array


def _atan2_over_s(s2, c):
    """atan2(sqrt(s2), c)/sqrt(s2), with the Taylor limit 1/c - s2/(3c^3) in
    the s2->0 branch so jacfwd is exact at the branch point (for c>0)."""
    eps = jnp.finfo(jnp.float64).eps
    small = s2 <= eps
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    exact = jnp.arctan2(s, c) / s
    safe_c = jnp.where(c == 0, 1.0, c)
    taylor = 1.0 / safe_c - s2 / (3.0 * safe_c**3)
    return jnp.where(small, taylor, exact)


class Manifold:
    """Interface mirroring manifold.h:148-221 semantics.

    plus(x, delta) -> x_plus_delta          (ambient, tangent) -> ambient
    minus(y, x)    -> y_minus_x             (ambient, ambient) -> tangent
    plus_jacobian(x)  -> (ambient, tangent) = d/ddelta plus(x, delta)|_{delta=0}
    minus_jacobian(x) -> (tangent, ambient) = d/dy minus(y, x)|_{y=x}
    """

    ambient_size: int
    tangent_size: int

    def plus(self, x: Array, delta: Array) -> Array:
        raise NotImplementedError

    def minus(self, y: Array, x: Array) -> Array:
        raise NotImplementedError

    def plus_jacobian(self, x: Array) -> Array:
        zero = jnp.zeros((self.tangent_size,), dtype=x.dtype)
        return jax.jacfwd(lambda d: self.plus(x, d))(zero)

    def minus_jacobian(self, x: Array) -> Array:
        return jax.jacfwd(lambda y: self.minus(y, x))(x)

    # -- rows-form PlusJacobian for the fused evaluation kernel ---------
    # (ops/pallas_kernels.eval_fused, the jt-mode chain rule: instead of
    # multiplying J_ambient by PlusJacobian after the fact —
    # residual_block.cc:70-196 — the kernel feeds PlusJacobian's columns
    # as jvp tangents, so the emitted lanes ARE tangent-space.)

    #: True when plus_jacobian_columns_rows is implemented with
    #: Mosaic-lowerable ops (sublane slices/concat/elementwise only).
    supports_rows_columns = False

    def plus_jacobian_columns_rows(self, x_rows):
        """Column d of PlusJacobian(x) for every row at once: x_rows is
        the block states in TRANSPOSED row form (>= ambient_size, rows);
        returns a list of tangent_size arrays (ambient_size, rows), or
        None when unsupported. Must be traceable inside a Pallas TPU
        kernel body."""
        return None

    # Key used to batch blocks: manifolds that compare equal may be vmapped
    # together. Default: identity-based (each instance its own group).
    def batch_key(self):
        return (type(self).__name__, id(self))

    def __repr__(self):
        return f"{type(self).__name__}(ambient={self.ambient_size}, tangent={self.tangent_size})"


class EuclideanManifold(Manifold):
    """Trivial manifold: plus = x + delta (manifold.h EuclideanManifold)."""

    def __init__(self, size: int):
        self.ambient_size = size
        self.tangent_size = size

    def plus(self, x, delta):
        return x + delta

    def minus(self, y, x):
        return y - x

    def plus_jacobian(self, x):
        return jnp.eye(self.ambient_size, dtype=x.dtype)

    def minus_jacobian(self, x):
        return jnp.eye(self.ambient_size, dtype=x.dtype)

    supports_rows_columns = True

    def plus_jacobian_columns_rows(self, x_rows):
        n, rows = self.ambient_size, x_rows.shape[1]
        iot = jax.lax.broadcasted_iota(jnp.int32, (n, rows), 0)
        one = jnp.ones((), x_rows.dtype)
        zero = jnp.zeros((), x_rows.dtype)
        return [jnp.where(iot == d, one, zero) for d in range(n)]

    def batch_key(self):
        return ("Euclidean", self.ambient_size)


class SubsetManifold(Manifold):
    """Holds a subset of coordinates constant (manifold.h:311).

    TPU-native: a constant 0/1 selection matrix instead of index loops, so the
    chain rule is one small matmul that XLA folds into the Jacobian einsum.
    """

    def __init__(self, size: int, constant_indices):
        self.ambient_size = size
        self.constant_indices = tuple(sorted(int(i) for i in constant_indices))
        if len(set(self.constant_indices)) != len(self.constant_indices):
            raise ValueError("duplicate constant indices")
        for i in self.constant_indices:
            if not (0 <= i < size):
                raise ValueError(f"constant index {i} out of range [0,{size})")
        free = [i for i in range(size) if i not in self.constant_indices]
        self._free = np.asarray(free, dtype=np.int32)
        self.tangent_size = len(free)
        sel = np.zeros((size, self.tangent_size))
        sel[self._free, np.arange(self.tangent_size)] = 1.0
        self._sel = sel  # (ambient, tangent)

    def plus(self, x, delta):
        return x + jnp.asarray(self._sel, dtype=x.dtype) @ delta

    def minus(self, y, x):
        return jnp.asarray(self._sel.T, dtype=x.dtype) @ (y - x)

    def plus_jacobian(self, x):
        return jnp.asarray(self._sel, dtype=x.dtype)

    def minus_jacobian(self, x):
        return jnp.asarray(self._sel.T, dtype=x.dtype)

    supports_rows_columns = True

    def plus_jacobian_columns_rows(self, x_rows):
        rows = x_rows.shape[1]
        iot = jax.lax.broadcasted_iota(
            jnp.int32, (self.ambient_size, rows), 0)
        one = jnp.ones((), x_rows.dtype)
        zero = jnp.zeros((), x_rows.dtype)
        return [jnp.where(iot == int(a), one, zero) for a in self._free]

    def batch_key(self):
        return ("Subset", self.ambient_size, self.constant_indices)


class QuaternionManifold(Manifold):
    """Unit quaternion [w,x,y,z]; delta is an angle-axis-like 3-vector with
    angle |delta| (manifold.h:360; math in internal/ceres/manifold.cc:14-103).
    """

    ambient_size = 4
    tangent_size = 3

    def _to_wxyz(self, q):
        return q

    def _from_wxyz(self, q):
        return q

    def plus(self, x, delta):
        norm2 = jnp.sum(delta * delta)
        safe = jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0))
        sin_by = jnp.where(norm2 > 0, jnp.sin(safe) / safe, 1.0)
        q_delta = jnp.concatenate(
            [jnp.where(norm2 > 0, jnp.cos(safe), 1.0)[None], sin_by * delta]
        )
        xq = self._to_wxyz(x)
        return self._from_wxyz(rotation.quaternion_product(q_delta, xq))

    def minus(self, y, x):
        yq = self._to_wxyz(y)
        xq = self._to_wxyz(x)
        d = rotation.quaternion_product(yq, rotation.quaternion_conjugate(xq))
        u = d[1:]
        w = d[0]
        # k = atan2(|u|, w)/|u| with a Taylor branch at |u|->0 so forward-mode
        # AD through the log map is exact at the identity (Jet parity).
        k = _atan2_over_s(jnp.sum(u * u), w)
        return k * u

    def plus_jacobian(self, x):
        w, qx, qy, qz = self._to_wxyz(x)
        J = jnp.array(
            [[-qx, -qy, -qz], [w, qz, -qy], [-qz, w, qx], [qy, -qx, w]],
            dtype=x.dtype,
        )
        # Reorder rows back to this manifold's storage order.
        return self._reorder_ambient_rows(J)

    def minus_jacobian(self, x):
        w, qx, qy, qz = self._to_wxyz(x)
        J = jnp.array(
            [[-qx, w, -qz, qy], [-qy, qz, w, -qx], [-qz, -qy, qx, w]],
            dtype=x.dtype,
        )
        return self._reorder_ambient_cols(J)

    def _reorder_ambient_rows(self, J):
        return J

    def _reorder_ambient_cols(self, J):
        return J

    supports_rows_columns = True

    #: storage order -> [w, x, y, z] index map (Eigen overrides)
    _WXYZ_IDX = (0, 1, 2, 3)

    def plus_jacobian_columns_rows(self, x_rows):
        sl = [x_rows[i:i + 1, :] for i in range(4)]
        w, qx, qy, qz = (sl[self._WXYZ_IDX[0]], sl[self._WXYZ_IDX[1]],
                         sl[self._WXYZ_IDX[2]], sl[self._WXYZ_IDX[3]])
        cols_wxyz = [[-qx, w, -qz, qy],
                     [-qy, qz, w, -qx],
                     [-qz, -qy, qx, w]]
        inv = np.argsort(np.asarray(self._WXYZ_IDX))
        return [jnp.concatenate([col[int(inv[i])] for i in range(4)],
                                axis=0)
                for col in cols_wxyz]

    def batch_key(self):
        return ("Quaternion",)


class EigenQuaternionManifold(QuaternionManifold):
    """Same manifold with Eigen storage order [x,y,z,w] (manifold.h:384)."""

    _PERM = np.array([3, 0, 1, 2])  # storage -> wxyz

    def _to_wxyz(self, q):
        return q[..., jnp.asarray(self._PERM)]

    def _from_wxyz(self, q):
        inv = np.argsort(self._PERM)
        return q[..., jnp.asarray(inv)]

    def _reorder_ambient_rows(self, J):
        inv = np.argsort(self._PERM)
        return J[jnp.asarray(inv), :]

    def _reorder_ambient_cols(self, J):
        inv = np.argsort(self._PERM)
        return J[:, jnp.asarray(inv)]

    _WXYZ_IDX = (3, 0, 1, 2)  # storage [x,y,z,w] -> wxyz

    def batch_key(self):
        return ("EigenQuaternion",)


def _householder_vector(x):
    """Householder vector v (v[-1]=1) and beta such that
    (I - beta v v^T) x = ||x|| e_last; mirrors
    internal/ceres/householder_vector.h:48-82 (Golub 5.1.1, last-elt pivot)."""
    n = x.shape[0]
    sigma = jnp.sum(x[:-1] * x[:-1])
    x_pivot = x[-1]
    trivial = sigma <= jnp.finfo(jnp.float64).eps
    mu = jnp.sqrt(x_pivot * x_pivot + jnp.where(trivial, 0.0, sigma))
    v_pivot = jnp.where(x_pivot <= 0.0, x_pivot - mu, -sigma / (x_pivot + mu))
    safe_v_pivot = jnp.where(trivial, 1.0, v_pivot)
    beta = jnp.where(
        trivial,
        jnp.where(x_pivot < 0.0, 2.0, 0.0),
        2.0 * safe_v_pivot * safe_v_pivot / (sigma + safe_v_pivot * safe_v_pivot),
    )
    head = jnp.where(trivial, x[:-1], x[:-1] / safe_v_pivot)
    v = jnp.concatenate([head, jnp.ones((1,), x.dtype)])
    return v, beta


class SphereManifold(Manifold):
    """Vector on the (n-1)-sphere of radius ||x|| (sphere_manifold.h:86).

    Tangent step via exp map in the Householder frame of x. Jacobians come
    from autodiff of plus/minus (safe-where branches keep them exact at 0).
    """

    def __init__(self, size: int):
        if size < 2:
            raise ValueError("SphereManifold needs ambient size >= 2")
        self.ambient_size = size
        self.tangent_size = size - 1

    def plus(self, x, delta):
        v, beta = _householder_vector(x)
        norm2 = jnp.sum(delta * delta)
        safe = jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0))
        sin_by = jnp.where(norm2 > 0, jnp.sin(safe) / safe, 1.0)
        norm_x = jnp.sqrt(jnp.sum(x * x))
        y = jnp.concatenate([sin_by * delta, jnp.where(norm2 > 0, jnp.cos(safe), 1.0)[None]])
        # Apply Householder reflection H = I - beta v v^T, then scale. The
        # reflection maps e_last to -x/||x|| (up to sign), matching the
        # reference's ApplyHouseholderVector use.
        hy = y - beta * v * jnp.dot(v, y)
        return norm_x * hy

    def minus(self, y, x):
        v, beta = _householder_vector(x)
        nx = jnp.sqrt(jnp.sum(x * x))
        hy = (y - beta * v * jnp.dot(v, y)) / jnp.where(nx > 0, nx, 1.0)
        u = hy[:-1]
        w = hy[-1]
        return _atan2_over_s(jnp.sum(u * u), w) * u

    def batch_key(self):
        return ("Sphere", self.ambient_size)


class LineManifold(Manifold):
    """Line in R^n as (origin, direction-on-sphere) (line_manifold.h:76).

    Ambient = 2n (origin then direction); tangent = 2(n-1)... reference uses
    tangent = n-1 for direction plus n... — here: tangent size 2n-2:
    (n-1) for origin moves orthogonal to direction? The reference uses
    tangent (n-1) + (n-1). Origin moves in the hyperplane orthogonal to the
    direction, direction moves on the sphere, both via the direction's
    Householder frame.
    """

    def __init__(self, n: int):
        if n < 2:
            raise ValueError("LineManifold needs spatial dim >= 2")
        self.n = n
        self.ambient_size = 2 * n
        self.tangent_size = 2 * (n - 1)

    def plus(self, x, delta):
        n = self.n
        origin, direction = x[:n], x[n:]
        do, dd = delta[: n - 1], delta[n - 1 :]
        v, beta = _householder_vector(direction)
        # Origin moves in the tangent hyperplane of the direction.
        y_o = jnp.concatenate([do, jnp.zeros((1,), x.dtype)])
        ho = y_o - beta * v * jnp.dot(v, y_o)
        new_origin = origin + ho
        # Direction moves on the unit sphere (exp map).
        norm2 = jnp.sum(dd * dd)
        safe = jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0))
        sin_by = jnp.where(norm2 > 0, jnp.sin(safe) / safe, 1.0)
        nd = jnp.sqrt(jnp.sum(direction * direction))
        y_d = jnp.concatenate([sin_by * dd, jnp.where(norm2 > 0, jnp.cos(safe), 1.0)[None]])
        hd = y_d - beta * v * jnp.dot(v, y_d)
        new_direction = nd * hd
        return jnp.concatenate([new_origin, new_direction])

    def minus(self, y, x):
        n = self.n
        origin_x, dir_x = x[:n], x[n:]
        origin_y, dir_y = y[:n], y[n:]
        v, beta = _householder_vector(dir_x)
        diff = origin_y - origin_x
        hdiff = diff - beta * v * jnp.dot(v, diff)
        t_origin = hdiff[: n - 1]
        ndx = jnp.sqrt(jnp.sum(dir_x * dir_x))
        hy = (dir_y - beta * v * jnp.dot(v, dir_y)) / jnp.where(ndx > 0, ndx, 1.0)
        u = hy[:-1]
        w = hy[-1]
        t_dir = _atan2_over_s(jnp.sum(u * u), w) * u
        return jnp.concatenate([t_origin, t_dir])

    def batch_key(self):
        return ("Line", self.n)


class ProductManifold(Manifold):
    """Cartesian product of manifolds (product_manifold.h:274-LoC header)."""

    def __init__(self, *manifolds: Manifold):
        if not manifolds:
            raise ValueError("ProductManifold needs at least one factor")
        self.manifolds = tuple(manifolds)
        self.ambient_size = sum(m.ambient_size for m in manifolds)
        self.tangent_size = sum(m.tangent_size for m in manifolds)
        self._asplit = np.cumsum([m.ambient_size for m in manifolds])[:-1]
        self._tsplit = np.cumsum([m.tangent_size for m in manifolds])[:-1]

    def plus(self, x, delta):
        xs = jnp.split(x, self._asplit)
        ds = jnp.split(delta, self._tsplit)
        return jnp.concatenate([m.plus(xi, di) for m, xi, di in zip(self.manifolds, xs, ds)])

    def minus(self, y, x):
        ys = jnp.split(y, self._asplit)
        xs = jnp.split(x, self._asplit)
        return jnp.concatenate([m.minus(yi, xi) for m, yi, xi in zip(self.manifolds, ys, xs)])

    def plus_jacobian(self, x):
        xs = jnp.split(x, self._asplit)
        blocks = [m.plus_jacobian(xi) for m, xi in zip(self.manifolds, xs)]
        return jax.scipy.linalg.block_diag(*blocks)

    def minus_jacobian(self, x):
        xs = jnp.split(x, self._asplit)
        blocks = [m.minus_jacobian(xi) for m, xi in zip(self.manifolds, xs)]
        return jax.scipy.linalg.block_diag(*blocks)

    @property
    def supports_rows_columns(self):
        return all(m.supports_rows_columns for m in self.manifolds)

    def plus_jacobian_columns_rows(self, x_rows):
        rows = x_rows.shape[1]
        dt = x_rows.dtype
        cols = []
        a_off = 0
        for m in self.manifolds:
            sub = m.plus_jacobian_columns_rows(
                x_rows[a_off:a_off + m.ambient_size, :])
            if sub is None:
                return None
            top = a_off
            bot = self.ambient_size - a_off - m.ambient_size
            for c in sub:
                parts = []
                if top:
                    parts.append(jnp.zeros((top, rows), dt))
                parts.append(c)
                if bot:
                    parts.append(jnp.zeros((bot, rows), dt))
                cols.append(jnp.concatenate(parts, axis=0))
            a_off += m.ambient_size
        return cols

    def batch_key(self):
        return ("Product",) + tuple(m.batch_key() for m in self.manifolds)


class AutoDiffManifold(Manifold):
    """User supplies jax-traceable plus/minus; Jacobians by forward-mode AD
    (autodiff_manifold.h equivalent — trivial here since AD is ambient)."""

    def __init__(self, plus_fn, minus_fn, ambient_size: int, tangent_size: int):
        self._plus = plus_fn
        self._minus = minus_fn
        self.ambient_size = ambient_size
        self.tangent_size = tangent_size

    def plus(self, x, delta):
        return self._plus(x, delta)

    def minus(self, y, x):
        return self._minus(y, x)

    def batch_key(self):
        return ("AutoDiff", id(self._plus), id(self._minus))
