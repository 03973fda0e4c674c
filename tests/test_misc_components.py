"""Tests for: denoising (FoE), capi, dumps, profiling, canned LLS problems,
explicit Schur complement, LossFunctionWrapper."""
import numpy as np
import pytest

import ceres_tpu as ct
from ceres_tpu import capi
from ceres_tpu.models import bal, denoising, test_problems
from ceres_tpu.utils.dump import (
    dump_linear_least_squares_problem,
    load_linear_least_squares_problem,
)
from ceres_tpu.utils.profiling import EventLogger, ExecutionSummary


def test_foe_file_and_loss():
    foe = denoising.read_foe_file("/root/reference/data/2x2.foe")
    assert foe.size == 2 and foe.num_filters == 3
    import jax.numpy as jnp

    loss = denoising.FoELoss(foe.alpha[0])
    r0, r1, r2 = loss.evaluate(jnp.asarray(2.0))
    np.testing.assert_allclose(float(r0), foe.alpha[0] * np.log(2.0))
    eps = 1e-6
    fd = (float(loss.evaluate(jnp.asarray(2.0 + eps))[0]) -
          float(loss.evaluate(jnp.asarray(2.0 - eps))[0])) / (2 * eps)
    np.testing.assert_allclose(float(r1), fd, rtol=1e-5)


def test_denoising_small_crop():
    foe = denoising.read_foe_file("/root/reference/data/2x2.foe")
    img = denoising.read_pgm("/root/reference/data/ceres_noisy.pgm")
    crop = img[:12, :12].copy()
    p, pixels = denoising.create_problem(foe, crop, sigma=20.0)
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.CGNR, max_num_iterations=10),
        p,
    )
    assert s.final_cost < s.initial_cost
    out = denoising.pixels_to_image(pixels)
    assert out.shape == crop.shape


def test_pgm_roundtrip(tmp_path):
    img = np.arange(42, dtype=np.float64).reshape(6, 7)
    denoising.write_pgm(tmp_path / "t.pgm", img)
    back = denoising.read_pgm(tmp_path / "t.pgm")
    np.testing.assert_allclose(back, img)


def test_capi_surface():
    import jax.numpy as jnp

    p = capi.ceres_create_problem()
    x = np.zeros(2)
    rid = capi.ceres_problem_add_residual_block(
        p, lambda v: v - jnp.asarray([1.0, 2.0]), 2, [2], [x],
        loss_function_name="huber", loss_function_parameter=1.0,
    )
    assert isinstance(rid, int)
    s = capi.ceres_solve(p, max_num_iterations=20)
    assert s.is_solution_usable()
    np.testing.assert_allclose(x, [1.0, 2.0], atol=1e-6)
    capi.ceres_free_problem(p)
    assert p.num_residual_blocks() == 0


def test_dump_roundtrip(tmp_path):
    J = np.asarray([[1.0, 0.0], [0.0, 2.0], [3.0, 4.0]])
    b = np.asarray([1.0, 2.0, 3.0])
    D = np.asarray([0.5, 0.6])
    base = dump_linear_least_squares_problem(tmp_path / "it_000", J, D=D, b=b)
    back = load_linear_least_squares_problem(base)
    np.testing.assert_allclose(back["J"], J)
    np.testing.assert_allclose(back["b"], b)
    np.testing.assert_allclose(back["D"], D)
    assert back["x"] is None


def test_iterations_to_dump_option(tmp_path):
    x = np.asarray([5.0])
    p = ct.Problem()
    p.add_residual_block(ct.AutoDiffCostFunction(lambda v: v - 1.0, 1, [1]), None, [x])
    opts = ct.Options(
        max_num_iterations=5,
        trust_region_minimizer_iterations_to_dump=[1, 2],
        trust_region_problem_dump_directory=str(tmp_path),
    )
    ct.solve(opts, p)
    assert (tmp_path / "ceres_tpu_iteration_001_A.txt").exists()
    assert (tmp_path / "ceres_tpu_iteration_002_b.txt").exists()


def test_execution_summary_and_event_logger():
    es = ExecutionSummary()
    with es.scoped_timer("foo"):
        pass
    with es.scoped_timer("foo"):
        pass
    assert es.num_calls("foo") == 2
    assert es.total_time("foo") >= 0.0
    assert "foo" in es.report()
    el = EventLogger("test")
    el.add_event("phase1")
    el.add_event("phase2")
    assert len(el.events) == 2


@pytest.mark.parametrize("pid", [0, 1, 2])
def test_canned_lls_problems_solvable(pid):
    prob = test_problems.create_linear_least_squares_problem(pid)
    from ceres_tpu.solvers.linear.dense import normal_cholesky_solve
    import jax.numpy as jnp

    y = normal_cholesky_solve(
        jnp.asarray(prob.J), jnp.asarray(prob.b), jnp.asarray(prob.D)
    )
    np.testing.assert_allclose(np.asarray(y), prob.x_expected, rtol=1e-10)


def test_explicit_schur_complement_matches_reference():
    def make():
        b = bal.synthetic_bal(num_cameras=6, num_points=50, visibility=0.6,
                              noise=0.05, seed=3)
        bp = bal.perturb(b, 0.01, 0.05, 0.05, seed=2)
        return bal.build_problem(bp)[0]

    ref = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.DENSE_SCHUR,
                   max_num_iterations=60),
        make(),
    )
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.ITERATIVE_SCHUR,
                   use_explicit_schur_complement=True, max_num_iterations=100),
        make(),
    )
    assert s.is_solution_usable()
    assert abs(s.final_cost - ref.final_cost) <= 1e-4 * max(1.0, ref.final_cost)


def test_loss_function_wrapper_swap():
    import jax.numpy as jnp

    wrapper = ct.LossFunctionWrapper(ct.HuberLoss(1.0))
    s = jnp.asarray(4.0)
    v1 = float(wrapper.evaluate(s)[0])
    wrapper.reset(None)  # trivial
    v2 = float(wrapper.evaluate(s)[0])
    assert v1 != v2 and v2 == 4.0


def test_libmv_reader_and_solve():
    import pathlib

    from ceres_tpu.models import libmv

    path = pathlib.Path("/root/reference/data/libmv-ba-problems/problem_01.bin")
    if not path.exists():
        import pytest

        pytest.skip("libmv data not available")
    lp = libmv.read_libmv_file(path)
    assert lp.is_image_space
    assert len(lp.cameras) == 333 and len(lp.points) == 26
    assert len(lp.markers) == 5421
    np.testing.assert_allclose(lp.intrinsics[0], 6313.19, rtol=1e-4)
    p, cams, pts, intr = libmv.build_problem(lp)
    s = ct.solve(
        ct.Options(linear_solver_type=ct.LinearSolverType.SPARSE_SCHUR,
                   max_num_iterations=12),
        p,
    )
    assert s.is_solution_usable()
    assert s.final_cost < s.initial_cost  # real refinement progress
