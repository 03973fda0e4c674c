"""Numerical failure handling (SURVEY.md §5.3): NaN/Inf residuals, invalid
steps, consecutive-invalid-step limits, time termination."""
import jax.numpy as jnp
import numpy as np

import ceres_tpu as ct


def test_nan_residual_at_start_fails_cleanly():
    x = np.asarray([1.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.sqrt(v[0] - 10.0), 1, [1]), None, [x]
    )  # sqrt of negative -> NaN at x=1
    s = ct.solve(ct.Options(max_num_iterations=10), p)
    assert s.termination_type == ct.TerminationType.FAILURE
    assert "evaluation failed" in s.message.lower() or "failed" in s.message.lower()


def test_candidate_nan_treated_as_infinite_cost():
    # Cost is valid at start but a big step would go NaN; the solver must
    # reject such steps and still converge (trust_region_minimizer.cc:
    # ComputeCandidatePointAndEvaluateCost semantics).
    x = np.asarray([4.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.log(v[0]) - 1.0, 1, [1]), None, [x]
    )  # log undefined for v <= 0
    s = ct.solve(ct.Options(max_num_iterations=100), p)
    assert s.termination_type == ct.TerminationType.CONVERGENCE
    np.testing.assert_allclose(x[0], np.e, rtol=1e-5)


def test_max_solver_time_termination():
    import sys

    sys.path.insert(0, "tests")
    from test_solver import make_powell

    p, _ = make_powell()
    s = ct.solve(
        ct.Options(max_num_iterations=100000, max_solver_time_in_seconds=0.0), p
    )
    assert s.termination_type == ct.TerminationType.NO_CONVERGENCE
    assert "time" in s.message.lower()


def test_min_trust_region_radius_termination():
    # An always-invalid model (zero jacobian but nonzero residual) shrinks
    # the radius until the min-radius convergence check fires.
    x = np.asarray([1.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: v * 0.0 + 3.0, 1, [1]), None, [x]
    )
    s = ct.solve(ct.Options(max_num_iterations=500), p)
    # zero gradient => immediate gradient-tolerance convergence
    assert s.termination_type == ct.TerminationType.CONVERGENCE


def test_linear_solver_failure_retries_then_fails():
    # A rank-deficient Jacobian with Cholesky: the normal equations are
    # singular at radius=inf-like; LM regularization must still solve it.
    x = np.asarray([1.0, 1.0])
    p = ct.Problem()
    p.add_residual_block(
        ct.AutoDiffCostFunction(lambda v: jnp.atleast_1d(v[0] + v[1] - 2.0), 1, [2]),
        None,
        [x],
    )
    s = ct.solve(
        ct.Options(
            linear_solver_type=ct.LinearSolverType.DENSE_NORMAL_CHOLESKY,
            max_num_iterations=50,
        ),
        p,
    )
    assert s.is_solution_usable()
    assert abs(float(x[0] + x[1]) - 2.0) < 1e-8


def test_summary_counts_consistent():
    import sys

    sys.path.insert(0, "tests")
    from test_solver import make_powell

    p, _ = make_powell()
    s = ct.solve(ct.Options(max_num_iterations=100), p)
    assert s.num_successful_steps >= 1
    assert len(s.iterations) == s.num_successful_steps + s.num_unsuccessful_steps
    assert s.iterations[-1].cumulative_time_in_seconds >= 0
