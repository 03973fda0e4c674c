"""More-Garbow-Hillstrom corpus (examples/more_garbow_hillstrom.cc
patterns): >= 4 relative log digits on the certified sum of squares."""
import pytest

from ceres_tpu.models import mgh

# Known non-reaching cases from the standard start under the reference's
# 1000-iteration budget: #2 converges to the classic local minimum
# f = 48.9843, #16 (Brown-Dennis) is a slow LM crawl (radius equilibrium
# at rel_decrease ~ 0.5) — it DOES reach the optimum with
# use_nonmonotonic_steps (see test_brown_dennis_nonmonotonic) or a 5000
# iteration budget; the default-config fail is an LM property, not a bug.
_UNCONSTRAINED_EXPECTED_FAIL = {2, 16}
# Constrained: all certified problems reach the optimum — the active-set
# step restriction (solvers/trust_region.py:_update_effective_scale)
# avoids the KKT-point traps that pure clip-projection (the reference's
# approach, its own issue 187) falls into.
_CONSTRAINED_EXPECTED_FAIL = set()


@pytest.mark.parametrize("p", mgh.PROBLEMS, ids=lambda p: f"{p.number}-{p.name}")
def test_unconstrained_trial0(p):
    ok, achieved, _ = mgh.solve_problem(p, constrained=False, trial=0)
    if p.number in _UNCONSTRAINED_EXPECTED_FAIL:
        return  # documented non-reaching case
    assert ok, f"MGH {p.number} reached 2*cost={achieved}"


@pytest.mark.parametrize(
    "p",
    [q for q in mgh.PROBLEMS if q.constrained_optimal_cost is not None],
    ids=lambda p: f"{p.number}-{p.name}",
)
def test_constrained_trial0(p):
    ok, achieved, s = mgh.solve_problem(p, constrained=True, trial=0)
    if p.number in _CONSTRAINED_EXPECTED_FAIL:
        assert s.is_solution_usable()
        return
    assert ok, f"MGH {p.number} constrained reached 2*cost={achieved}"


def test_freudenstein_roth_local_minimum():
    """#2 lands on the documented local minimum f = 48.9843."""
    ok, achieved, _ = mgh.solve_problem(mgh.PROBLEMS[1], False, 0)
    assert not ok
    assert abs(achieved - 48.9843) < 1e-3


def test_brown_dennis_nonmonotonic():
    """#16 reaches the certified optimum once the step evaluator allows
    non-monotonic steps (Conn/Gould/Toint 10.1.2) — the slow-crawl radius
    equilibrium of plain LM is escaped."""
    p16 = [q for q in mgh.PROBLEMS if q.number == 16][0]
    ok, achieved, _ = mgh.solve_problem(
        p16, constrained=False, trial=0,
        options_overrides={"use_nonmonotonic_steps": True})
    assert ok, f"2f = {achieved}"
