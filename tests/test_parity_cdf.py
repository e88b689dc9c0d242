"""Smoke tests for the parity-CDF study harness (parity_cdf.py):
instance generators, the oracle pool, the ridged objective, and the
verified-path plumbing on a tiny instance set. The full 2,000-instance
study lives in parity_cdf.json / RESULTS.md."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parity_cdf import (  # noqa: E402
    cdf_stats,
    make_random_instances,
    ridged_objective,
    solve_oracle,
    solve_pdhg,
)


def test_random_instances_shape_and_feasibility():
    cw, ys = make_random_instances(6, seed=3)
    assert cw.shape == (6, 30) and ys.shape == (6, 5, 30)
    np.testing.assert_allclose(cw.sum(-1), 1.0, atol=1e-6)
    assert (cw >= 0).all()


def test_oracle_pool_and_gap_sign():
    """Oracle solves are optimal and the PDHG objective gap shrinks with
    the iteration budget (the study's central monotonicity)."""
    cw, ys = make_random_instances(6, seed=1)
    ridge = 1e-3
    w_or, ok = solve_oracle(cw, ys, ridge, workers=2)
    assert w_or.shape == (6, 5, 30)
    assert ok.all()
    obj_or = ridged_objective(w_or, ys, cw, ridge)

    gaps = []
    for iters in (200, 2000):
        w, conv = solve_pdhg(cw, ys, ridge, iters)
        assert np.asarray(conv).all()
        gaps.append(np.median(ridged_objective(w, ys, cw, ridge) - obj_or))
    assert gaps[1] < gaps[0], gaps

    stats = cdf_stats(np.abs(w[:, 0, :] - w_or[:, 0, :]).max(-1))
    assert set(stats) >= {"median", "p90", "p99", "max", "frac_le_1e-4"}


@pytest.mark.slow
def test_verified_path_certifies_small_set():
    """The polish=True path produces f64 output with a KKT certificate
    on a small non-degenerate set."""
    cw, ys = make_random_instances(6, seed=2)
    w, res_after = solve_pdhg(cw, ys, 1e-3, 8000, polish=True, cycles=5)
    assert w.dtype == np.float64 or str(w.dtype) == "float64"
    assert np.asarray(res_after).max() < 1e-10  # all certified
