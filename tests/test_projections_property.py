"""Property-based projection tests (hypothesis): the Michelot projections
must satisfy exact feasibility + variational optimality for ANY input."""

import pytest
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

import jax.numpy as jnp

from kmpc_tpu.ops.projections import project_l1_ball, project_simplex

pytestmark = pytest.mark.slow  # subprocess CLIs / long solves: run with --runslow


vectors = hnp.arrays(
    dtype=np.float32,
    shape=st.tuples(st.integers(1, 6), st.integers(2, 40)),
    elements=st.floats(-100.0, 100.0, width=32),
)


@settings(max_examples=60, deadline=None)
@given(vectors)
def test_simplex_projection_properties(v):
    w = np.asarray(project_simplex(jnp.asarray(v)))
    assert np.all(w >= 0)
    assert np.allclose(w.sum(-1), 1.0, atol=1e-4)
    # Optimality via the threshold characterization: there exists theta
    # with w = max(v - theta, 0). Recover theta from any active coord and
    # check consistency.
    for row_v, row_w in zip(v, w):
        active = row_w > 0
        assert active.any()
        theta = row_v[active] - row_w[active]
        assert np.allclose(theta, theta[0], atol=1e-3)
        # Inactive coords must satisfy v_i <= theta (+ tol).
        if (~active).any():
            assert np.all(row_v[~active] <= theta[0] + 1e-3)


@settings(max_examples=60, deadline=None)
@given(vectors, st.floats(0.01, 5.0))
def test_l1_ball_projection_properties(v, radius):
    u = np.asarray(project_l1_ball(jnp.asarray(v), radius))
    l1 = np.abs(u).sum(-1)
    # fp32 feasibility error scales with the input magnitude (threshold is
    # computed from values of that scale); solver inputs are O(1).
    scale_tol = 1e-6 * v.shape[-1] * max(1.0, float(np.abs(v).max()))
    assert np.all(l1 <= radius * (1 + 1e-3) + 1e-5 + scale_tol)
    # Sign preservation and shrink-toward-zero.
    assert np.all(u * v >= -1e-6)
    assert np.all(np.abs(u) <= np.abs(v) + 1e-6)
    # Inside the ball: identity.
    inside = np.abs(v).sum(-1) <= radius
    if inside.any():
        assert np.allclose(u[inside], v[inside], atol=1e-6)
