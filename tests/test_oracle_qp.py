"""Oracle ADMM QP solver: KKT optimality + invariants (SURVEY.md §4.2)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mpctsid_tpu.oracle.qp import solve_qp

RNG = np.random.default_rng


def random_qp(seed, n=12, m=20, eq_rows=3):
    rng = RNG(seed)
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    z0 = A @ rng.normal(size=n)
    spread = rng.uniform(0.1, 2.0, size=m)
    l = z0 - spread
    u = z0 + spread
    l[:eq_rows] = u[:eq_rows] = z0[:eq_rows]
    return P, q, A, l, u


def kkt_residual(P, q, A, l, u, x, y):
    Ax = A @ x
    prim = max(np.max(Ax - u, initial=0.0), np.max(l - Ax, initial=0.0))
    dual = np.max(np.abs(P @ x + q + A.T @ y))
    # complementary slackness: y- on lower, y+ on upper
    comp = np.max(np.abs(np.where(y > 0, (u - Ax) * y, (Ax - l) * y)),
                  initial=0.0)
    return max(prim, dual, comp)


@pytest.mark.parametrize("seed", range(10))
def test_kkt_optimality(seed):
    P, q, A, l, u = random_qp(seed)
    res = solve_qp(P, q, A, l, u)
    assert res.converged
    assert kkt_residual(P, q, A, l, u, res.x, res.y) < 1e-6


@pytest.mark.parametrize("seed", range(5))
def test_matches_projected_gradient_free_solution(seed):
    """With no active inequality (huge bounds), x* = -P^{-1} q."""
    P, q, A, l, u = random_qp(seed, eq_rows=0)
    l = l - 1e6
    u = u + 1e6
    res = solve_qp(P, q, A, l, u)
    np.testing.assert_allclose(res.x, -np.linalg.solve(P, q), atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_equality_rows_satisfied(seed):
    P, q, A, l, u = random_qp(seed, eq_rows=5)
    res = solve_qp(P, q, A, l, u)
    np.testing.assert_allclose(A[:5] @ res.x, l[:5], atol=1e-7)


@pytest.mark.parametrize("seed", range(5))
def test_warm_start_converges_faster(seed):
    P, q, A, l, u = random_qp(seed)
    cold = solve_qp(P, q, A, l, u, polish=False)
    warm = solve_qp(P, q, A, l, u, polish=False, x0=cold.x, y0=cold.y)
    assert warm.iters <= cold.iters


@given(st.integers(min_value=0, max_value=10_000))
@settings(max_examples=15, deadline=None)
def test_solution_feasible_hypothesis(seed):
    """Returned primal point is always feasible to tolerance (SURVEY.md §4.2)."""
    P, q, A, l, u = random_qp(seed)
    res = solve_qp(P, q, A, l, u)
    Ax = A @ res.x
    assert np.all(Ax <= u + 1e-6) and np.all(Ax >= l - 1e-6)
