"""Unit tests for qp/blockinv.py — the MXU-friendly SPD inversion kernels.

Covers the documented failure modes (VERDICT.md round-1 weak #4): accuracy vs
LU across the condition-number range each variant claims (mass matrices at
cond ~1e2, WBC ridge KKTs at cond 1e5-1e7), the Newton-Schulz safeguard path
on numerically indefinite input, and the iterative-refinement identity the
ADMM x-update relies on (qp/admm.py k_solve).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mpctsid_tpu.qp.blockinv import (chol_blocked, spd_inverse,
                                     spd_inverse_chol, spd_inverse_sorted,
                                     tri_lower_inverse)

F32 = jnp.float32


def spd_with_cond(n, cond, seed=0, dtype=np.float64):
    """Random SPD matrix with the given 2-norm condition number."""
    r = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(r.normal(size=(n, n)))
    eigs = np.logspace(0.0, -np.log10(cond), n)
    return (Q * eigs) @ Q.T


def rel_residual(K64, X):
    n = K64.shape[0]
    return np.linalg.norm(np.eye(n) - K64 @ np.asarray(X, np.float64)) / np.sqrt(n)


def test_chol_blocked_matches_numpy():
    """f32 factor: compare reconstruction L L' = K at f32 backward-error."""
    K = spd_with_cond(30, 1e3, seed=1)
    L = np.asarray(chol_blocked(jnp.asarray(K, F32)), np.float64)
    assert np.abs(np.triu(L, 1)).max() == 0.0
    np.testing.assert_allclose(L @ L.T, K, atol=3e-6)
    np.testing.assert_allclose(L, np.linalg.cholesky(K), atol=1e-4)


def test_tri_lower_inverse_matches_numpy():
    K = spd_with_cond(24, 1e3, seed=2)
    L = np.linalg.cholesky(K)
    Xi = np.asarray(tri_lower_inverse(jnp.asarray(L, F32)), np.float64)
    # forward error scales with cond(L) ~ sqrt(cond K) ~ 30 in f32
    resid = np.abs(Xi @ L - np.eye(24)).max()
    assert resid < 1e-4, resid


def test_spd_inverse_mass_matrix_regime():
    """Plain Schur inverse is the env/plant path: cond ~1e2, uniform diag."""
    K64 = spd_with_cond(18, 1e2, seed=3)
    X = spd_inverse(jnp.asarray(K64, F32))
    assert rel_residual(K64, X) < 1e-5


@pytest.mark.parametrize("cond,budget", [(1e4, 1e-3), (1e5, 5e-3), (1e7, 0.2)])
def test_spd_inverse_chol_conditioning_range(cond, budget):
    """The production QP-KKT path must stay usable to cond ~1e7 in f32
    (the WBC ridge KKT; Jacobi pre-scaling is what buys the top decade)."""
    K64 = spd_with_cond(30, cond, seed=4)
    X = spd_inverse_chol(jnp.asarray(K64, F32), ns_steps=1)
    assert np.all(np.isfinite(np.asarray(X)))
    assert rel_residual(K64, X) < budget


def test_spd_inverse_chol_diagonal_scale_driven():
    """WBC-KKT-shaped conditioning: moderate base matrix + 1e6/1e3 diagonal
    spikes (swing-force ridge, equality-rho boost).  Jacobi pre-scaling must
    collapse this to the base conditioning."""
    K64 = spd_with_cond(30, 1e3, seed=5)
    d = np.ones(30)
    d[18:24] = 1e6   # ridge-pinned block
    d[0:6] = 1e3     # equality-boosted block
    K64 = K64 * np.sqrt(d)[:, None] * np.sqrt(d)[None, :]
    assert np.linalg.cond(K64) > 1e6
    X = spd_inverse_chol(jnp.asarray(K64, F32), ns_steps=1)
    assert rel_residual(K64, X) < 5e-3


def test_ns_safeguard_no_nan_on_indefinite():
    """f32-indefinite input (cond 1e9): the sqrt floor + NS fallback must
    produce a finite result, never NaN (it poisons whole vmapped batches)."""
    K64 = spd_with_cond(30, 1e9, seed=6)
    X = spd_inverse_chol(jnp.asarray(K64, F32), ns_steps=1)
    assert np.all(np.isfinite(np.asarray(X)))


def test_spd_inverse_sorted_beats_unsorted_on_spread_diag():
    K64 = spd_with_cond(30, 1e3, seed=7)
    d = np.logspace(0, 5, 30)
    np.random.default_rng(7).shuffle(d)
    K64 = K64 * np.sqrt(d)[:, None] * np.sqrt(d)[None, :]
    Kf = jnp.asarray(K64, F32)
    r_sorted = rel_residual(K64, spd_inverse_sorted(Kf))
    assert np.isfinite(r_sorted) and r_sorted < 0.05


def test_refinement_reduces_solve_residual():
    """The ADMM x-update's one-step refinement (qp/admm.py k_solve): solving
    K x = b as x = Xb; x += X(b - Kx).  The guarantee is on the RESIDUAL
    ||K x - b|| (contracted by ||I - KX|| each step), which is what the ADMM
    fixed point sees — measured 10x torque-parity gain on the WBC ridge KKT
    (scripts/diag_wbc_mode).  Forward x-error on a single solve is already at
    the f32 floor, so that is not asserted here."""
    errs = []
    for seed in range(5):
        K64 = spd_with_cond(30, 1e5, seed=seed)
        b64 = np.random.default_rng(seed).normal(size=30)
        K = jnp.asarray(K64, F32)
        b = jnp.asarray(b64, F32)
        X = spd_inverse_chol(K, ns_steps=1)
        x_raw = X @ b
        x_ref = x_raw + X @ (b - K @ x_raw)
        res = lambda x: np.linalg.norm(  # noqa: E731
            K64 @ np.asarray(x, np.float64) - b64)
        errs.append((res(x_raw), res(x_ref)))
    raw = np.array([a for a, _ in errs])
    ref = np.array([b for _, b in errs])
    # never significantly worse, and ~2x better in aggregate (the residual is
    # itself computed in f32, which floors the visible single-solve gain)
    assert np.all(ref < raw * 1.5)
    assert ref.sum() < raw.sum() / 1.7, (raw, ref)
