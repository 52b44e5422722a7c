"""Batched dense ADMM QP core in JAX (replaces OSQP + eiquadprog).

Solves   min_x 1/2 x'Px + q'x   s.t.  l <= Ax <= u
with the OSQP operator splitting (same algorithm as oracle/qp.py, which is the
float64 reference for this module; SURVEY.md §2.1 native table rows "OSQP" and
"eiquadprog").  TPU-native choices:

  * FIXED iteration count (SURVEY.md §7.3 "fixed-iteration ADMM"): no data-
    dependent control flow, so the whole solve jits into one fused program and
    `vmap`s across thousands of scenarios in lockstep (BASELINE.json:5).
  * The KKT matrix K = P + sigma I + A' diag(rho) A is factored ONCE per solve
    and applied as a dense inverse: every ADMM iteration is then two batched
    matmuls + a clip — pure MXU + VPU work.  (n <= 192, so K^-1 is small; the
    alternative triangular-solve path is kept for comparison.)
  * Ruiz equilibration + cost scaling in-graph (f32 conditioning; §7.3
    "Numerics").
  * Per-row rho with the OSQP 1e3 equality boost (rows with l == u), computed
    from the bounds with a finite-infinity convention (INF = 1e20).

Single-problem layout; batch with jax.vmap over (P, q, A, l, u [, x0, y0]).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

INF = 1e20


@dataclasses.dataclass
class QPSolution:
    x: jnp.ndarray          # (n,) primal
    y: jnp.ndarray          # (m,) dual
    z: jnp.ndarray          # (m,) projected constraint value
    prim_res: jnp.ndarray   # scalar, unscaled inf-norm
    dual_res: jnp.ndarray   # scalar, unscaled inf-norm


jax.tree_util.register_dataclass(
    QPSolution, data_fields=["x", "y", "z", "prim_res", "dual_res"],
    meta_fields=[])


def ruiz_equilibrate(P, q, A, l, u, iters: int = 8):
    """Modified-Ruiz equilibration of [[P, A'], [A, 0]] + cost scaling.

    Returns (Pb, qb, Ab, lb, ub, D, E, c): x = D xb, y = E yb / c."""

    def body(_, carry):
        Pb, qb, Ab, D, E, c = carry
        cn = jnp.maximum(jnp.max(jnp.abs(Pb), axis=0),
                         jnp.max(jnp.abs(Ab), axis=0))
        cm = jnp.max(jnp.abs(Ab), axis=1)
        dn = jax.lax.rsqrt(jnp.maximum(cn, 1e-12))
        dm = jax.lax.rsqrt(jnp.maximum(cm, 1e-12))
        Pb = dn[:, None] * Pb * dn[None, :]
        qb = dn * qb
        Ab = dm[:, None] * Ab * dn[None, :]
        D = D * dn
        E = E * dm
        pcol = jnp.max(jnp.abs(Pb), axis=0)
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(pcol), jnp.max(jnp.abs(qb))), 1e-12)
        return Pb * gamma, qb * gamma, Ab, D, E, c * gamma

    n = P.shape[0]
    m = A.shape[0]
    init = (P, q, A, jnp.ones(n, P.dtype), jnp.ones(m, P.dtype),
            jnp.asarray(1.0, P.dtype))
    Pb, qb, Ab, D, E, c = jax.lax.fori_loop(0, iters, body, init)
    # scale bounds, keeping the finite-infinity convention intact
    lb = jnp.where(l <= -INF, l, E * l)
    ub = jnp.where(u >= INF, u, E * u)
    return Pb, qb, Ab, lb, ub, D, E, c


@partial(jax.jit, static_argnames=("iters", "mode", "equilibrate_iters"))
def admm_solve(P, q, A, l, u,
               x0=None, y0=None,
               iters: int = 60,
               rho: float = 0.1,
               sigma: float = 1e-6,
               alpha: float = 1.6,
               rho_eq_scale: float = 1e3,
               mode: str = "inv",
               equilibrate_iters: int = 8) -> QPSolution:
    """Fixed-iteration OSQP-style ADMM.  vmap-able; see module docstring."""
    n = P.shape[0]
    m = A.shape[0]
    dtype = P.dtype

    P0, q0, A0, l0, u0 = P, q, A, l, u
    P, q, A, l, u, D, E, c = ruiz_equilibrate(P, q, A, l, u, equilibrate_iters)

    eq = (u0 - l0) < 1e-9
    rho_vec = jnp.where(eq, rho_eq_scale * rho, rho).astype(dtype)
    rho_inv = 1.0 / rho_vec

    K = P + sigma * jnp.eye(n, dtype=dtype) + (A.T * rho_vec) @ A
    if mode == "inv":
        K_inv = jnp.linalg.inv(K)

        def k_solve(rhs):
            return K_inv @ rhs
    else:
        L = jnp.linalg.cholesky(K)

        def k_solve(rhs):
            t = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, t, lower=False)

    x = jnp.zeros(n, dtype) if x0 is None else (x0 / D).astype(dtype)
    y = jnp.zeros(m, dtype) if y0 is None else (y0 * c / E).astype(dtype)
    z = jnp.clip(A @ x, l, u)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        x_t = k_solve(rhs)
        z_t = A @ x_t
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_r = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + rho_inv * y, l, u)
        y_n = y + rho_vec * (z_r - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))

    # unscale and report unscaled residuals
    x = D * x
    y = E * y / c
    z_u = jnp.clip(A0 @ x, l0, u0)
    prim = jnp.max(jnp.abs(A0 @ x - z_u)) if m else jnp.zeros((), dtype)
    dual = jnp.max(jnp.abs(P0 @ x + q0 + A0.T @ y))
    return QPSolution(x=x, y=y, z=z_u, prim_res=prim, dual_res=dual)
