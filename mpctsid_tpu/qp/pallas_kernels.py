"""Pallas TPU kernel for the ADMM inner iteration (BASELINE.json:5 "batched
dense QP construction + solve ... in Pallas kernels").

Why a kernel: the XLA path re-streams each scenario's K^-1 (192x192) and A
(320x192) from HBM on EVERY ADMM iteration — measured 115 ms per 100
iterations at B=1024 (HBM-bandwidth bound, arithmetic intensity ~0.5
flop/byte).  This kernel keeps one scenario's matrices VMEM-resident for all
iterations (intensity x iters), turning the loop into VPU/MXU work on on-chip
data; HBM sees each matrix exactly once.

Layout: one scenario per grid step (~0.4 MB VMEM per step, double-buffered by
the Mosaic pipeline across grid steps).  The solver calls it per-sample under
jax.vmap, which maps to the batch grid dimension.

The iteration is EXACTLY the OSQP update of qp/admm.py run_block (same
operator splitting, over-relaxation, per-row rho) — the XLA path remains the
reference implementation and the default off-TPU; tests compare the two
bit-for-bit-ish (f32 reduction order differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _admm_kernel(iters: int, sigma: float, alpha: float,
                 kinv_ref, k_ref, a_ref, q_ref, l_ref, u_ref, rho_ref,
                 rho_inv_ref, x0_ref, z0_ref, y0_ref,
                 x_out, z_out, y_out):
    K_inv = kinv_ref[:]          # (n, n)
    K = k_ref[:]                 # (n, n)
    A = a_ref[:]                 # (m, n)
    q = q_ref[:]                 # (1, n)
    l = l_ref[:]                 # (1, m)
    u = u_ref[:]                 # (1, m)
    rho = rho_ref[:]             # (1, m)
    rho_inv = rho_inv_ref[:]     # (1, m)

    def body(_, carry):
        x, z, y = carry          # (1, n), (1, m), (1, m)
        # rhs = sigma x - q + A' (rho z - y)
        w = rho * z - y          # (1, m)
        atw = jax.lax.dot_general(
            w, A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (1, n)
        rhs = sigma * x - q + atw
        x_a = jax.lax.dot_general(
            rhs, K_inv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (1, n)
        # one iterative-refinement step, matching qp/admm.py k_solve exactly
        # (the refinement is part of the iteration's semantics; the two
        # backends must share a fixed point)
        r = rhs - jax.lax.dot_general(
            x_a, K, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (1, n)
        x_t = x_a + jax.lax.dot_general(
            r, K_inv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (1, n)
        z_t = jax.lax.dot_general(
            x_t, A, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # (1, m)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_r = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + rho_inv * y, l, u)
        y_n = y + rho * (z_r - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:]))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


def _admm_kernel_vpu(iters: int, sigma: float, alpha: float,
                     kinv_ref, k_ref, a_ref, q_ref, l_ref, u_ref, rho_ref,
                     rho_inv_ref, x0_ref, z0_ref, y0_ref,
                     x_out, z_out, y_out):
    """VPU formulation of the same iteration: every matrix-vector product is a
    broadcast-multiply + axis-reduction instead of an MXU dot.

    Why: with a (1, n) left operand the MXU runs at 1/128 row utilization and
    every dot re-loads the (n, n) weight tile into the systolic array — the
    measured cost was ~1.2 us per scenario-iteration at n=192 (weight-load
    bound).  The VPU path streams the same K_inv/K/A elements through the
    vector ALUs (elementwise product + log-depth reduction), no weight loads.

    Layout: K and K_inv are SYMMETRIC (K = P + sigma I + A' rho A; K_inv from
    the Cholesky/NS inverse), so  K v  can be formed either as a lane-axis
    reduction (row-vector in, column-vector out) or a sublane-axis reduction
    (column in, row out) without ever materializing a transpose of the matrix.
    Constraint-space vectors (z, y, l, u, rho) live as (m, 1) columns; primal
    vectors as (1, n) rows; exactly one (n, 1) -> (1, n) vector transpose per
    iteration."""
    K_inv = kinv_ref[:]          # (n, n) symmetric
    K = k_ref[:]                 # (n, n) symmetric
    A = a_ref[:]                 # (m, n)
    q = q_ref[:]                 # (1, n)
    l = l_ref[:]                 # (m, 1)
    u = u_ref[:]                 # (m, 1)
    rho = rho_ref[:]             # (m, 1)
    rho_inv = rho_inv_ref[:]     # (m, 1)

    def body(_, carry):
        x, z, y = carry          # (1, n), (m, 1), (m, 1)
        w = rho * z - y                                        # (m, 1)
        atw = jnp.sum(A * w, axis=0, keepdims=True)            # (1, n)
        rhs = sigma * x - q + atw                              # (1, n)
        # x_a = K^-1 rhs  (column out: lane reduction over the row layout)
        x_a = jnp.sum(K_inv * rhs, axis=1, keepdims=True)      # (n, 1)
        # one iterative-refinement step (same semantics as the MXU kernel)
        kxa = jnp.sum(K * x_a, axis=0, keepdims=True)          # (1, n)
        r = rhs - kxa                                          # (1, n)
        corr = jnp.sum(K_inv * r, axis=1, keepdims=True)       # (n, 1)
        x_t = jnp.transpose(x_a + corr)                        # (1, n)
        z_t = jnp.sum(A * x_t, axis=1, keepdims=True)          # (m, 1)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_r = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + rho_inv * y, l, u)
        y_n = y + rho * (z_r - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[:], z0_ref[:], y0_ref[:]))
    x_out[:] = x
    z_out[:] = z
    y_out[:] = y


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "interpret"))
def admm_iterate_vpu(K_inv, K, A, q, l, u, rho_vec, x, z, y,
                     iters: int = 25, sigma: float = 1e-6, alpha: float = 1.6,
                     interpret: bool = False):
    """VPU-path ADMM updates (see _admm_kernel_vpu).  Same contract as
    `admm_iterate`; returns (x, z, y)."""
    n = K_inv.shape[-1]
    m = A.shape[-2]
    dtype = K_inv.dtype
    rho_inv = 1.0 / rho_vec

    kern = functools.partial(_admm_kernel_vpu, iters, sigma, alpha)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    col = lambda v: v[:, None]  # noqa: E731
    x_o, z_o, y_o = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((m, 1), dtype),
            jax.ShapeDtypeStruct((m, 1), dtype),
        ),
        in_specs=[vspec() for _ in range(11)],
        out_specs=(vspec(), vspec(), vspec()),
        interpret=interpret,
    )(K_inv, K, A, q[None, :], col(l), col(u), col(rho_vec),
      col(rho_inv), x[None, :], col(z), col(y))
    return x_o[0], z_o[:, 0], y_o[:, 0]


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha",
                                             "interpret"))
def admm_iterate(K_inv, K, A, q, l, u, rho_vec, x, z, y,
                 iters: int = 25, sigma: float = 1e-6, alpha: float = 1.6,
                 interpret: bool = False):
    """Run `iters` ADMM updates with VMEM-resident matrices.

    Single-sample shapes: K_inv/K (n,n), A (m,n), vectors (n,)/(m,).
    vmap over a batch maps to the Pallas grid.  Returns (x, z, y)."""
    n = K_inv.shape[-1]
    m = A.shape[-2]
    dtype = K_inv.dtype
    rho_inv = 1.0 / rho_vec

    kern = functools.partial(_admm_kernel, iters, sigma, alpha)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x_o, z_o, y_o = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
        ),
        in_specs=[vspec() for _ in range(11)],
        out_specs=(vspec(), vspec(), vspec()),
        interpret=interpret,
    )(K_inv, K, A, q[None, :], l[None, :], u[None, :], rho_vec[None, :],
      rho_inv[None, :], x[None, :], z[None, :], y[None, :])
    return x_o[0], z_o[0], y_o[0]
