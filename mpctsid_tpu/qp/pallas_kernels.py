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


def _admm_kernel_vpu_packed(iters: int, sigma: float, alpha: float,
                            kinv_ref, k_ref, a_ref, q_ref, l_ref, u_ref,
                            rho_ref, rho_inv_ref, x0_ref, z0_ref, y0_ref,
                            x_out, z_out, y_out):
    """G-packed VPU iteration: one grid step advances G scenarios at once.

    Same math as _admm_kernel_vpu with a leading scenario axis.  Why packing:
    with one scenario per grid step the fixed per-step cost (DMA issue, loop
    control) dominates for the tiny WBC matrices (n=30: measured 38 ms vs
    XLA's 4 ms at B=1024).  Packing G scenarios amortizes that cost and gives
    the VPU full (G*m, n)-shaped elementwise work per op, while HBM still
    sees each matrix exactly once per solve (vs once per iteration on the
    XLA path)."""
    K_inv = kinv_ref[:]          # (G, n, n) symmetric per scenario
    K = k_ref[:]                 # (G, n, n)
    A = a_ref[:]                 # (G, m, n)
    q = q_ref[:]                 # (G, 1, n)
    l = l_ref[:]                 # (G, 1, m)
    u = u_ref[:]                 # (G, 1, m)
    rho = rho_ref[:]             # (G, 1, m)
    rho_inv = rho_inv_ref[:]     # (G, 1, m)

    # All VECTORS live as (G, 1, dim) rows: a (dim, 1) column tile pads its
    # lane axis 1 -> 128 (128x VMEM waste; the first packed layout OOM'd the
    # 16 MB scoped VMEM at G=128).  The price is three small vector
    # transposes per iteration, which relayout (G, 1, d) <-> (G, d, 1).
    def body(_, carry):
        x, z, y = carry          # (G, 1, n), (G, 1, m), (G, 1, m)
        w = jnp.swapaxes(rho * z - y, 1, 2)                    # (G, m, 1)
        atw = jnp.sum(A * w, axis=1, keepdims=True)            # (G, 1, n)
        rhs = sigma * x - q + atw
        x_a = jnp.sum(K_inv * rhs, axis=2, keepdims=True)      # (G, n, 1)
        kxa = jnp.sum(K * x_a, axis=1, keepdims=True)          # (G, 1, n)
        r = rhs - kxa
        corr = jnp.sum(K_inv * r, axis=2, keepdims=True)       # (G, n, 1)
        x_t = jnp.swapaxes(x_a + corr, 1, 2)                   # (G, 1, n)
        z_t = jnp.swapaxes(
            jnp.sum(A * x_t, axis=2, keepdims=True), 1, 2)     # (G, 1, m)
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


def _pad_bytes(r: int, c: int) -> int:
    """f32 bytes of an (r, c) tile after (8, 128) tiling."""
    return 4 * (-(-r // 8) * 8) * (-(-c // 128) * 128)


def _pick_g(n: int, m: int, budget_bytes: int = 3 << 20) -> int:
    """Scenarios per grid step: fill ~3 MB of PADDED VMEM per step (the
    Mosaic scoped-VMEM limit is 16 MB and covers inputs, outputs, carries and
    iteration temporaries; padding to (8, 128) tiles is what actually counts,
    not logical element counts)."""
    per = (2 * _pad_bytes(n, n)          # K_inv, K
           + _pad_bytes(m, n)            # A
           + 9 * _pad_bytes(1, m)        # row vectors l,u,rho,rho_inv,z,y(x2 io)
           + 4 * _pad_bytes(1, n)        # q, x
           + 2 * _pad_bytes(m, 1)        # column temporaries w, z_t
           + _pad_bytes(n, 1)            # x_a/corr temporary
           + _pad_bytes(m, n)            # A*w product temporary
           + _pad_bytes(n, n))           # K*rhs product temporary
    g = max(1, budget_bytes // per)
    p = 1
    while p * 2 <= g:
        p *= 2
    return min(p, 256)


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "g",
                                             "interpret"))
def admm_iterate_vpu_packed(K_inv, K, A, q, l, u, rho_vec, x, z, y,
                            iters: int, sigma: float, alpha: float, g: int,
                            interpret: bool = False):
    """Batched packed iteration: inputs carry a leading batch axis (B, ...).

    Runs grid=(ceil(B/g),) with g scenarios resident per step; B is padded to
    a multiple of g with inert scenarios (K_inv = 0, l = u = 0 -> the padded
    lanes compute zeros).  Returns (x (B,n), z (B,m), y (B,m))."""
    B = K_inv.shape[0]
    n = K_inv.shape[-1]
    m = A.shape[-2]
    dtype = K_inv.dtype
    rho_inv_vec = 1.0 / rho_vec

    Bp = -(-B // g) * g
    if Bp != B:
        pad = lambda a, fill=0.0: jnp.concatenate(  # noqa: E731
            [a, jnp.full((Bp - B,) + a.shape[1:], fill, a.dtype)], axis=0)
        K_inv, K, A, q, x = (pad(K_inv), pad(K), pad(A), pad(q), pad(x))
        l, u, z, y = pad(l), pad(u), pad(z), pad(y)
        rho_vec, rho_inv_vec = pad(rho_vec, 1.0), pad(rho_inv_vec, 1.0)

    kern = functools.partial(_admm_kernel_vpu_packed, iters, sigma, alpha)
    mat = lambda s: pl.BlockSpec((g,) + s, lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    row = lambda v: v[:, None, :]  # noqa: E731
    x_o, z_o, y_o = pl.pallas_call(
        kern,
        grid=(Bp // g,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1, n), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
        ),
        in_specs=[mat((n, n)), mat((n, n)), mat((m, n)), mat((1, n)),
                  mat((1, m)), mat((1, m)), mat((1, m)), mat((1, m)),
                  mat((1, n)), mat((1, m)), mat((1, m))],
        out_specs=(mat((1, n)), mat((1, m)), mat((1, m))),
        interpret=interpret,
    )(K_inv, K, A, row(q), row(l), row(u), row(rho_vec), row(rho_inv_vec),
      row(x), row(z), row(y))
    return x_o[:B, 0, :], z_o[:B, 0, :], y_o[:B, 0, :]


_PACKED_CACHE: dict = {}


def admm_iterate_packed(K_inv, K, A, q, l, u, rho_vec, x, z, y,
                        iters: int = 25, sigma: float = 1e-6,
                        alpha: float = 1.6, interpret: bool = False):
    """custom_vmap front: per-sample VPU kernel when unbatched; the G-packed
    grid kernel when vmapped over a scenario batch.  This is what lets the
    cascade's single per-scenario vmap reach a kernel that processes many
    scenarios per grid step (a plain vmap of pallas_call always maps one
    scenario to one grid step)."""
    key = (int(iters), float(sigma), float(alpha), bool(interpret))
    fn = _PACKED_CACHE.get(key)
    if fn is None:
        @jax.custom_batching.custom_vmap
        def base(K_inv, K, A, q, l, u, rho_vec, x, z, y):
            return admm_iterate_vpu(K_inv, K, A, q, l, u, rho_vec, x, z, y,
                                    iters=iters, sigma=sigma, alpha=alpha,
                                    interpret=interpret)

        @base.def_vmap
        def _rule(axis_size, in_batched, *args):  # noqa: ANN001
            args = [a if b else
                    jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
                    for a, b in zip(args, in_batched)]
            n = args[0].shape[-1]
            m = args[2].shape[-2]
            out = admm_iterate_vpu_packed(
                *args, iters=iters, sigma=sigma, alpha=alpha,
                g=_pick_g(n, m), interpret=interpret)
            return out, (True, True, True)

        fn = base
        _PACKED_CACHE[key] = fn
    return fn(K_inv, K, A, q, l, u, rho_vec, x, z, y)


# ---------------------------------------------------------------------------
# M2-packed iteration kernel: the refined-inverse solve folded into ONE
# precomputed matrix, G MPC-sized scenarios per grid step
# ---------------------------------------------------------------------------
#
# The per-iteration x-update of every backend above is
#     x_t = K_inv rhs + K_inv (rhs - K (K_inv rhs))
#         = (2 K_inv - K_inv K K_inv) rhs  =:  M2 rhs
# i.e. the iterative-refinement step is a FIXED linear map.  Folding it into
# M2 (computed once per adapt round as two batched MXU GEMMs in XLA, ~1 ms at
# B=1024/n=192) removes K from the kernel entirely: 2 of the 5
# multiply-reduce ops and ~25% of the per-scenario DMA per iteration.
# Packing G scenarios per grid step then amortizes the per-op latency that
# dominates the MPC-sized (n=192) iteration — the round-5 stage breakdown
# (scripts/profile_mpc_solve.py) measured the one-scenario-per-step VPU
# kernel at ~0.26 T elementwise-ops/s vs ~4 T peak, i.e. latency-bound, not
# ALU-bound.  Same fixed point as every other backend (identical linear map,
# fp reduction order differs).


def _admm_kernel_m2_packed(iters: int, sigma: float, alpha: float,
                           m2_ref, at_ref, q_ref, l_ref, u_ref,
                           rho_ref, x0_ref, z0_ref, y0_ref,
                           x_out, z_out, y_out):
    """Layout: constraint-space vectors (z, y, l, u, rho) live as (G, 1, m)
    ROWS for the whole loop; the primal x lives as a (G, n, 1) COLUMN.  With
    A stored TRANSPOSED (G, n, m), every multiply-reduce then lands in the
    layout its consumer needs — A'w: At * w_row reduced over lanes -> column;
    M2 rhs: M2 * rhs_col reduced over sublanes -> row (M2 symmetric); A x:
    At * x_col reduced over sublanes -> row — leaving exactly ONE relayout
    swap per iteration (the fresh x row -> column).  The first cut of this
    kernel kept A un-transposed and paid three swaps per iteration; the
    on-chip A/B (scripts/probe_m2_variants.py) measured 19.1 -> 11.2 ms per
    40-iteration B=1024 block from this re-lay-outing alone."""
    M2 = m2_ref[:]               # (G, n, n) symmetric (2 X - X K X, X sym)
    At = at_ref[:]               # (G, n, m) — A transposed (by the caller)
    q = jnp.swapaxes(q_ref[:], 1, 2)    # (G, n, 1) column, once
    l = l_ref[:]                 # (G, 1, m)
    u = u_ref[:]                 # (G, 1, m)
    rho = rho_ref[:]             # (G, 1, m)
    rho_inv = 1.0 / rho          # in-kernel: saves one HBM input stream
    x0 = jnp.swapaxes(x0_ref[:], 1, 2)  # (G, n, 1) column, once

    def body(_, carry):
        x, z, y = carry          # (G, n, 1), (G, 1, m), (G, 1, m)
        w = rho * z - y                                        # (G, 1, m)
        atw = jnp.sum(At * w, axis=2, keepdims=True)           # (G, n, 1)
        rhs = sigma * x - q + atw                              # (G, n, 1)
        xt_row = jnp.sum(M2 * rhs, axis=1, keepdims=True)      # (G, 1, n)
        x_t = jnp.swapaxes(xt_row, 1, 2)    # the ONE swap     # (G, n, 1)
        z_t = jnp.sum(At * x_t, axis=1, keepdims=True)         # (G, 1, m)
        x_n = alpha * x_t + (1.0 - alpha) * x
        z_r = alpha * z_t + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + rho_inv * y, l, u)
        y_n = y + rho * (z_r - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(
        0, iters, body, (x0, z0_ref[:], y0_ref[:]))
    x_out[:] = jnp.swapaxes(x, 1, 2)
    z_out[:] = z
    y_out[:] = y


def _pick_g_m2(n: int, m: int, budget_bytes: int = 16 << 20) -> int:
    """G for the M2 kernel: sized so the production MPC shape (192/320)
    lands on G=8 — the measured knee (g=4: 13.4 ms, g=8: 11.2 ms, g=16:
    Mosaic VMEM compile failure; scripts/probe_m2_variants.py).  The byte
    model counts inputs once plus the product temporaries; the effective
    budget is calibrated to the measured g=16 failure rather than modelling
    Mosaic's double-buffering exactly."""
    per = (_pad_bytes(n, n) + _pad_bytes(m, n)         # M2, At inputs
           + _pad_bytes(n, n) + 2 * _pad_bytes(m, n)   # product temporaries
           + 8 * _pad_bytes(1, m) + 6 * _pad_bytes(1, n)
           + _pad_bytes(m, 1) + 2 * _pad_bytes(n, 1))
    g = max(1, budget_bytes // per)
    p = 1
    while p * 2 <= g:
        p *= 2
    return min(p, 64)


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha", "g",
                                             "interpret"))
def admm_iterate_m2_packed_batch(M2, A, q, l, u, rho_vec, x, z, y,
                                 iters: int, sigma: float, alpha: float,
                                 g: int, interpret: bool = False):
    """Batched M2 iteration: inputs (B, ...); grid=(ceil(B/g),) with g
    scenarios resident per step.  B pads to a multiple of g with inert
    scenarios (M2 = 0, l = u = 0).  Returns (x (B,n), z (B,m), y (B,m))."""
    B = M2.shape[0]
    n = M2.shape[-1]
    m = A.shape[-2]
    dtype = M2.dtype

    Bp = -(-B // g) * g
    if Bp != B:
        pad = lambda a, fill=0.0: jnp.concatenate(  # noqa: E731
            [a, jnp.full((Bp - B,) + a.shape[1:], fill, a.dtype)], axis=0)
        M2, A, q, x = pad(M2), pad(A), pad(q), pad(x)
        l, u, z, y = pad(l), pad(u), pad(z), pad(y)
        rho_vec = pad(rho_vec, 1.0)

    # the kernel wants A TRANSPOSED (see _admm_kernel_m2_packed layout note);
    # one XLA relayout per block call (~0.6 ms at B=1024) buys two fewer
    # in-kernel relayout swaps per iteration
    At = jnp.swapaxes(A, 1, 2)
    kern = functools.partial(_admm_kernel_m2_packed, iters, sigma, alpha)
    mat = lambda s: pl.BlockSpec((g,) + s, lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    row = lambda v: v[:, None, :]  # noqa: E731
    x_o, z_o, y_o = pl.pallas_call(
        kern,
        grid=(Bp // g,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1, n), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
        ),
        in_specs=[mat((n, n)), mat((n, m)), mat((1, n)),
                  mat((1, m)), mat((1, m)), mat((1, m)),
                  mat((1, n)), mat((1, m)), mat((1, m))],
        out_specs=(mat((1, n)), mat((1, m)), mat((1, m))),
        interpret=interpret,
    )(M2, At, row(q), row(l), row(u), row(rho_vec), row(x), row(z), row(y))
    return x_o[:B, 0, :], z_o[:B, 0, :], y_o[:B, 0, :]


_M2_CACHE: dict = {}


def admm_iterate_m2(M2, A, q, l, u, rho_vec, x, z, y,
                    iters: int = 25, sigma: float = 1e-6,
                    alpha: float = 1.6, interpret: bool = False):
    """custom_vmap front for the M2 kernel (see admm_iterate_m2_packed_batch).

    Unbatched calls run the G=1 grid; a vmap over a scenario batch reaches
    the G-packed grid kernel (a plain vmap of pallas_call would map one
    scenario per grid step and lose the packing)."""
    key = (int(iters), float(sigma), float(alpha), bool(interpret))
    fn = _M2_CACHE.get(key)
    if fn is None:
        @jax.custom_batching.custom_vmap
        def base(M2, A, q, l, u, rho_vec, x, z, y):
            out = admm_iterate_m2_packed_batch(
                M2[None], A[None], q[None], l[None], u[None], rho_vec[None],
                x[None], z[None], y[None],
                iters=iters, sigma=sigma, alpha=alpha, g=1,
                interpret=interpret)
            return tuple(o[0] for o in out)

        @base.def_vmap
        def _rule(axis_size, in_batched, *args):  # noqa: ANN001
            args = [a if b else
                    jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
                    for a, b in zip(args, in_batched)]
            n = args[0].shape[-1]
            m = args[1].shape[-2]
            out = admm_iterate_m2_packed_batch(
                *args, iters=iters, sigma=sigma, alpha=alpha,
                g=_pick_g_m2(n, m), interpret=interpret)
            return out, (True, True, True)

        fn = base
        _M2_CACHE[key] = fn
    return fn(M2, A, q, l, u, rho_vec, x, z, y)


# ---------------------------------------------------------------------------
# fully-fused solver kernel: Ruiz + K build + blocked Cholesky inverse +
# fixed-iteration ADMM + rho adaptation, one pallas_call per solve
# ---------------------------------------------------------------------------
#
# STATUS (round 4): compiles and passes parity on real Mosaic (max dx 1.2e-4
# vs XLA over 8 QPs) after the 8x8-base-case re-tiling + two-step reductions
# (see _split/_sum2).  Full-cascade A/B on the chip (scripts/bench_backends.py,
# B=1024 trot): wbc_backend="fused" 27.7k ticks/s vs "xla" 51.2k;
# mpc_backend="fused" 25.6k vs "pallas_vpu" 51.2k — the in-kernel VPU-serial
# Ruiz + blocked-Cholesky recursion cannot beat XLA's batched GEMM
# factorization at B=1024, so "fused" stays a correct opt-in (its win case
# would be small-batch / latency-bound regimes) and "auto" keeps
# pallas_vpu + xla.
#
# Why: the XLA path of a WBC-sized solve (n=30, m=50) is ~320 separate tiny
# device ops (8 Ruiz rounds, 3 K builds, 3 recursive blocked-Cholesky
# factorizations, 60 iteration matvecs, residual reductions) — profiling the
# cascade showed ~540 ops per 1 kHz tick with ~12 us average cost: the stage
# is op-launch/copy bound, not FLOP bound.  In-kernel, the same graph runs on
# VMEM-resident data with zero launches between steps.
#
# All matrix products use dot_general DIMENSION NUMBERS (batch dim G leading)
# instead of explicit transposes — K, K_inv are symmetric and the Cholesky
# recursion only ever needs A'B / AB' contractions, so no operand is ever
# relaid out.

def _bmm(a, b):            # (G,i,k) @ (G,k,j) -> (G,i,j)
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bmm_nt(a, b):         # (G,i,k) @ (G,j,k)' -> (G,i,j)
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _bmm_tn(a, b):         # (G,k,i)' @ (G,k,j) -> (G,i,j)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


_BASE = 8  # recursion base-case size; all concat offsets stay multiples of 8


# Multi-axis reductions (axis=(1, 2)) crash the Mosaic layout pass
# ("layout.h:320 Check failed: arr.size() >= layout_rank" SIGABRT, probed
# round 4); reduce one axis at a time instead.
def _sum2(v):      # sum over the last two axes, keepdims, (G,1,1) out
    return jnp.sum(jnp.sum(v, axis=2, keepdims=True), axis=1, keepdims=True)


def _max2(v):      # max over the last two axes, keepdims
    return jnp.max(jnp.max(v, axis=2, keepdims=True), axis=1, keepdims=True)


def _min2(v):      # min over the last two axes, keepdims
    return jnp.min(jnp.min(v, axis=2, keepdims=True), axis=1, keepdims=True)


def _split(n: int) -> int:
    """Split point for the blocked recursions: n/2 rounded UP to a multiple
    of 8 so every block-assembly concatenate lands on a sublane/lane-aligned
    offset.  Round-3 forensics: the n==1 base case produced
    `tpu.concatenate` of vector<Gx1x1xf32> tiles with mismatched sub-tile
    offsets, which Mosaic rejects ("result/input offset mismatch on
    non-concat dimension" -> SIGABRT through the remote-compile tunnel);
    8-aligned concats compile fine (scripts/probe_mosaic_concat.py)."""
    return -(-(n // 2) // _BASE) * _BASE


def _btri_base(L):
    """(G,b,b) lower-triangular inverse for b <= 8, concat/slice-free.

    L = D (I + N) with N strictly lower (nilpotent, N^b = 0), so
    inv(I+N) = sum_k (-N)^k = prod_j (I + M^(2^j)), M = -N — an EXACT
    log-depth product of matmuls (Mosaic-friendly), then a diagonal
    column-scale by 1/d.  Mirrors qp/blockinv.py tri_lower_inverse's math
    without any sub-8 block assembly."""
    b = L.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, b, b), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, b, b), 2)
    eye = (rows == cols).astype(L.dtype)
    d = jnp.sum(L * eye, axis=2, keepdims=True)            # (G, b, 1) diag
    M = jnp.where(rows > cols, -L / d, 0.0)                # M = -N
    X = eye + M
    k = 1
    while k < b - 1:                 # product covers M^0 .. M^(2k+1)
        M = _bmm(M, M)
        X = _bmm(X, eye + M)
        k *= 2
    return X / jnp.swapaxes(d, 1, 2)


def _bchol_base(K):
    """(G,b,b) unblocked Cholesky for b <= 8, concat/slice-free.

    Right-looking column sweep; column extraction/placement via onehot
    masks + reductions (Mosaic supports iota/elementwise/reduce; `.at[].set`
    lowers to scatter and sub-8 concats mis-tile — see _split).  Same 1e-10
    pivot floor as qp/blockinv.py chol_blocked."""
    b = K.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, b, b), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, b, b), 2)
    L = jnp.zeros_like(K)
    M = K
    for j in range(b):
        ej = (cols == j).astype(K.dtype)                   # column-j mask
        djj = _sum2(M * ej * (rows == j))
        d = jnp.sqrt(jnp.maximum(djj, 1e-10))
        colj = jnp.sum(M * ej, axis=2, keepdims=True)      # (G, b, 1)
        lj = jnp.where(rows[:, :, :1] >= j, colj / d, 0.0)
        L = L + lj * ej
        M = M - lj * jnp.swapaxes(lj, 1, 2)
    return L


def _btri_lower_inverse(L):
    """Batched (G,n,n) lower-triangular inverse, blocked recursion
    (mirrors qp/blockinv.py tri_lower_inverse with a leading batch dim).
    Requires n to be a multiple of 8 above the base case (the fused solver
    pads its QPs to that — admm_solve_fused_batch)."""
    n = L.shape[-1]
    if n <= _BASE:
        return _btri_base(L)
    h = _split(n)
    X11 = _btri_lower_inverse(L[:, :h, :h])
    X22 = _btri_lower_inverse(L[:, h:, h:])
    X21 = -_bmm(X22, _bmm(L[:, h:, :h], X11))
    # block assembly via concatenate (NOT .at[].set: that lowers to scatter,
    # which Mosaic TPU cannot compile inside a kernel)
    top = jnp.concatenate(
        [X11, jnp.zeros((L.shape[0], h, n - h), L.dtype)], axis=2)
    bot = jnp.concatenate([X21, X22], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _bchol(K):
    """Batched (G,n,n) blocked Cholesky (mirrors qp/blockinv.py chol_blocked;
    same 1e-10 pivot floor).  n above the base case must be a multiple of 8
    (see _split)."""
    n = K.shape[-1]
    if n <= _BASE:
        return _bchol_base(K)
    h = _split(n)
    L11 = _bchol(K[:, :h, :h])
    L11_inv = _btri_lower_inverse(L11)
    L21 = _bmm_nt(K[:, h:, :h], L11_inv)
    S = K[:, h:, h:] - _bmm_nt(L21, L21)
    L22 = _bchol(S)
    top = jnp.concatenate(
        [L11, jnp.zeros((K.shape[0], h, n - h), K.dtype)], axis=2)
    bot = jnp.concatenate([L21, L22], axis=2)
    return jnp.concatenate([top, bot], axis=1)


def _bspd_inverse_chol(K, eye):
    """Batched spd_inverse_chol (qp/blockinv.py) with ns_steps=1: Jacobi
    pre-scale, blocked Cholesky, triangular inverse, one Newton-Schulz
    correction with the divergence safeguard, finite fallback."""
    d = jnp.sum(K * eye, axis=1, keepdims=True)             # diag as (G,1,n)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    Ks = K * s * jnp.swapaxes(s, 1, 2)
    L = _bchol(Ks)
    L_inv = _btri_lower_inverse(L)
    X0 = _bmm_tn(L_inv, L_inv)
    X = _bmm(X0, 2.0 * eye - _bmm(Ks, X0))
    r1 = _sum2((eye - _bmm(Ks, X)) ** 2)
    r0 = _sum2((eye - _bmm(Ks, X0)) ** 2)
    X = jnp.where(r1 < r0 * 4.0 + 1.0, X, X0)
    finite = _min2(jnp.isfinite(X).astype(K.dtype)) > 0.5
    X = jnp.where(finite, X, eye)
    return X * s * jnp.swapaxes(s, 1, 2)


def _admm_fused_kernel(n: int, m: int, iters: int, adapt_rounds: int,
                       equilibrate_iters: int, rho0: float, sigma: float,
                       alpha: float, rho_eq_scale: float, inf: float,
                       p_ref, q_ref, a_ref, l_ref, u_ref, eqf_ref,
                       x0_ref, y0_ref,
                       x_out, y_out, d_out, e_out, c_out):
    """The ENTIRE admm_solve device pipeline for one G-block of scenarios.

    Semantics mirror qp/admm.py admm_solve with mode="blockinv" exactly:
    modified-Ruiz equilibration + cost scaling, warm-start scaling, per-round
    K assembly + spd_inverse_chol + `iters/adapt_rounds` refined-inverse ADMM
    updates, residual-ratio rho adaptation clipped to [1e-3, 1e3].  Outputs
    are in the SCALED frame plus the (D, E, c) scales; the caller unscales
    and computes final residuals (cheap batched XLA ops)."""
    P = p_ref[:]               # (G, n, n)
    q = q_ref[:]               # (G, 1, n)
    A = a_ref[:]               # (G, m, n)
    l = l_ref[:]               # (G, 1, m)
    u = u_ref[:]               # (G, 1, m)
    eqf = eqf_ref[:]           # (G, 1, m)  1.0 on equality rows
    G = P.shape[0]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=P.dtype), (G, n, n))

    # ---- Ruiz equilibration + cost scaling (qp/admm.py ruiz_equilibrate) --
    D = jnp.ones((G, 1, n), P.dtype)
    E = jnp.ones((G, 1, m), P.dtype)
    c = jnp.ones((G, 1, 1), P.dtype)
    for _ in range(equilibrate_iters):
        cn = jnp.maximum(jnp.max(jnp.abs(P), axis=1, keepdims=True),
                         jnp.max(jnp.abs(A), axis=1, keepdims=True))  # (G,1,n)
        cm = jnp.swapaxes(jnp.max(jnp.abs(A), axis=2, keepdims=True),
                          1, 2)                                        # (G,1,m)
        dn = jnp.where(cn < 1e-10, 1.0,
                       jax.lax.rsqrt(jnp.maximum(cn, 1e-12)))
        dm = jnp.where(cm < 1e-10, 1.0,
                       jax.lax.rsqrt(jnp.maximum(cm, 1e-12)))
        P = P * jnp.swapaxes(dn, 1, 2) * dn
        q = q * dn
        A = A * jnp.swapaxes(dm, 1, 2) * dn
        D = D * dn
        E = E * dm
        pcol = jnp.max(jnp.abs(P), axis=1, keepdims=True)
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(pcol, axis=2, keepdims=True),
                        jnp.max(jnp.abs(q), axis=2, keepdims=True)), 1e-12)
        P = P * gamma
        q = q * gamma
        c = c * gamma
    l = jnp.where(l <= -inf, l, E * l)
    u = jnp.where(u >= inf, u, E * u)

    # ---- warm-start scaling + z init ------------------------------------
    x = x0_ref[:] / D                                       # (G, 1, n)
    y = y0_ref[:] * c / E                                   # (G, 1, m)
    ax = jnp.swapaxes(jnp.sum(A * x, axis=2, keepdims=True), 1, 2)
    z = jnp.clip(ax, l, u)                                  # (G, 1, m)

    rho_pat = 1.0 + eqf * (rho_eq_scale - 1.0)              # (G, 1, m)
    rho_s = jnp.full((G, 1, 1), rho0, P.dtype)
    n_rounds = max(1, adapt_rounds)
    iters_per = max(1, iters // n_rounds)

    for r_i in range(n_rounds):
        rho = rho_pat * rho_s                               # (G, 1, m)
        rho_inv = 1.0 / rho
        # K = P + sigma I + A' diag(rho) A — contraction over the m axis of
        # both operands (_bmm_tn), so A is never relaid out
        K = P + sigma * eye + _bmm_tn(A * jnp.swapaxes(rho, 1, 2), A)
        K_inv = _bspd_inverse_chol(K, eye)

        def body(_, carry, rho=rho, rho_inv=rho_inv):
            x, z, y = carry      # (G,1,n), (G,1,m), (G,1,m)
            w = jnp.swapaxes(rho * z - y, 1, 2)                  # (G, m, 1)
            atw = jnp.sum(A * w, axis=1, keepdims=True)          # (G, 1, n)
            rhs = sigma * x - q + atw
            x_a = jnp.sum(K_inv * rhs, axis=2, keepdims=True)    # (G, n, 1)
            kxa = jnp.sum(K * x_a, axis=1, keepdims=True)        # (G, 1, n)
            r = rhs - kxa
            corr = jnp.sum(K_inv * r, axis=2, keepdims=True)     # (G, n, 1)
            x_t = jnp.swapaxes(x_a + corr, 1, 2)                 # (G, 1, n)
            z_t = jnp.swapaxes(
                jnp.sum(A * x_t, axis=2, keepdims=True), 1, 2)   # (G, 1, m)
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_r = alpha * z_t + (1.0 - alpha) * z
            z_n = jnp.clip(z_r + rho_inv * y, l, u)
            y_n = y + rho * (z_r - z_n)
            return x_n, z_n, y_n

        x, z, y = jax.lax.fori_loop(0, iters_per, body, (x, z, y))

        if r_i + 1 < n_rounds:
            ax = jnp.swapaxes(jnp.sum(A * x, axis=2, keepdims=True), 1, 2)
            # P symmetric: (P x) as a row = sublane reduction of P * x_col
            px = jnp.sum(P * jnp.swapaxes(x, 1, 2), axis=1, keepdims=True)
            aty = jnp.sum(A * jnp.swapaxes(y, 1, 2), axis=1,
                          keepdims=True)                     # A'y  (G,1,n)
            amax = lambda v: _max2(jnp.abs(v))  # noqa: E731
            rp = amax(ax - z) / jnp.maximum(
                jnp.maximum(amax(ax), amax(z)), 1e-12)
            rd = amax(px + q + aty) / jnp.maximum(
                jnp.maximum(amax(px), jnp.maximum(amax(q), amax(aty))),
                1e-12)
            rho_s = jnp.clip(
                rho_s * jnp.sqrt(rp / jnp.maximum(rd, 1e-12)), 1e-3, 1e3)

    x_out[:] = x
    y_out[:] = y
    d_out[:] = D
    e_out[:] = E
    c_out[:] = c


def _pick_g_fused(n: int, m: int, budget_bytes: int = 3 << 20) -> int:
    """G for the fused kernel: the Cholesky recursion holds several (G,n,n)
    temporaries on top of the iteration state."""
    per = (6 * _pad_bytes(n, n)           # P, K, K_inv, eye, chol temps
           + 2 * _pad_bytes(m, n)         # A + product temp
           + 10 * _pad_bytes(1, m)
           + 6 * _pad_bytes(1, n)
           + 2 * _pad_bytes(m, 1) + _pad_bytes(n, 1))
    g = max(1, budget_bytes // per)
    p = 1
    while p * 2 <= g:
        p *= 2
    return min(p, 128)


@functools.partial(jax.jit, static_argnames=(
    "iters", "adapt_rounds", "equilibrate_iters", "rho0", "sigma", "alpha",
    "rho_eq_scale", "inf", "g", "interpret"))
def admm_solve_fused_batch(P, q, A, l, u, eqf, x0, y0,
                           iters: int, adapt_rounds: int,
                           equilibrate_iters: int, rho0: float, sigma: float,
                           alpha: float, rho_eq_scale: float, inf: float,
                           g: int, interpret: bool = False):
    """Batched fused solve: inputs (B, ...), returns scaled (x, y, D, E, c)."""
    B = P.shape[0]
    n = P.shape[-1]
    m = A.shape[-2]
    dtype = P.dtype

    # Pad the primal dimension to a multiple of 8 (WBC: 30 -> 32) so the
    # blocked-Cholesky recursion only ever concats at 8-aligned offsets (see
    # _split).  Padded variables solve min 1/2 x_p^2 (P diag 1, q 0, A col 0)
    # -> fixed point x_p = 0; sliced back off on return.
    n0 = n
    n_extra = (-n) % _BASE
    if n_extra:
        n = n + n_extra
        pad_diag = (jnp.arange(n) >= n0).astype(dtype)
        P = (jnp.pad(P, ((0, 0), (0, n_extra), (0, n_extra)))
             + jnp.eye(n, dtype=dtype) * pad_diag)
        q = jnp.pad(q, ((0, 0), (0, n_extra)))
        A = jnp.pad(A, ((0, 0), (0, 0), (0, n_extra)))
        x0 = jnp.pad(x0, ((0, 0), (0, n_extra)))

    Bp = -(-B // g) * g
    if Bp != B:
        pad = lambda a, fill=0.0: jnp.concatenate(  # noqa: E731
            [a, jnp.full((Bp - B,) + a.shape[1:], fill, a.dtype)], axis=0)
        # padded scenarios solve a trivial SPD QP (P = I, free rows)
        P = jnp.concatenate([P, jnp.broadcast_to(
            jnp.eye(n, dtype=dtype), (Bp - B, n, n))], axis=0)
        q, x0 = pad(q), pad(x0)
        A, y0, eqf = pad(A), pad(y0), pad(eqf)
        l, u = pad(l, -inf), pad(u, inf)

    kern = functools.partial(_admm_fused_kernel, n, m, iters, adapt_rounds,
                             equilibrate_iters, rho0, sigma, alpha,
                             rho_eq_scale, inf)
    mat = lambda s: pl.BlockSpec((g,) + s, lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    row = lambda v: v[:, None, :]  # noqa: E731
    x_o, y_o, d_o, e_o, c_o = pl.pallas_call(
        kern,
        grid=(Bp // g,),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, 1, n), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
            jax.ShapeDtypeStruct((Bp, 1, n), dtype),
            jax.ShapeDtypeStruct((Bp, 1, m), dtype),
            jax.ShapeDtypeStruct((Bp, 1, 1), dtype),
        ),
        in_specs=[mat((n, n)), mat((1, n)), mat((m, n)), mat((1, m)),
                  mat((1, m)), mat((1, m)), mat((1, n)), mat((1, m))],
        out_specs=(mat((1, n)), mat((1, m)), mat((1, n)), mat((1, m)),
                   mat((1, 1))),
        interpret=interpret,
    )(P, row(q), A, row(l), row(u), row(eqf), row(x0), row(y0))
    return (x_o[:B, 0, :n0], y_o[:B, 0, :], d_o[:B, 0, :n0], e_o[:B, 0, :],
            c_o[:B, 0, 0])


_FUSED_CACHE: dict = {}


def admm_solve_fused(P, q, A, l, u, eqf, x0, y0,
                     iters: int, adapt_rounds: int, equilibrate_iters: int,
                     rho0: float, sigma: float, alpha: float,
                     rho_eq_scale: float, inf: float,
                     interpret: bool = False):
    """custom_vmap front for the fused solver (scaled outputs; see
    admm_solve_fused_batch).  Unbatched calls run with G=1."""
    key = (int(iters), int(adapt_rounds), int(equilibrate_iters), float(rho0),
           float(sigma), float(alpha), float(rho_eq_scale), float(inf),
           bool(interpret))
    fn = _FUSED_CACHE.get(key)
    if fn is None:
        kw = dict(iters=iters, adapt_rounds=adapt_rounds,
                  equilibrate_iters=equilibrate_iters, rho0=rho0, sigma=sigma,
                  alpha=alpha, rho_eq_scale=rho_eq_scale, inf=inf,
                  interpret=interpret)

        @jax.custom_batching.custom_vmap
        def base(P, q, A, l, u, eqf, x0, y0):
            out = admm_solve_fused_batch(P[None], q[None], A[None], l[None],
                                         u[None], eqf[None], x0[None],
                                         y0[None], g=1, **kw)
            return tuple(o[0] for o in out)

        @base.def_vmap
        def _rule(axis_size, in_batched, *args):  # noqa: ANN001
            args = [a if b else
                    jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
                    for a, b in zip(args, in_batched)]
            n = args[0].shape[-1]
            m = args[2].shape[-2]
            out = admm_solve_fused_batch(*args, g=_pick_g_fused(n, m), **kw)
            return out, (True,) * 5

        fn = base
        _FUSED_CACHE[key] = fn
    return fn(P, q, A, l, u, eqf, x0, y0)


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
