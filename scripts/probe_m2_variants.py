"""A/B: current m2 kernel (3 relayout swaps/iter) vs an At-based variant
(1 swap/iter) at several G, on the production MPC shapes.  Round-5 scratch
probe; the winner gets wired into qp/pallas_kernels.py."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench import build_batch, diff_time, _mpc_qp_batch  # noqa: E402
from mpctsid_tpu.config import EngineConfig  # noqa: E402
from mpctsid_tpu.qp.admm import ruiz_equilibrate  # noqa: E402
from mpctsid_tpu.qp.blockinv import spd_inverse_chol  # noqa: E402
from mpctsid_tpu.qp.pallas_kernels import admm_iterate_m2_packed_batch  # noqa: E402


def _kernel_m2t(iters, sigma, alpha,
                m2_ref, at_ref, q_ref, l_ref, u_ref, rho_ref,
                x0_ref, z0_ref, y0_ref, x_out, z_out, y_out):
    M2 = m2_ref[:]               # (G, n, n) symmetric
    At = at_ref[:]               # (G, n, m)
    q = jnp.swapaxes(q_ref[:], 1, 2)    # -> (G, n, 1) col, once
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]
    rho_inv = 1.0 / rho
    x0 = jnp.swapaxes(x0_ref[:], 1, 2)  # -> (G, n, 1) col, once

    def body(_, carry):
        x, z, y = carry          # x (G,n,1) col; z, y (G,1,m) rows
        w = rho * z - y                                        # (G, 1, m)
        atw = jnp.sum(At * w, axis=2, keepdims=True)           # (G, n, 1)
        rhs = sigma * x - q + atw                              # (G, n, 1)
        xt_row = jnp.sum(M2 * rhs, axis=1, keepdims=True)      # (G, 1, n)
        xt = jnp.swapaxes(xt_row, 1, 2)                        # the ONE swap
        zt = jnp.sum(At * xt, axis=1, keepdims=True)           # (G, 1, m)
        x_n = alpha * xt + (1.0 - alpha) * x
        z_r = alpha * zt + (1.0 - alpha) * z
        z_n = jnp.clip(z_r + rho_inv * y, l, u)
        y_n = y + rho * (z_r - z_n)
        return x_n, z_n, y_n

    x, z, y = jax.lax.fori_loop(0, iters, body, (x0, z0_ref[:], y0_ref[:]))
    x_out[:] = jnp.swapaxes(x, 1, 2)
    z_out[:] = z
    y_out[:] = y


@functools.partial(jax.jit, static_argnames=("iters", "g"))
def m2t_batch(M2, At, q, l, u, rho_vec, x, z, y, iters, g):
    B, n = M2.shape[0], M2.shape[-1]
    m = At.shape[-1]
    dtype = M2.dtype
    Bp = -(-B // g) * g
    assert Bp == B
    kern = functools.partial(_kernel_m2t, iters, 1e-6, 1.6)
    mat = lambda s: pl.BlockSpec((g,) + s, lambda i: (i, 0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    row = lambda v: v[:, None, :]  # noqa: E731
    x_o, z_o, y_o = pl.pallas_call(
        kern, grid=(Bp // g,),
        out_shape=(jax.ShapeDtypeStruct((Bp, 1, n), dtype),
                   jax.ShapeDtypeStruct((Bp, 1, m), dtype),
                   jax.ShapeDtypeStruct((Bp, 1, m), dtype)),
        in_specs=[mat((n, n)), mat((n, m)), mat((1, n)), mat((1, m)),
                  mat((1, m)), mat((1, m)), mat((1, n)), mat((1, m)),
                  mat((1, m))],
        out_specs=(mat((1, n)), mat((1, m)), mat((1, m))),
    )(M2, At, row(q), row(l), row(u), row(rho_vec), row(x), row(z), row(y))
    return x_o[:, 0, :], z_o[:, 0, :], y_o[:, 0, :]


def main():
    B = 1024
    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    cc, args = build_batch(cfg, B)
    Ps, qs, As, ls, us = _mpc_qp_batch(cc, args)
    Pb, qb, Ab, lb, ub, D, E, c = jax.jit(jax.vmap(
        lambda P, q, A, l, u: ruiz_equilibrate(P, q, A, l, u, 8)))(
        Ps, qs, As, ls, us)
    n, m = 192, 320
    rho_vec = jnp.full((B, m), 0.1, jnp.float32)
    Ks = jax.jit(jax.vmap(
        lambda P, A, rv: P + 1e-6 * jnp.eye(n, dtype=P.dtype)
        + (A.T * rv) @ A))(Pb, Ab, rho_vec)
    Kinvs = jax.jit(jax.vmap(lambda K: spd_inverse_chol(K, ns_steps=1)))(Ks)
    M2s = jax.jit(lambda Ki, K: 2.0 * Ki - Ki @ (K @ Ki))(Kinvs, Ks)
    Ats = jnp.swapaxes(Ab, 1, 2)

    z0 = jnp.zeros_like(lb)
    x0 = jnp.zeros_like(qb)

    # correctness vs the committed m2 kernel
    xa, za, ya = admm_iterate_m2_packed_batch(
        M2s, Ab, qb, lb, ub, rho_vec, x0, z0, z0,
        iters=40, sigma=1e-6, alpha=1.6, g=8)
    xb, zb, yb = m2t_batch(M2s, Ats, qb, lb, ub, rho_vec, x0, z0, z0,
                           iters=40, g=8)
    print("m2t vs m2 max dx:", float(jnp.abs(xa - xb).max()))

    def chain_t(g, nrep):
        @functools.partial(jax.jit, static_argnames=("nrep", "g"))
        def run(M2, At, q, l, u, rv, nrep, g):
            def body(carry, _):
                x, z, y = carry
                return m2t_batch(M2, At, q, l, u, rv, x, z, y,
                                 iters=40, g=g), ()
            c0 = (x0, z0, z0)
            (x, z, y), _ = jax.lax.scan(body, c0, None, length=nrep)
            return x.sum()
        return lambda: run(M2s, Ats, qb, lb, ub, rho_vec, nrep=nrep, g=g)

    for g in (4, 8, 16):
        try:
            t = diff_time(lambda nr, g=g: chain_t(g, nr), 1, 4, reps=3)
            print(f"m2t iterate 40it B=1024 g={g}: {t*1e3:.2f} ms")
        except Exception as e:
            print(f"m2t g={g}: FAILED {str(e)[:160]}")


if __name__ == "__main__":
    main()
