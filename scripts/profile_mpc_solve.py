"""Stage breakdown of the production MPC ADMM solve (VERDICT.md round-4
missing #2 / next #1: the solve streams at 38% of HBM peak — find out which
internal stage is the bottleneck before building a kernel for it).

Times, at the production budget (iters=80, adapt_rounds=2, pallas_vpu):
  ruiz        8-round equilibration (XLA)
  kbuild      K = P + sigma I + A' rho A (XLA batched GEMM), x2 rounds
  kinv        spd_inverse_chol (blocked Cholesky + NS correction), x2 rounds
  iterate     the Pallas VPU iteration kernel, 2 x 40 iters
  full        the whole admm_solve for reference (sum check)

Usage: python scripts/profile_mpc_solve.py [B]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import json  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_batch, diff_time, _mpc_qp_batch  # noqa: E402
from mpctsid_tpu.config import EngineConfig  # noqa: E402
from mpctsid_tpu.qp.admm import admm_solve, ruiz_equilibrate  # noqa: E402
from mpctsid_tpu.qp.blockinv import spd_inverse_chol  # noqa: E402
from mpctsid_tpu.qp.pallas_kernels import admm_iterate_vpu  # noqa: E402


def chain(step, batch, init, n):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(batch, init, n):
        def body(c, _):
            return step(batch, c), ()
        c, _ = jax.lax.scan(body, init, None, length=n)
        return jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), c, 0.0)
    return lambda: run(batch, init, n=n)


def main(B=1024):
    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    cc, args = build_batch(cfg, B)
    Ps, qs, As, ls, us = _mpc_qp_batch(cc, args)
    n = Ps.shape[-1]
    m = As.shape[-2]
    out = {"B": B, "n": n, "m": m}

    def t_of(name, step, batch, init, n_long=4):
        t = diff_time(lambda k: chain(step, batch, init, k), 1, n_long,
                      reps=3)
        out[name] = round(t * 1e3, 2)
        print(f"  {name}: {out[name]} ms", file=sys.stderr, flush=True)
        return t

    # ---- full solve per backend -----------------------------------------
    def full_step(backend):
        def step(batch, carry):
            x, y = carry
            sol = jax.vmap(lambda P, q, A, l, u, x0, y0: admm_solve(
                P, q + 1e-7 * x0.mean(), A, l, u, x0=x0, y0=y0,
                iters=cfg.solver.mpc_iters,
                adapt_rounds=cfg.solver.mpc_adapt_rounds,
                rho=0.1, backend=backend))(*batch, x, y)
            return (sol.x, sol.y)
        return step

    init = (jnp.zeros_like(qs), jnp.zeros_like(ls))
    for be in ("pallas_vpu", "pallas_m2"):
        t_of(f"full_{be}", full_step(be), (Ps, qs, As, ls, us), init)

    # backend solution parity on the production MPC batch (warm chain of 2)
    def solve2(backend):
        @functools.partial(jax.jit, static_argnames=("backend",))
        def run(Ps, qs, As, ls, us, backend):
            s = full_step(backend)((Ps, qs, As, ls, us), init)
            s = full_step(backend)((Ps, qs, As, ls, us), s)
            return s[0]
        return run(Ps, qs, As, ls, us, backend)

    import numpy as np
    dx = np.abs(np.asarray(solve2("pallas_m2"))
                - np.asarray(solve2("xla"))).max()
    out["m2_vs_xla_max_dx"] = float(f"{dx:.3g}")
    print(f"  m2 vs xla max dx: {dx:.3g}", file=sys.stderr, flush=True)

    # ---- ruiz -----------------------------------------------------------
    def ruiz_step(batch, carry):
        P, q, A, l, u = batch
        Pb, qb, Ab, lb, ub, D, E, c = jax.vmap(
            lambda P, q, A, l, u: ruiz_equilibrate(
                P, q + 1e-7 * carry.mean(), A, l, u, 8))(P, q, A, l, u)
        return carry + D.sum(-1) + E.sum(-1) + qb.sum(-1)

    t_of("ruiz", ruiz_step, (Ps, qs, As, ls, us), jnp.zeros(B))

    # equilibrated data for the downstream stages
    Pb, qb, Ab, lb, ub, D, E, c = jax.jit(jax.vmap(
        lambda P, q, A, l, u: ruiz_equilibrate(P, q, A, l, u, 8)))(
        Ps, qs, As, ls, us)
    rho_vec = jnp.full((B, m), 0.1, jnp.float32)

    # ---- K build (one round; production runs 2) -------------------------
    def kbuild_step(batch, carry):
        P, A, rv = batch
        K = jax.vmap(lambda P, A, rv, s: P + (1e-6 + 1e-9 * s)
                     * jnp.eye(n, dtype=P.dtype) + (A.T * rv) @ A)(
            P, A, rv, carry)
        return carry + K[:, 0, 0]

    t_of("kbuild_x1", kbuild_step, (Pb, Ab, rho_vec), jnp.zeros(B))

    Ks = jax.jit(jax.vmap(lambda P, A, rv: P + 1e-6 * jnp.eye(n, dtype=P.dtype)
                          + (A.T * rv) @ A))(Pb, Ab, rho_vec)

    # ---- K inverse (one round) ------------------------------------------
    def kinv_step(batch, carry):
        K = batch
        Ki = jax.vmap(lambda K, s: spd_inverse_chol(
            K + 1e-9 * s * jnp.eye(n, dtype=K.dtype), ns_steps=1))(K, carry)
        return carry + Ki[:, 0, 0]

    t_of("kinv_x1", kinv_step, Ks, jnp.zeros(B))

    K_invs = jax.jit(jax.vmap(lambda K: spd_inverse_chol(K, ns_steps=1)))(Ks)

    # ---- iterate kernel (one 40-iter block; production runs 2) ----------
    def iter_step(batch, carry):
        Ki, K, A, q, l, u, rv = batch
        x, z, y = carry
        return jax.vmap(lambda Ki, K, A, q, l, u, rv, x, z, y:
                        admm_iterate_vpu(Ki, K, A, q, l, u, rv, x, z, y,
                                         iters=40))(
            Ki, K, A, q, l, u, rv, x, z, y)

    z0 = jnp.zeros_like(lb)
    t_of("iterate_40x1", iter_step, (K_invs, Ks, Ab, qb, lb, ub, rho_vec),
         (jnp.zeros_like(qb), z0, z0))

    # ---- residual/adapt computation (one round) -------------------------
    def resid_step(batch, carry):
        P, q, A = batch
        x, y = carry

        def one(P, q, A, x, y):
            Ax = A @ x
            Px = P @ x
            Aty = A.T @ y
            rp = jnp.max(jnp.abs(Ax)) + jnp.max(jnp.abs(Px))
            return rp + jnp.max(jnp.abs(Aty))

        r = jax.vmap(one)(P, q, A, x, y)
        return (x + 1e-9 * r[:, None], y)

    t_of("resid_x1", resid_step, (Pb, qb, Ab),
         (jnp.zeros_like(qb), jnp.zeros_like(lb)))

    acct = (out["ruiz"] + 2 * out["kbuild_x1"] + 2 * out["kinv_x1"]
            + 2 * out["iterate_40x1"] + out["resid_x1"])
    out["accounted"] = round(acct, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
