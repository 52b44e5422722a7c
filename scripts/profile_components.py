"""Per-component device timing of the cascade at B scenarios (SURVEY.md §5.1).

Breaks one MPC period's cost into its stages on the current default device and
compares the XLA vs Pallas ADMM backends per QP stage:

  mpc_xla / mpc_pallas     100-iter 4-round MPC QP solve batch (192 vars)
  wbc_xla / wbc_pallas     60-iter 3-round WBC QP solve batch (30 vars)
  wbc_build                WBC QP assembly (dynamics: CRBA/RNEA/Jacobians)
  plant                    one plant step batch
  period                   the full fused cascade_period

All numbers are differential scan-chain device times (bench.py protocol), in
ms per call for the WHOLE batch.  Prints one JSON line.
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_batch, diff_time, _mpc_qp_batch  # noqa: E402


def chain(solver, batch, n):
    """Scan-chain n dependent solve batches (defeats CSE, amortizes dispatch).

    The batch is passed as ARGUMENTS, not closed over: a jit-closure constant
    of 1024 KKT matrices (~150 MB) blows past the remote-compile payload limit
    (HTTP 413) on the tunneled TPU."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(Ps, qs, As, ls, us, n):
        def body(carry, _):
            x_p, y_p = carry
            sol = jax.vmap(lambda P, q, A, l, u, x0, y0: solver(
                P, q + 1e-7 * x0.mean(), A, l, u, x0, y0))(Ps, qs, As, ls, us,
                                                           x_p, y_p)
            return (sol.x, sol.y), ()

        (x, _), _ = jax.lax.scan(
            body, (jnp.zeros_like(qs), jnp.zeros_like(ls)), None, length=n)
        return x.sum()

    return lambda: run(*batch, n=n)


def time_solver(solver, batch, lo=1, hi=4, reps=3):
    return diff_time(lambda n: chain(solver, batch, n), lo, hi, reps) * 1e3


def main(B=1024):
    from mpctsid_tpu.cascade import cascade_period
    from mpctsid_tpu.config import EngineConfig
    from mpctsid_tpu.env.plant import plant_step
    from mpctsid_tpu.qp.admm import admm_solve
    from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp
    from mpctsid_tpu.plan.gait import contacts_at

    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    cc, args = build_batch(cfg, B)
    ctl_b, plant_b, gid_b, vc_b, cp_b = args
    out = {"B": B, "device": jax.devices()[0].device_kind}

    # ---- MPC QP stage -----------------------------------------------------
    mpc_batch = _mpc_qp_batch(cc, args)
    for backend in ("xla", "pallas"):
        s = functools.partial(admm_solve, iters=cfg.solver.mpc_iters,
                              adapt_rounds=cfg.solver.mpc_adapt_rounds,
                              rho=0.1, backend=backend)
        out[f"mpc_{backend}_ms"] = round(time_solver(
            lambda P, q, A, l, u, x0, y0: s(P, q, A, l, u, x0=x0, y0=y0),
            mpc_batch), 2)

    # ---- WBC QP stage -----------------------------------------------------
    def wbc_qp_one(q, v, gid):
        contacts = contacts_at(gid, jnp.int32(0)).astype(q.dtype)
        refs = WbcRefs(
            contacts=contacts,
            f_mpc=jnp.zeros((4, 3), q.dtype).at[:, 2].set(
                cc.model.total_mass * cc.model.g / 2.0 * contacts),
            foot_pos_ref=jnp.zeros((4, 3), q.dtype),
            foot_vel_ref=jnp.zeros((4, 3), q.dtype),
            foot_acc_ref=jnp.zeros((4, 3), q.dtype),
            q_posture=jnp.asarray(cc.model.q_stand, q.dtype),
            base_rpy_ref=jnp.zeros(2, q.dtype),
            h_ref=jnp.asarray(cc.model.h_ref, q.dtype))
        H, g, A, l, u, _, _, _ = build_wbc_qp(cc.tree, cfg.wbc, q, v, refs)
        return H, g, A, l, u

    wbc_build = jax.jit(jax.vmap(wbc_qp_one))
    wbc_batch = wbc_build(plant_b.q, plant_b.v, gid_b)
    for backend in ("xla", "pallas"):
        s = functools.partial(admm_solve, iters=cfg.solver.wbc_iters,
                              adapt_rounds=cfg.solver.wbc_adapt_rounds,
                              rho=0.1, backend=backend, status_tol=0.5)
        out[f"wbc_{backend}_ms"] = round(time_solver(
            lambda P, q, A, l, u, x0, y0: s(P, q, A, l, u, x0=x0, y0=y0),
            wbc_batch), 2)

    # ---- WBC assembly (rigid-body dynamics) -------------------------------
    def build_chain(n):
        @jax.jit
        def run():
            def vbody(qs, _):
                outs = jax.vmap(wbc_qp_one)(qs, plant_b.v, gid_b)
                return qs + 1e-9 * outs[1][:, :19], ()
            q, _ = jax.lax.scan(vbody, plant_b.q, None, length=n)
            return q.sum()

        return run

    out["wbc_build_ms"] = round(diff_time(build_chain, 1, 6, reps=3) * 1e3, 2)

    # ---- plant step -------------------------------------------------------
    def plant_chain(n):
        tau0 = jnp.zeros((B, 12), jnp.float32)

        @jax.jit
        def run():
            def body(st, _):
                st2, _ = jax.vmap(lambda s, t, p: plant_step(
                    cc.tree, s, t, dt=cfg.cascade.wbc_dt, params=p))(
                        st, tau0, cp_b)
                return st2, ()
            st, _ = jax.lax.scan(body, plant_b, None, length=n)
            return st.q.sum()

        return run

    out["plant_ms"] = round(diff_time(plant_chain, 1, 11, reps=3) * 1e3, 2)

    # ---- full period ------------------------------------------------------
    def period_chain(n):
        @jax.jit
        def run():
            def body(carry, _):
                ctl, plant = carry
                ctl, plant, _, m = jax.vmap(
                    functools.partial(cascade_period, cc))(
                        ctl, plant, gid_b, vc_b, cp_b)
                return (ctl, plant), ()
            (ctl, plant), _ = jax.lax.scan(
                body, (ctl_b, plant_b), None, length=n)
            return plant.q.sum()

        return run

    out["period_ms"] = round(diff_time(period_chain, 1, 4, reps=3) * 1e3, 2)

    # ---- MPC QP assembly (condensation) ------------------------------------
    from mpctsid_tpu.cascade.engine import srb_state
    from mpctsid_tpu.mpc.srb import build_mpc_qp, reference_rollout
    from mpctsid_tpu.plan.footsteps import plan_footsteps_horizon
    from mpctsid_tpu import dyn

    def mpc_build_chain(n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(qs, vs, gid, vc, n):
            def one(q, v, g, c):
                x_srb = srb_state(q, v)
                feet = dyn.foot_positions(cc.tree, q)
                fsteps, _ = plan_footsteps_horizon(
                    cc.model, cfg.mpc, cfg.cascade, g, jnp.int32(0), x_srb,
                    c, feet)
                x_ref = reference_rollout(cc.model, cfg.mpc, x_srb, c)
                cont = jnp.stack(
                    [contacts_at(g, jnp.int32(k)).astype(jnp.float32)
                     for k in range(cfg.mpc.horizon)])
                P, q_l, A, l, u = build_mpc_qp(cc.model, cfg.mpc, x_srb,
                                               x_ref, fsteps, cont)
                return P, q_l

            def body(qs, _):
                P, q_l = jax.vmap(one)(qs, vs, gid, vc)
                return qs + 1e-12 * q_l[:, :19], ()

            q, _ = jax.lax.scan(body, qs, None, length=n)
            return q.sum()

        return lambda: run(plant_b.q, plant_b.v, gid_b, vc_b, n=n)

    out["mpc_build_ms"] = round(diff_time(mpc_build_chain, 1, 6, reps=3) * 1e3,
                                2)

    # ---- period with minimal solver iterations (non-solver overhead) -------
    def period_min_chain(n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(ctl_b, plant_b, gid_b, vc_b, cp_b, n):
            def body(carry, _):
                ctl, plant = carry
                ctl, plant, _, m = jax.vmap(functools.partial(
                    cascade_period, cc, mpc_iters=2, mpc_rounds=1,
                    wbc_iters=2, wbc_rounds=1))(ctl, plant, gid_b, vc_b, cp_b)
                return (ctl, plant), ()
            (ctl, plant), _ = jax.lax.scan(
                body, (ctl_b, plant_b), None, length=n)
            return plant.q.sum()

        return lambda: run(ctl_b, plant_b, gid_b, vc_b, cp_b, n=n)

    out["period_min_iter_ms"] = round(
        diff_time(period_min_chain, 1, 4, reps=3) * 1e3, 2)
    out["wbc_ticks_per_period"] = cfg.cascade.mpc_every
    print(json.dumps(out))


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    main(B)
