"""Infeasible/diverged-QP handling policy (SURVEY.md §5.3; VERDICT.md round-1
missing #3): per-scenario status vector + last-feasible-plan fallback.

Injection vector: a warm start of 1e18 drives the f32 ADMM to non-finite
iterates within one solve — the same signature as a genuinely diverged or
infeasible scenario — without needing a pathological QP formulation."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpctsid_tpu.cascade import (CascadeConfigured, cascade_rollout,
                                 init_controller)
from mpctsid_tpu.cascade.engine import cascade_period
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.qp.admm import admm_solve

M = SOLO12
F32 = jnp.float32


def standing_q0():
    q0 = np.zeros(19, np.float32)
    q0[2] = M.h_ref
    q0[6] = 1.0
    q0[7:] = M.q_stand
    return jnp.asarray(q0)


def test_admm_status_flags_divergence():
    """ok must be False when the solve returns non-finite/garbage x."""
    r = np.random.default_rng(0)
    n, m = 8, 12
    Q = r.normal(size=(n, n))
    P = jnp.asarray(Q @ Q.T + np.eye(n), F32)
    q = jnp.asarray(r.normal(size=n), F32)
    A = jnp.asarray(r.normal(size=(m, n)), F32)
    l = jnp.asarray(-np.ones(m), F32)
    u = jnp.asarray(np.ones(m), F32)
    good = admm_solve(P, q, A, l, u, iters=100, adapt_rounds=2)
    assert bool(good.ok)
    bad = admm_solve(P, q, A, l, u,
                     x0=jnp.full(n, 1e18, F32), y0=jnp.full(m, 1e18, F32),
                     iters=100, adapt_rounds=2)
    assert (not bool(bad.ok)) or bool(np.isfinite(np.asarray(bad.x)).all())


def test_poisoned_scenario_is_contained():
    """One scenario with garbage warm starts must (a) be flagged, (b) fall
    back to the carried plan, and (c) leave every other scenario bitwise
    untouched relative to a clean batch."""
    cfg = EngineConfig(gait="trot", v_ref=(0.2, 0.0, 0.0))
    cc = CascadeConfigured(M, cfg)
    q0 = standing_q0()
    B = 4
    gid_s = jnp.int32(GAIT_IDS["trot"])
    ctl = init_controller(M, cfg, cc.tree, q0, gid_s)
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)  # noqa: E731
    ctl_b = jax.tree_util.tree_map(rep, ctl)
    plant_b = jax.tree_util.tree_map(rep, PlantState.init(q0))
    gid = jnp.full((B,), gid_s, jnp.int32)
    vc = jnp.tile(jnp.asarray(cfg.v_ref, F32), (B, 1))
    cp = jax.tree_util.tree_map(rep, ContactParams.default())

    step = jax.jit(jax.vmap(functools.partial(cascade_period, cc)))
    ctl_clean, plant_clean, _, met_clean = step(ctl_b, plant_b, gid, vc, cp)

    # poison scenario 0's MPC warm start
    ctl_p = ctl_b
    wx = ctl_b.mpc_warm_x.at[0].set(1e18)
    wy = ctl_b.mpc_warm_y.at[0].set(1e18)
    import dataclasses
    ctl_p = dataclasses.replace(ctl_b, mpc_warm_x=wx, mpc_warm_y=wy)
    ctl_out, plant_out, _, met = step(ctl_p, plant_b, gid, vc, cp)

    mpc_ok = np.asarray(met["mpc_ok"])
    assert not mpc_ok[0], "poisoned scenario was not flagged"
    assert mpc_ok[1:].all(), "healthy scenarios were flagged"

    # (b) fallback: the carried plan must be finite (shifted last-feasible)
    assert np.isfinite(np.asarray(ctl_out.f_plan[0])).all()
    np.testing.assert_allclose(
        np.asarray(ctl_out.f_plan[0]),
        np.asarray(jnp.concatenate([ctl_b.f_plan[0, 1:],
                                    ctl_b.f_plan[0, -1:]], axis=0)))
    # warm start was not adopted from the diverged solve
    assert np.isfinite(np.asarray(ctl_out.mpc_warm_x[0])).all() or \
        np.allclose(np.asarray(ctl_out.mpc_warm_x[0]), 1e18)

    # (c) healthy scenarios bitwise-match the clean batch
    for name in ["f_plan", "mpc_warm_x", "wbc_warm_x"]:
        a = np.asarray(getattr(ctl_out, name)[1:])
        b = np.asarray(getattr(ctl_clean, name)[1:])
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_array_equal(np.asarray(plant_out.q[1:]),
                                  np.asarray(plant_clean.q[1:]))
    # the poisoned scenario's PLANT still integrated finite torques
    assert np.isfinite(np.asarray(plant_out.q[0])).all()


def test_poisoned_scenario_recovers_over_rollout():
    """With the fallback plan + impedance containment, a scenario whose warm
    start was poisoned at t=0 must stay upright over a short rollout."""
    cfg = EngineConfig(gait="trot", v_ref=(0.2, 0.0, 0.0))
    cc = CascadeConfigured(M, cfg)
    q0 = standing_q0()
    gid = jnp.int32(GAIT_IDS["trot"])
    ctl = init_controller(M, cfg, cc.tree, q0, gid)
    import dataclasses
    ctl = dataclasses.replace(
        ctl,
        mpc_warm_x=jnp.full_like(ctl.mpc_warm_x, 1e18),
        mpc_warm_y=jnp.full_like(ctl.mpc_warm_y, 1e18))
    plant = PlantState.init(q0)
    roll = jax.jit(functools.partial(cascade_rollout, cc, n_periods=10))
    _, plant, metrics = roll(ctl, plant, gid,
                             jnp.asarray(cfg.v_ref, F32),
                             ContactParams.default())
    x = np.asarray(metrics["x_srb"])
    assert np.isfinite(x).all()
    assert np.all(x[:, 2] > 0.15), "fell after warm-start poisoning"
