"""Per-scenario LOAD perturbations (BASELINE.json:9 "mu/load perturbation
batches"; VERDICT.md round-3 missing #3: payload mass used to be a trace-time
constant, so a payload spread across a batch was impossible).

Payload = point mass rigidly attached at the base origin, threaded as DATA
into the plant truth (env/plant.py extra_base_inertia), the controller's SRB
model (mpc/srb.py total_mass), and the WBC mass matrix/gravity bias
(wbc/tsid.py) — see dyn.point_mass_spatial.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from mpctsid_tpu import dyn
from mpctsid_tpu.cascade import (CascadeConfigured, cascade_rollout,
                                 init_controller)
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import NV, build_tree

M = SOLO12
F32 = jnp.float32
TREE = build_tree(M)


def standing_q0():
    q0 = np.zeros(19, np.float32)
    q0[2] = M.h_ref
    q0[6] = 1.0
    q0[7:] = M.q_stand
    return jnp.asarray(q0)


def test_point_mass_spatial_matches_crba_shift():
    """M(q) with a payload must equal M(q) plus the payload's 6x6 spatial
    block mapped into the generalized [lin; ang] base coordinates."""
    q = standing_q0()
    m_p = 0.37
    M0 = np.asarray(dyn.crba(TREE, q))
    M1 = np.asarray(dyn.crba(TREE, q,
                             extra_base_inertia=dyn.point_mass_spatial(m_p)))
    dM = M1 - M0
    expect = np.zeros((NV, NV))
    expect[0:3, 0:3] = m_p * np.eye(3)   # point mass at base origin: lin only
    np.testing.assert_allclose(dM, expect, atol=1e-5)


def test_payload_gravity_bias():
    """rnea bias (a=0, v=0) must grow by payload weight in the base z row."""
    q = standing_q0()
    v = jnp.zeros(NV, F32)
    m_p = 0.5
    h0 = np.asarray(dyn.rnea(TREE, q, v, v))
    h1 = np.asarray(dyn.rnea(TREE, q, v, v,
                             extra_base_inertia=dyn.point_mass_spatial(m_p)))
    # base linear rows are in LOCAL frame; at identity attitude z is row 2
    np.testing.assert_allclose(h1[2] - h0[2], m_p * 9.81, rtol=1e-5)
    np.testing.assert_allclose(h1[3:], h0[3:], atol=1e-5)


def test_payload_and_mu_spread_stays_upright():
    """The VERDICT round-3 done-criterion: a batch sweeping payload 0-0.5 kg
    AND mu simultaneously, trotting closed-loop, all upright."""
    cfg = EngineConfig(gait="trot", v_ref=(0.2, 0.0, 0.0))
    cc = CascadeConfigured(M, cfg)
    q0 = standing_q0()
    B = 6
    payload = jnp.linspace(0.0, 0.5, B).astype(F32)
    gid = jnp.full((B,), GAIT_IDS["trot"], jnp.int32)
    ctl = init_controller(M, cfg, cc.tree, q0, jnp.int32(GAIT_IDS["trot"]))
    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)  # noqa: E731
    ctl_b = jax.tree_util.tree_map(rep, ctl)
    plant_b = jax.tree_util.tree_map(rep, PlantState.init(q0))
    vc = jnp.tile(jnp.asarray(cfg.v_ref, F32), (B, 1))
    cp = ContactParams.default()
    cp_b = ContactParams(
        kp_n=rep(cp.kp_n), kd_n=rep(cp.kd_n), kp_t=rep(cp.kp_t),
        kd_t=rep(cp.kd_t),
        mu=jnp.asarray([0.5, 1.0, 0.6, 0.9, 0.7, 0.8], F32))
    roll = jax.jit(jax.vmap(
        lambda c, p, g, v, cp, pl: cascade_rollout(
            cc, c, p, g, v, cp, n_periods=4, payload=pl)))
    _, plant2, metrics = roll(ctl_b, plant_b, gid, vc, cp_b, payload)
    x = np.asarray(metrics["x_srb"])
    assert np.all(x[:, -1, 2] > 0.15), x[:, -1, 2]
    # the payload must actually alter the trajectory (it is data, not a no-op)
    assert not np.allclose(x[0], x[-1])


def test_unmodeled_payload_robustness():
    """payload_known=False: the controller plans for the nominal robot while
    the plant carries 0.3 kg extra — the cascade must still stand/trot."""
    cfg = EngineConfig(gait="trot", v_ref=(0.2, 0.0, 0.0))
    cc = CascadeConfigured(M, cfg)
    q0 = standing_q0()
    gid = jnp.int32(GAIT_IDS["trot"])
    ctl = init_controller(M, cfg, cc.tree, q0, gid)
    plant = PlantState.init(q0)
    roll = jax.jit(
        lambda c, p, g, v, cp, pl: cascade_rollout(
            cc, c, p, g, v, cp, n_periods=4, payload=pl,
            payload_known=False))
    _, plant2, metrics = roll(ctl, plant, gid, jnp.asarray(cfg.v_ref, F32),
                              ContactParams.default(),
                              jnp.asarray(0.3, F32))
    x = np.asarray(metrics["x_srb"])
    assert np.all(x[:, 2] > 0.15), x[:, 2]
