"""Estimator: JAX vs oracle parity + estimator-in-the-loop cascade
(SURVEY.md §2.1 "State estimator", §3.5)."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from mpctsid_tpu.cascade import (CascadeConfigured, cascade_rollout,
                                 init_controller)
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.est.filter import (EstimatorState, estimator_init,
                                    estimator_update)
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree
from mpctsid_tpu.oracle.estimator import ComplementaryEstimator

M = SOLO12
TREE = build_tree(M)
F32 = jnp.float32


def test_parity_with_oracle_filter():
    rng = np.random.default_rng(0)
    q0 = np.zeros(19)
    q0[2] = M.h_ref
    q0[6] = 1.0
    q0[7:] = M.q_stand
    o_est = ComplementaryEstimator(TREE, q0.copy())
    j_est = estimator_init(jnp.asarray(q0, F32))
    upd = jax.jit(functools.partial(estimator_update, TREE))
    contacts = np.array([1.0, 0.0, 0.0, 1.0])
    for k in range(50):
        gyro = rng.normal(size=3) * 0.1
        accel = np.array([0.0, 0.0, 9.81]) + rng.normal(size=3) * 0.05
        qj = q0[7:] + rng.normal(size=12) * 0.01
        qdj = rng.normal(size=12) * 0.1
        oq, ov = o_est.update(gyro, accel, qj, qdj, contacts)
        j_est = upd(j_est, jnp.asarray(gyro, F32), jnp.asarray(accel, F32),
                    jnp.asarray(qj, F32), jnp.asarray(qdj, F32),
                    jnp.asarray(contacts, F32))
    np.testing.assert_allclose(np.asarray(j_est.q), oq, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_est.v), ov, atol=2e-3)


def _est_rollout(n_periods, est_mocap):
    cfg = EngineConfig(gait="trot", v_ref=(0.25, 0.0, 0.0))
    cc = CascadeConfigured(M, cfg)
    q0 = np.zeros(19, np.float32)
    q0[2] = M.h_ref
    q0[6] = 1.0
    q0[7:] = M.q_stand
    q0 = jnp.asarray(q0)
    gid = jnp.int32(GAIT_IDS["trot"])
    ctl = init_controller(M, cfg, cc.tree, q0, gid)
    plant = PlantState.init(q0)
    est = estimator_init(q0)
    roll = jax.jit(functools.partial(cascade_rollout, cc,
                                     n_periods=n_periods,
                                     use_estimator=True,
                                     est_mocap=est_mocap))
    return roll(ctl, plant, gid, jnp.asarray(cfg.v_ref, F32),
                ContactParams.default(), est=est)


def test_estimator_in_the_loop_trot_hint_free():
    """The cascade stays upright running on the ESTIMATED state with NO
    external position hint — base x-y comes purely from integrating the
    fused IMU + leg-odometry velocity, like the reference's estimator
    (SURVEY.md §3.2/§3.5; VERDICT.md round-4 missing #4).  The odometry
    frame drifts; the drift must stay bounded and must not destabilize the
    gait."""
    _, _, metrics = _est_rollout(30, est_mocap=False)
    x = np.asarray(metrics["x_srb"])
    assert np.all(x[:, 2] > 0.15), "fell with hint-free estimator"
    assert x[-1, 0] > 0.02, "no forward progress"
    drift = np.asarray(metrics["est_xy_err"])
    # measured: 2.1 cm after 30 periods (0.6 s) = ~3.5 cm/s odometry drift;
    # budget 3x measured so a regression to hint-copying-scale errors or an
    # unstable integrator cannot hide
    assert drift[-1] < 0.065, drift[-1]
    assert drift.max() < 0.065, drift.max()


def test_estimator_in_the_loop_trot_mocap():
    """est_mocap=True (the sim-truth/mocap analog) pins the x-y frame: same
    closed-loop stability, drift ~0."""
    _, _, metrics = _est_rollout(30, est_mocap=True)
    x = np.asarray(metrics["x_srb"])
    assert np.all(x[:, 2] > 0.15), "fell with estimator in the loop"
    assert x[-1, 0] > 0.02, "no forward progress"
    assert np.asarray(metrics["est_xy_err"]).max() < 0.005


def test_height_estimated_from_stance_kinematics():
    """VERDICT.md round-3 weak #5 / item 8: base z must be ESTIMATED, not
    adopted from the hint.  Start the estimator 3 cm high; with all feet in
    stance the kinematic-height blend must pull z back to the true standing
    height, even while an (x, y)-only hint is supplied."""
    q_true = np.zeros(19, np.float32)
    q_true[2] = M.h_ref
    q_true[6] = 1.0
    q_true[7:] = M.q_stand

    q_bad = q_true.copy()
    q_bad[2] += 0.03
    est = estimator_init(jnp.asarray(q_bad))
    upd = jax.jit(functools.partial(estimator_update, TREE))
    contacts = jnp.ones(4, F32)
    gyro = jnp.zeros(3, F32)
    accel = jnp.asarray([0.0, 0.0, 9.81], F32)
    qj = jnp.asarray(q_true[7:])
    qdj = jnp.zeros(12, F32)
    hint = jnp.asarray(q_true[0:3])
    for _ in range(150):
        est = upd(est, gyro, accel, qj, qdj, contacts, base_pos_hint=hint)
    z = float(est.q[2])
    assert abs(z - M.h_ref) < 0.003, z     # converged to the true height
    # and it must NOT be the hint's z verbatim copied in one step
    est1 = upd(estimator_init(jnp.asarray(q_bad)), gyro, accel, qj, qdj,
               contacts, base_pos_hint=jnp.asarray(q_true[0:3]))
    assert abs(float(est1.q[2]) - (M.h_ref + 0.03)) < 0.005
