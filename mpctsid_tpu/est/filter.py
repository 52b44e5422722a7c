"""JAX complementary-filter state estimator (functional twin of
oracle/estimator.py; reference mechanism per SURVEY.md §2.1 "State estimator"
and §3.5: IMU attitude complementary filter + stance-leg-odometry base velocity,
low-pass fused).

Pure function over an explicit EstimatorState so it drops into the cascade scan
and vmaps across scenarios.  Inputs are the plant's sensor model: gyro/accel
(env/plant.py imu conventions), joint encoders, and the gait's contact flags.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from mpctsid_tpu import dyn
from mpctsid_tpu.model.tree import KinematicTree

GRAV = 9.81


@dataclasses.dataclass
class EstimatorState:
    q: jnp.ndarray   # (19,) current estimate
    v: jnp.ndarray   # (18,)


jax.tree_util.register_dataclass(
    EstimatorState, data_fields=["q", "v"], meta_fields=[])


def estimator_init(q0) -> EstimatorState:
    return EstimatorState(q=q0, v=jnp.zeros(18, q0.dtype))


def estimator_update(tree: KinematicTree, st: EstimatorState,
                     gyro, accel, q_joints, qd_joints, contacts,
                     dt: float = 0.001,
                     alpha_tilt: float = 0.02,
                     alpha_vel: float = 0.97,
                     alpha_z: float = 0.05,
                     base_pos_hint=None) -> EstimatorState:
    """One 1 kHz update.

    Base HEIGHT is always estimated from stance-leg kinematics (feet on the
    ground => base z = -mean stance-foot z relative to the base), blended at
    alpha_z per tick with the velocity integral — the reference derives
    height the same way (SURVEY.md §3.5); VERDICT.md round-3 weak #5 flagged
    the old behavior of adopting the hint's z verbatim.  base_pos_hint, when
    given (sim ground truth / mocap analog), overrides only the drifting
    integrated x-y."""
    dtype = st.q.dtype
    q = st.q.at[7:].set(q_joints)
    # attitude: integrate gyro
    q = dyn.integrate_q(
        q, jnp.concatenate([jnp.zeros(3, dtype), gyro,
                            jnp.zeros(12, dtype)]), dt)
    R0 = dyn.quat_to_rot(q[3:7])
    # tilt correction toward the accelerometer's gravity direction
    a_norm = jnp.linalg.norm(accel)
    g_meas = R0 @ (accel / jnp.maximum(a_norm, 1e-6))
    tilt_err = jnp.cross(g_meas, jnp.asarray([0.0, 0.0, 1.0], dtype))
    corr = jnp.where(a_norm > 1e-6, alpha_tilt, 0.0) * (R0.T @ tilt_err)
    q = dyn.integrate_q(
        q, jnp.concatenate([jnp.zeros(3, dtype), corr,
                            jnp.zeros(12, dtype)]), 1.0)
    R0 = dyn.quat_to_rot(q[3:7])

    # leg odometry: stance feet imply base linear velocity
    J = dyn.foot_jacobians(tree, q)            # (4,3,18)
    v_rest = jnp.concatenate([gyro, qd_joints])
    resid = jnp.einsum("fij,j->fi", J[:, :, 3:], v_rest)   # (4,3)
    v_odo_each = -jnp.einsum("ji,fj->fi", R0, resid)       # local frame
    n_st = jnp.maximum(contacts.sum(), 1e-6)
    v_odo = (v_odo_each * contacts[:, None]).sum(0) / n_st

    a_local = accel - R0.T @ jnp.asarray([0.0, 0.0, GRAV], dtype)
    v_lin_prev = st.v[0:3]
    v_pred = v_lin_prev + dt * (a_local - jnp.cross(gyro, v_lin_prev))
    has_stance = contacts.sum() > 0.5
    v_lin = jnp.where(has_stance,
                      alpha_vel * v_pred + (1.0 - alpha_vel) * v_odo,
                      v_pred)

    v = jnp.concatenate([v_lin, gyro, qd_joints])
    p = (base_pos_hint if base_pos_hint is not None
         else q[0:3] + dt * (R0 @ v_lin))
    # kinematic height: feet_w uses the current estimate's base position, but
    # (foot_z - base_z) is independent of it, so no circularity
    feet_w = dyn.foot_positions(tree, q)
    z_kin = q[2] - (feet_w[:, 2] * contacts).sum() / n_st
    z_int = q[2] + dt * (R0 @ v_lin)[2]
    z = jnp.where(has_stance,
                  (1.0 - alpha_z) * z_int + alpha_z * z_kin, z_int)
    q = q.at[0:3].set(p).at[2].set(z)
    return EstimatorState(q=q, v=v)


def imu_from_plant(tree: KinematicTree, q, v, qdd=None):
    """Sensor model: (gyro(3,), accel(3,)) local, mirroring oracle/sim.py."""
    R0 = dyn.quat_to_rot(q[3:7])
    gyro = v[3:6]
    a_world = (jnp.zeros(3, q.dtype) if qdd is None
               else R0 @ qdd[0:3])
    accel = R0.T @ (a_world + jnp.asarray([0.0, 0.0, GRAV], q.dtype))
    return gyro, accel
