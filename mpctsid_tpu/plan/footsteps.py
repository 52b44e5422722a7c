"""JAX Raibert footstep planner (functional twin of oracle/planner.py).

Touchdown target = yaw-rotated shoulder position at projected touchdown time
+ (T_stance/2) v + k (v - v_ref) + centrifugal 0.5 sqrt(h/g) (v x w)
(SURVEY.md §2.1 "Footstep planner").  The per-horizon-step working-position
update is a trace-time-unrolled loop of masked batched ops: a foot's position
is replaced by a fresh Raibert target exactly at swing->stance transitions
inside the horizon.  Single-sample layout; vmap over scenarios.
"""

from __future__ import annotations

import jax.numpy as jnp

from mpctsid_tpu.config import CascadeConfig, MpcConfig
from mpctsid_tpu.model.solo12 import Solo12Model
from mpctsid_tpu.mpc.srb import rot_z
from mpctsid_tpu.plan.gait import contacts_horizon, swing_tables


def raibert_touchdown(model: Solo12Model, cascade: CascadeConfig,
                      p_com, yaw, v, v_ref_world, wz_ref, t_stance):
    """(4,3) world touchdown targets for all four legs at once.

    p_com (3,), yaw scalar, v (3,) measured world velocity, t_stance (4,)."""
    sh = jnp.asarray(model.shoulder_offsets, p_com.dtype)  # (4,3)
    shoulder = p_com[None] + jnp.einsum("ij,fj->fi", rot_z(yaw), sh)
    p = shoulder[:, 0:2]
    p = p + cascade.t_stance_factor * t_stance[:, None] * v[None, 0:2]
    p = p + cascade.k_raibert * (v[0:2] - v_ref_world[0:2])[None]
    h = jnp.maximum(p_com[2], 1e-3)
    cf = 0.5 * jnp.sqrt(h / model.g)
    p = p + cf * jnp.stack([v[1] * wz_ref, -v[0] * wz_ref])[None]
    return jnp.concatenate([p, jnp.zeros_like(p[:, :1])], axis=-1)


def plan_footsteps_horizon(model: Solo12Model, mpc: MpcConfig,
                           cascade: CascadeConfig,
                           gait_id, phase, x, v_cmd, current_feet):
    """(feet (N,4,3), next_touchdown (4,3)) — twin of the oracle planner.

    x (12,) SRB state; current_feet (4,3) world foot positions."""
    N = mpc.horizon
    dtype = x.dtype
    cont = contacts_horizon(gait_id, phase, N + 1).astype(dtype)
    _, _, _, stance_steps = swing_tables(gait_id, phase)
    t_stance = stance_steps.astype(dtype) * mpc.dt

    p0, yaw0, v = x[0:3], x[5], x[6:9]
    work = current_feet * jnp.asarray([1.0, 1.0, 0.0], dtype)
    next_td = work
    found = jnp.zeros(4, bool)
    feet = []
    prev = cont[0]
    for k in range(N):
        yaw_k = yaw0 + v_cmd[2] * mpc.dt * k
        v_ref_world = rot_z(yaw_k) @ jnp.stack(
            [v_cmd[0], v_cmd[1], jnp.zeros_like(v_cmd[2])])
        p_k = jnp.stack([p0[0] + v[0] * mpc.dt * k,
                         p0[1] + v[1] * mpc.dt * k,
                         jnp.asarray(model.h_ref, dtype)])
        td = raibert_touchdown(model, cascade, p_k, yaw_k, v,
                               v_ref_world, v_cmd[2], t_stance)
        trans = (cont[k] > 0.5) & (prev < 0.5)  # swing -> stance at step k
        work = jnp.where(trans[:, None], td, work)
        next_td = jnp.where((trans & ~found)[:, None], td, next_td)
        found = found | trans
        feet.append(work)
        prev = cont[k]
    return jnp.stack(feet), next_td
