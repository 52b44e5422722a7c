"""Host-side deployment controller (mpctsid_tpu/host.py): the reference's
Controller.compute() surface, sync and async (native PlanBuffer) MPC modes.
SURVEY.md §2.1 "MPC async wrapper" / §3.2 — this is the wiring of the native
RT runtime to real device solves that round 1 left missing."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env import SimPlant
from mpctsid_tpu.host import HostController
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree

M = SOLO12


def standing_q0():
    q0 = np.zeros(19, np.float32)
    q0[2] = M.h_ref
    q0[6] = 1.0
    q0[7:] = M.q_stand
    return q0


def run_host(async_mpc, seconds=1.2, settle=None):
    cfg = EngineConfig(gait="trot", v_ref=(0.25, 0.0, 0.0))
    q0 = standing_q0()
    plant = SimPlant(build_tree(M), jnp.asarray(q0))
    ctl = HostController(M, cfg, q0, async_mpc=async_mpc)
    n = int(seconds / cfg.cascade.wbc_dt)
    zs, xs = [], []
    try:
        for k in range(n):
            s = plant.read()
            tau = ctl.compute(np.asarray(s.q), np.asarray(s.v))
            plant.apply(jnp.asarray(tau, jnp.float32))
            if async_mpc and settle:
                time.sleep(settle)   # give the planner thread real time
            zs.append(float(s.q[2]))
            xs.append(float(s.q[0]))
    finally:
        ctl.close()
    return np.array(zs), np.array(xs), ctl


def test_sync_host_controller_trot_stays_upright():
    zs, xs, ctl = run_host(async_mpc=False)
    assert zs.min() > 0.15, f"fell (min z {zs.min():.3f})"
    assert xs[-1] > 0.05, "no forward progress"
    assert ctl.plan_period > 0, "plans never consumed"


def test_async_host_controller_uses_native_buffer():
    """Async mode: MPC runs on the planner thread through the native seqlock
    PlanBuffer; the tick loop never blocks on a solve and the robot walks."""
    zs, xs, ctl = run_host(async_mpc=True, seconds=1.2, settle=0.0005)
    assert zs.min() > 0.15, f"fell (min z {zs.min():.3f})"
    assert ctl.plan_period > 0, "no plan ever published/consumed"


def test_sync_matches_cascade_engine_first_period():
    """The host controller's first-period torques must match the fused
    device cascade from the same state (same formulation, same staleness)."""
    import functools
    import jax
    from mpctsid_tpu.cascade import CascadeConfigured, init_controller
    from mpctsid_tpu.cascade.engine import cascade_period
    from mpctsid_tpu.env.plant import ContactParams, PlantState

    cfg = EngineConfig(gait="trot", v_ref=(0.25, 0.0, 0.0))
    q0 = standing_q0()
    cc = CascadeConfigured(M, cfg)
    gid = jnp.int32(0)
    ctl_e = init_controller(M, cfg, cc.tree, jnp.asarray(q0), gid)
    plant_e = PlantState.init(jnp.asarray(q0))
    f = jax.jit(functools.partial(cascade_period, cc))
    _, plant_e2, _, _ = f(ctl_e, plant_e, gid,
                          jnp.asarray(cfg.v_ref, jnp.float32),
                          ContactParams.default())

    plant = SimPlant(cc.tree, jnp.asarray(q0))
    host = HostController(M, cfg, q0, async_mpc=False)
    for _ in range(cfg.cascade.mpc_every):
        s = plant.read()
        tau = host.compute(np.asarray(s.q), np.asarray(s.v))
        plant.apply(jnp.asarray(tau, jnp.float32))

    np.testing.assert_allclose(np.asarray(plant.state.q),
                               np.asarray(plant_e2.q), atol=5e-3)


def test_host_telemetry_ring_records_every_tick():
    """telemetry=True: one native-ring record per compute() with the tick
    index, phase, WBC status and the commanded torques — drained off-thread
    without ever blocking the loop (SURVEY.md §5.5 host path)."""
    cfg = EngineConfig(gait="trot", v_ref=(0.25, 0.0, 0.0))
    q0 = standing_q0()
    plant = SimPlant(build_tree(M), jnp.asarray(q0))
    ctl = HostController(M, cfg, q0, async_mpc=False, telemetry=True)
    n = 40
    taus = []
    try:
        for k in range(n):
            s = plant.read()
            tau = ctl.compute(np.asarray(s.q), np.asarray(s.v))
            plant.apply(jnp.asarray(tau, jnp.float32))
            taus.append(tau)
    finally:
        ctl.close()
    rec = ctl.drain_telemetry()
    assert rec.shape == (n, HostController.TELEM_LEN)
    np.testing.assert_array_equal(rec[:, 0], np.arange(n, dtype=np.float32))
    assert set(np.unique(rec[:, 1])) <= {0.0, 1.0}   # phases 0..1 in 2 periods
    np.testing.assert_allclose(rec[:, 3:], np.stack(taus), atol=1e-6)
    assert ctl._telem.dropped == 0
    # drained: second drain is empty
    assert ctl.drain_telemetry().shape[0] == 0
