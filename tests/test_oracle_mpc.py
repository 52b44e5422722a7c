"""Oracle centroidal MPC: physics + invariant tests (SURVEY.md §4.2-4.3)."""

import numpy as np
import pytest

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.gaits import GAITS, TROT
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.oracle.mpc import (build_mpc_qp, reference_rollout, solve_mpc,
                                    srb_discrete)
from mpctsid_tpu.oracle.planner import GaitScheduler, plan_footsteps_horizon

M = SOLO12
CFG = EngineConfig()


def standing_x0():
    x = np.zeros(12)
    x[2] = M.h_ref
    return x


def feet0():
    f = M.shoulder_offsets.copy()
    f[:, 2] = 0.0
    return f


def test_static_stand_forces_equal_weight():
    g = GaitScheduler(GAITS["static"])
    x0 = standing_x0()
    xref = reference_rollout(M, CFG.mpc, x0, np.zeros(3))
    feet, _ = plan_footsteps_horizon(M, CFG.mpc, CFG.cascade, g, x0,
                                     np.zeros(3), feet0())
    F, res = solve_mpc(M, CFG.mpc, CFG.solver, x0, xref, feet, g.horizon(16))
    assert res.converged
    np.testing.assert_allclose(F[0, :, 2].sum(), M.total_mass * M.g, rtol=1e-2)
    np.testing.assert_allclose(F[0, :, 2], F[0, 0, 2], rtol=1e-6)  # symmetric
    assert np.abs(F[0, :, 0:2]).max() < 1e-6


@pytest.mark.parametrize("gait", ["trot", "walk", "bound"])
def test_swing_forces_zero_and_cone_respected(gait):
    g = GaitScheduler(GAITS[gait], phase=3)
    x0 = standing_x0()
    x0[6] = 0.2
    v_cmd = np.array([0.2, 0.0, 0.0])
    xref = reference_rollout(M, CFG.mpc, x0, v_cmd)
    feet, _ = plan_footsteps_horizon(M, CFG.mpc, CFG.cascade, g, x0, v_cmd, feet0())
    F, res = solve_mpc(M, CFG.mpc, CFG.solver, x0, xref, feet, g.horizon(16))
    assert res.converged
    cont = g.horizon(16)
    assert np.abs(F[cont < 0.5]).max() < 1e-8
    stance = F[cont > 0.5]
    mu = CFG.mpc.mu
    assert np.all(stance[:, 2] >= CFG.mpc.fz_min - 1e-7)
    assert np.all(stance[:, 2] <= CFG.mpc.fz_max + 1e-7)
    assert np.all(np.abs(stance[:, 0]) <= mu * stance[:, 2] + 1e-6)
    assert np.all(np.abs(stance[:, 1]) <= mu * stance[:, 2] + 1e-6)


def test_prediction_consistency():
    """QP internal prediction X = Sx x0 + Su U + Sc matches step-by-step sim."""
    g = GaitScheduler(TROT)
    x0 = standing_x0()
    x0[6] = 0.3
    v_cmd = np.array([0.3, 0.0, 0.0])
    xref = reference_rollout(M, CFG.mpc, x0, v_cmd)
    feet, _ = plan_footsteps_horizon(M, CFG.mpc, CFG.cascade, g, x0, v_cmd, feet0())
    cont = g.horizon(16)
    F, res = solve_mpc(M, CFG.mpc, CFG.solver, x0, xref, feet, cont)
    x = x0.copy()
    for k in range(CFG.mpc.horizon):
        A, B, c = srb_discrete(M, CFG.mpc, xref[k, 5], feet[k], xref[k, 0:3])
        x = A @ x + B @ F[k].reshape(-1) + c
    # rebuild the condensed prediction
    from mpctsid_tpu.oracle.mpc import condense
    A_l, B_l, c_l = [], [], []
    for k in range(CFG.mpc.horizon):
        A_, B_, c_ = srb_discrete(M, CFG.mpc, xref[k, 5], feet[k], xref[k, 0:3])
        A_l.append(A_)
        B_l.append(B_)
        c_l.append(c_)
    Sx, Su, Sc = condense(A_l, B_l, c_l)
    X = Sx @ x0 + Su @ res.x + Sc
    np.testing.assert_allclose(X[-12:], x, atol=1e-10)


def test_srb_closed_loop_trot_tracks_velocity():
    """Receding-horizon MPC on its own model tracks the commanded velocity
    (the §3 call-stack minimum slice, SRB level)."""
    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    x = standing_x0()
    g = GaitScheduler(TROT)
    feet_now = feet0()
    warm = (None, None)
    vc = np.array([0.3, 0.0, 0.0])
    vxs = []
    for period in range(60):
        xref = reference_rollout(M, cfg.mpc, x, vc)
        fsteps, _ = plan_footsteps_horizon(M, cfg.mpc, cfg.cascade, g, x, vc,
                                           feet_now)
        F, res = solve_mpc(M, cfg.mpc, cfg.solver, x, xref, fsteps,
                           g.horizon(16), warm_x=warm[0], warm_y=warm[1])
        warm = (res.x, res.y)
        A, B, c = srb_discrete(M, cfg.mpc, xref[0, 5], fsteps[0], xref[0, 0:3])
        x = A @ x + B @ F[0].reshape(-1) + c
        feet_now = fsteps[1]
        g.roll()
        vxs.append(x[6])
    assert abs(np.mean(vxs[20:]) - 0.3) < 0.05
    assert abs(x[2] - M.h_ref) < 0.01
    assert np.abs(x[3:5]).max() < 0.02
