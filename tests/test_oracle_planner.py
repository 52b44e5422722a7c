"""Oracle planners: gait/footstep/swing invariants (SURVEY.md §4.2-4.3)."""

import numpy as np
import pytest

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.gaits import GAIT_PERIOD, GAITS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.oracle.planner import (GaitScheduler, plan_footsteps_horizon,
                                        swing_foot_ref, swing_xy_coeffs,
                                        swing_z_coeffs, eval_poly)

M = SOLO12
CFG = EngineConfig()


@pytest.mark.parametrize("name", list(GAITS))
def test_gait_roll_conserves_duty(name):
    """Rolling preserves per-leg stance counts (SURVEY.md §4.2 planner invariants)."""
    g = GaitScheduler(GAITS[name])
    counts0 = GAITS[name].table.sum(axis=0)
    for _ in range(GAIT_PERIOD + 3):
        g.roll()
        h = g.horizon(GAIT_PERIOD)
        np.testing.assert_allclose(h.sum(axis=0), counts0)


@pytest.mark.parametrize("name", ["trot", "walk", "bound"])
def test_swing_progress_monotone(name):
    g = GaitScheduler(GAITS[name])
    for leg in range(4):
        s_prev = -1.0
        for ph in range(GAIT_PERIOD):
            g.phase = ph
            s, dur = g.swing_progress(leg, 0.5)
            if dur > 0:
                if s_prev >= 0 and s > 0.5 / dur:
                    assert s > s_prev
                s_prev = s
            else:
                s_prev = -1.0


def test_swing_polynomial_endpoint_conditions():
    p0 = np.array([0.1, 0.2, 0.0])
    p1 = np.array([0.25, 0.15, 0.0])
    T, h = 0.16, 0.05
    for s, target in ((0.0, p0), (1.0, p1)):
        pos, vel, acc = swing_foot_ref(p0, p1, s, T, h)
        np.testing.assert_allclose(pos, target, atol=1e-12)
        np.testing.assert_allclose(vel, 0.0, atol=1e-9)
        np.testing.assert_allclose(acc, 0.0, atol=1e-7)
    pos, _, _ = swing_foot_ref(p0, p1, 0.5, T, h)
    np.testing.assert_allclose(pos[2], h, atol=1e-12)
    # apex is the max
    zs = [swing_foot_ref(p0, p1, s, T, h)[0][2] for s in np.linspace(0, 1, 33)]
    assert max(zs) <= h + 1e-12


def test_footstep_plan_tracks_velocity_direction():
    """Touchdowns shift forward of the shoulders when moving forward."""
    g = GaitScheduler(GAITS["trot"])
    x = np.zeros(12)
    x[2] = M.h_ref
    x[6] = 0.5  # moving forward fast
    feet_now = M.shoulder_offsets.copy()
    feet_now[:, 2] = 0.0
    v_cmd = np.array([0.5, 0.0, 0.0])
    fsteps, next_td = plan_footsteps_horizon(M, CFG.mpc, CFG.cascade, g, x,
                                             v_cmd, feet_now)
    assert fsteps.shape == (16, 4, 3)
    # every foot's planned touchdown is ahead of its current position
    cont = g.horizon(17)
    for i in range(4):
        # find first touchdown inside horizon
        for k in range(1, 16):
            if cont[k, i] > 0.5 and cont[k - 1, i] < 0.5:
                assert fsteps[k, i, 0] > feet_now[i, 0]
                break


def test_footsteps_stance_feet_pinned():
    """While a foot stays in stance, its planned position must not move."""
    g = GaitScheduler(GAITS["trot"], phase=2)
    x = np.zeros(12)
    x[2] = M.h_ref
    feet_now = M.shoulder_offsets + np.array([0.01, -0.02, 0.0])
    feet_now[:, 2] = 0.0
    fsteps, _ = plan_footsteps_horizon(M, CFG.mpc, CFG.cascade, g, x,
                                       np.array([0.3, 0, 0]), feet_now)
    cont = g.horizon(16)
    for i in range(4):
        for k in range(1, 16):
            if cont[k, i] > 0.5 and cont[k - 1, i] > 0.5:
                np.testing.assert_allclose(fsteps[k, i], fsteps[k - 1, i])
