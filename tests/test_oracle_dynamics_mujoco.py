"""Oracle rigid-body dynamics vs MuJoCo (SURVEY.md §4.1: "dynamics vs MuJoCo").

MuJoCo free-joint conventions: qpos quat is wxyz; qvel = [v_world(3), w_local(3),
qdot].  Ours (Pinocchio-style local): q quat xyzw; v = [v_local(3), w_local(3),
qdot].  The map is qvel_mj = T v_ours with T = blockdiag(R_base, I3, I12); then
  M_ours = T' M_mj T
  h_ours = T' h_mj + T' M_mj Tdot v_ours,   Tdot v_ours = [R (w x v_loc); 0; 0]
  J_ours = J_mj T
"""

import mujoco
import numpy as np
import pytest

from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree, to_mjcf
from mpctsid_tpu.oracle import dynamics as dyn

TREE = build_tree(SOLO12)
MODEL = mujoco.MjModel.from_xml_string(to_mjcf(SOLO12))
DATA = mujoco.MjData(MODEL)


def random_state(seed):
    rng = np.random.default_rng(seed)
    q = np.zeros(19)
    q[0:3] = rng.normal(size=3)
    quat = rng.normal(size=4)
    q[3:7] = quat / np.linalg.norm(quat)
    q[7:] = rng.uniform(-1.5, 1.5, size=12)
    v = rng.normal(size=18) * 2.0
    return q, v


def set_mj_state(q, v):
    R0 = dyn.quat_to_rot(q[3:7])
    DATA.qpos[0:3] = q[0:3]
    DATA.qpos[3:7] = [q[6], q[3], q[4], q[5]]  # xyzw -> wxyz
    DATA.qpos[7:] = q[7:]
    DATA.qvel[0:3] = R0 @ v[0:3]
    DATA.qvel[3:6] = v[3:6]
    DATA.qvel[6:] = v[6:]
    mujoco.mj_forward(MODEL, DATA)
    T = np.eye(18)
    T[0:3, 0:3] = R0
    return T


@pytest.mark.parametrize("seed", range(5))
def test_mass_matrix(seed):
    q, v = random_state(seed)
    T = set_mj_state(q, v)
    M_mj = np.zeros((18, 18))
    mujoco.mj_fullM(MODEL, DATA, M_mj)
    M_ours = dyn.crba(TREE, dyn.DynState(TREE, q))
    np.testing.assert_allclose(M_ours, T.T @ M_mj @ T, atol=1e-10)


@pytest.mark.parametrize("seed", range(5))
def test_bias_forces(seed):
    q, v = random_state(seed)
    T = set_mj_state(q, v)
    M_mj = np.zeros((18, 18))
    mujoco.mj_fullM(MODEL, DATA, M_mj)
    h_mj = DATA.qfrc_bias.copy()
    R0 = dyn.quat_to_rot(q[3:7])
    tdot_v = np.zeros(18)
    tdot_v[0:3] = R0 @ np.cross(v[3:6], v[0:3])
    h_expect = T.T @ h_mj + T.T @ M_mj @ tdot_v
    st = dyn.DynState(TREE, q)
    h_ours = dyn.rnea(TREE, st, v, np.zeros(18))
    np.testing.assert_allclose(h_ours, h_expect, atol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_rnea_full(seed):
    """tau = M a + h must hold for random accelerations."""
    q, v = random_state(seed)
    rng = np.random.default_rng(1000 + seed)
    a = rng.normal(size=18)
    st = dyn.DynState(TREE, q)
    tau = dyn.rnea(TREE, st, v, a)
    M = dyn.crba(TREE, st)
    h = dyn.rnea(TREE, st, v, np.zeros(18))
    np.testing.assert_allclose(tau, M @ a + h, atol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_foot_positions_and_jacobians(seed):
    q, v = random_state(seed)
    T = set_mj_state(q, v)
    st = dyn.DynState(TREE, q)
    feet = st.foot_positions()
    for leg in range(4):
        sid = MODEL.site(f"foot_{leg}").id
        np.testing.assert_allclose(feet[leg], DATA.site_xpos[sid], atol=1e-10)
        jacp = np.zeros((3, 18))
        mujoco.mj_jacSite(MODEL, DATA, jacp, None, sid)
        J_ours = dyn.foot_jacobian(TREE, st, leg)
        np.testing.assert_allclose(J_ours, jacp @ T, atol=1e-10)


@pytest.mark.parametrize("seed", range(3))
def test_foot_drift(seed):
    """Jdot v via finite differences of J(q(t)) v."""
    q, v = random_state(seed)
    st = dyn.DynState(TREE, q)
    eps = 1e-6
    for leg in range(4):
        drift = dyn.foot_drift(TREE, st, v, leg)
        qp = dyn.integrate_q(q, v, eps)
        qm = dyn.integrate_q(q, v, -eps)
        vp = dyn.foot_jacobian(TREE, dyn.DynState(TREE, qp), leg) @ v
        vm = dyn.foot_jacobian(TREE, dyn.DynState(TREE, qm), leg) @ v
        np.testing.assert_allclose(drift, (vp - vm) / (2 * eps),
                                   rtol=1e-4, atol=1e-5)


def test_total_mass():
    assert abs(SOLO12.total_mass - MODEL.body_subtreemass[MODEL.body("base").id]) < 1e-9
    assert 2.0 < SOLO12.total_mass < 3.0  # "~2.5 kg class" (SURVEY.md §7.3)
