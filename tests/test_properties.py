"""Randomized property tests (hypothesis) for QP and planner invariants —
SURVEY.md §4.2 breadth, VERDICT.md round-3 missing #5.

Shapes are FIXED across examples (hypothesis draws seeds/knobs, not dims) so
each jitted solver compiles once per test session.
"""

import functools

import numpy as np
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.gaits import GAIT_PERIOD, GAITS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.plan.gait import contacts_horizon, swing_tables
from mpctsid_tpu.plan.swing import swing_foot_ref
from mpctsid_tpu.qp.admm import admm_solve

F32 = jnp.float32
CFG = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))


def feasible_qp(seed, n=24, m=40, eq_rows=4):
    """Random strictly-feasible QP (same generator family as the parity
    suites: SPD P, box around A x_feas, a few equality rows)."""
    r = np.random.default_rng(seed)
    Q = r.normal(size=(n, n))
    P = Q @ Q.T / n + 0.1 * np.eye(n)
    q = r.normal(size=n)
    A = r.normal(size=(m, n))
    x_feas = r.normal(size=n) * 0.1
    margin = np.abs(r.normal(size=m)) + 0.1
    l = A @ x_feas - margin
    u = A @ x_feas + margin
    l[:eq_rows] = u[:eq_rows] = (A @ x_feas)[:eq_rows]
    return [jnp.asarray(a, F32) for a in (P, q, A, l, u)]


_SOLVE = jax.jit(lambda *a: admm_solve(*a, iters=100, adapt_rounds=4,
                                       rho=0.1, polish_kkt=True))
_SOLVE_SHORT = jax.jit(lambda *a: admm_solve(*a, iters=12, adapt_rounds=1,
                                             rho=0.1))


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_device_solve_feasibility_and_kkt(seed):
    """Any feasible random QP: the device solve must return a point whose
    bound violation and stationarity residual are small and whose ok-status
    is True."""
    P, q, A, l, u = feasible_qp(seed)
    s = _SOLVE(P, q, A, l, u)
    Ax = np.asarray(A) @ np.asarray(s.x)
    viol = max(float(np.max(Ax - np.asarray(u), initial=0.0)),
               float(np.max(np.asarray(l) - Ax, initial=0.0)))
    assert viol < 5e-3, viol
    assert float(s.dual_res) < 5e-2, float(s.dual_res)
    assert bool(s.ok)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_admm_residual_decreases_with_iterations(seed):
    """Scaled-residual progress: the 100-iteration adaptive-rho solve must
    beat (or match within noise) a 12-iteration single-rho solve on the
    combined KKT error."""
    P, q, A, l, u = feasible_qp(seed)

    def kkt(s):
        return max(float(s.prim_res), float(s.dual_res))

    long = kkt(jax.jit(lambda *a: admm_solve(*a, iters=100, adapt_rounds=4,
                                             rho=0.1))(P, q, A, l, u))
    short = kkt(_SOLVE_SHORT(P, q, A, l, u))
    assert long <= short * 1.05 + 1e-6, (long, short)


_MPC_CACHE = {}


def _mpc_solve(gait, phase, vx, wz):
    """Build + solve one MPC QP from the standing state at a given gait
    phase/command; jitted once (phase/command are traced data)."""
    from mpctsid_tpu import dyn
    from mpctsid_tpu.cascade import CascadeConfigured
    from mpctsid_tpu.cascade.engine import srb_state
    from mpctsid_tpu.model.gaits import GAIT_IDS
    from mpctsid_tpu.mpc.srb import build_mpc_qp, reference_rollout
    from mpctsid_tpu.plan.footsteps import plan_footsteps_horizon
    from mpctsid_tpu.plan.gait import contacts_at

    if "fn" not in _MPC_CACHE:
        cc = CascadeConfigured(SOLO12, CFG)
        q0 = np.zeros(19, np.float32)
        q0[2] = SOLO12.h_ref
        q0[6] = 1.0
        q0[7:] = SOLO12.q_stand
        q0 = jnp.asarray(q0)

        @jax.jit
        def fn(gid, phase, v_cmd):
            x_srb = srb_state(q0, jnp.zeros(18, F32))
            feet = dyn.foot_positions(cc.tree, q0)
            fsteps, _ = plan_footsteps_horizon(
                SOLO12, CFG.mpc, CFG.cascade, gid, phase, x_srb, v_cmd, feet)
            x_ref = reference_rollout(SOLO12, CFG.mpc, x_srb, v_cmd)
            cont = jnp.stack(
                [contacts_at(gid, phase + k).astype(F32)
                 for k in range(CFG.mpc.horizon)])
            P, q, A, l, u = build_mpc_qp(SOLO12, CFG.mpc, x_srb, x_ref,
                                         fsteps, cont)
            sol = admm_solve(P, q, A, l, u, iters=100, adapt_rounds=4,
                             rho=0.1, polish_kkt=True)
            return sol.x.reshape(CFG.mpc.horizon, 4, 3), cont, sol.ok
        _MPC_CACHE["fn"] = fn

    from mpctsid_tpu.model.gaits import GAIT_IDS as _IDS
    return _MPC_CACHE["fn"](
        jnp.int32(_IDS[gait]), jnp.int32(phase),
        jnp.asarray([vx, 0.0, wz], F32))


@settings(max_examples=12, deadline=None)
@given(gait=st.sampled_from(["trot", "walk", "bound"]),
       phase=st.integers(0, GAIT_PERIOD - 1),
       vx=st.floats(0.0, 0.35), wz=st.floats(-0.3, 0.3))
def test_mpc_forces_cone_feasible_and_swing_pinned(gait, phase, vx, wz):
    """Returned MPC forces: swing-foot forces ~0 (ridge pinning), stance
    forces inside the friction pyramid and the fz box (BASELINE.json:5
    constraint set), across random gait/phase/command draws."""
    f, cont, ok = _mpc_solve(gait, phase, vx, wz)
    f = np.asarray(f)            # (N, 4, 3)
    cont = np.asarray(cont)      # (N, 4)
    assert bool(ok)
    swing = cont < 0.5
    if swing.any():
        assert np.abs(f[swing]).max() < 1e-2
    stance = ~swing
    fz = f[stance][:, 2]
    tol = 1e-3
    assert np.all(fz >= CFG.mpc.fz_min - tol)
    assert np.all(fz <= CFG.mpc.fz_max + tol)
    assert np.all(np.abs(f[stance][:, 0]) <= CFG.mpc.mu * fz + tol)
    assert np.all(np.abs(f[stance][:, 1]) <= CFG.mpc.mu * fz + tol)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000),
       h=st.floats(0.02, 0.10), T=st.floats(0.1, 0.5))
def test_swing_trajectory_endpoint_invariants(seed, h, T):
    """Swing polynomials: start at lift-off, end at touchdown with ZERO
    velocity and acceleration at both ends (SURVEY.md §4.2 planner
    invariants), any random geometry."""
    r = np.random.default_rng(seed)
    lo = jnp.asarray(r.uniform(-0.3, 0.3, (4, 3)).astype(np.float32)
                     * np.array([1, 1, 0], np.float32))
    td = jnp.asarray(r.uniform(-0.3, 0.3, (4, 3)).astype(np.float32)
                     * np.array([1, 1, 0], np.float32))
    Tv = jnp.full(4, T, F32)
    for s, target in [(0.0, lo), (1.0, td)]:
        pos, vel, acc = swing_foot_ref(lo, td, jnp.full(4, s, F32), Tv, h)
        np.testing.assert_allclose(np.asarray(pos[:, 0:2]),
                                   np.asarray(target[:, 0:2]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pos[:, 2]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(vel), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-3)
    # apex: z reaches h at s = 1/2
    pos_mid, _, _ = swing_foot_ref(lo, td, jnp.full(4, 0.5, F32), Tv, h)
    np.testing.assert_allclose(np.asarray(pos_mid[:, 2]), h, rtol=1e-5)


@settings(max_examples=25, deadline=None)
@given(gait=st.sampled_from(list(GAITS)),
       phase=st.integers(0, 3 * GAIT_PERIOD))
def test_gait_schedule_invariants(gait, phase):
    """Rolling conserves per-leg stance durations over any full period
    window, the schedule is periodic, and the JAX lookup matches the numpy
    GaitDef at every phase."""
    from mpctsid_tpu.model.gaits import GAIT_IDS
    gid = jnp.int32(GAIT_IDS[gait])
    hor = np.asarray(contacts_horizon(gid, jnp.int32(phase), GAIT_PERIOD))
    # duration conservation under roll
    np.testing.assert_array_equal(
        hor.sum(0), [GAITS[gait].stance_duration(i) for i in range(4)])
    # periodicity
    hor2 = np.asarray(contacts_horizon(
        gid, jnp.int32(phase + GAIT_PERIOD), GAIT_PERIOD))
    np.testing.assert_array_equal(hor, hor2)
    # parity with the numpy GaitDef
    np.testing.assert_array_equal(
        hor, GAITS[gait].horizon(phase, GAIT_PERIOD))
    # swing_tables consistency: dur > 0 exactly for swing feet
    back, fwd, dur, stance_steps = [
        np.asarray(a) for a in swing_tables(gid, jnp.int32(phase))]
    swing_now = hor[0] < 0.5
    np.testing.assert_array_equal(dur > 0, swing_now)
