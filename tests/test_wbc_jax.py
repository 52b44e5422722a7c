"""WBC-stage parity suite, mirroring test_mpc_jax.py (VERDICT.md round-1 weak
#5: a module-boundary WBC test would have localized the 154cf90 regression).

Scenarios are REAL trot WBC ticks captured from the oracle cascade (2 MPC
periods = 40 ticks), so the QPs cover stance/swing transitions and mid-swing
references — the regime where the round-1 fz in [0,0] pinning regression
showed up (torque error ~3 Nm; the budgets below would catch it at 10x
margin).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import NV, build_tree
from mpctsid_tpu.oracle.qp import solve_qp
from mpctsid_tpu.qp.admm import admm_solve
from mpctsid_tpu.wbc.tsid import NXW, WbcRefs, build_wbc_qp, solve_wbc

M = SOLO12
F32 = jnp.float32
CFG = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
TREE = build_tree(M)

REF_FIELDS = ["contacts", "f_mpc", "foot_pos_ref", "foot_vel_ref",
              "foot_acc_ref", "q_posture", "base_rpy_ref", "h_ref"]


@pytest.fixture(scope="module")
def ticks():
    """(q, v, refs, oracle_tau) for 40 trot ticks from the oracle cascade."""
    import mpctsid_tpu.oracle.cascade as ocas
    from mpctsid_tpu.oracle.cascade import OracleController
    from mpctsid_tpu.oracle.sim import SimState, step as o_step

    captured = []
    orig = ocas.solve_wbc

    def hook(tree, cfgw, q, v, refs, **kw):
        out = orig(tree, cfgw, q, v, refs, **kw)
        captured.append((q.copy(), v.copy(), refs, out[0].copy()))
        return out

    ocas.solve_wbc = hook
    try:
        q0 = np.zeros(19)
        q0[2] = M.h_ref
        q0[6] = 1.0
        q0[7:] = M.q_stand
        ctl = OracleController(M, CFG, q0)
        sim = SimState.init(q0)
        for _ in range(2 * CFG.cascade.mpc_every):
            cmd, _ = ctl.compute(sim.q, sim.v)
            sim, _ = o_step(TREE, sim, cmd.torque(sim.q[7:], sim.v[6:]))
    finally:
        ocas.solve_wbc = orig
    return captured


def jax_refs(refs, dtype=F32):
    return WbcRefs(*[jnp.asarray(np.asarray(getattr(refs, f)), dtype)
                     for f in REF_FIELDS])


def build64(q, v, refs):
    """Really-f64 JAX-built QP.  VERDICT.md round-3 weak #3: without enabling
    x64 JAX silently truncated the requested float64 to f32, so the 'f64
    builder' parity test was testing an f32 build.  The enable_x64 context
    makes the build genuinely double-precision."""
    jax.config.update("jax_enable_x64", True)
    try:
        out = build_wbc_qp(TREE, CFG.wbc,
                           jnp.asarray(np.asarray(q), jnp.float64),
                           jnp.asarray(np.asarray(v), jnp.float64),
                           jax_refs(refs, jnp.float64))
        out = [np.asarray(a, np.float64) for a in out]
        assert out[0].dtype == np.float64
    finally:
        jax.config.update("jax_enable_x64", False)
    return out


def tau_of(x, Mm, h, JcT):
    return Mm[6:] @ x[:NV] + h[6:] - JcT[6:] @ x[NV:]


def test_builder_solution_parity_under_1e4(ticks):
    """The JAX-built QP's exact (f64, polished) solution must reproduce the
    oracle cascade's torques: the deliberate ridge-vs-bound pinning difference
    shifts the minimizer by <1e-5 (BASELINE.json:5 budget 1e-4)."""
    for k in [0, 10, 25, 39]:
        q, v, refs, o_tau = ticks[k]
        H, g, A, l, u, Mm, h, JcT = build64(q, v, refs)
        res = solve_qp(H, g, A, l, u)
        tau = tau_of(res.x, Mm, h, JcT)
        assert np.abs(tau - o_tau).max() < 1e-4, f"tick {k}"


@pytest.mark.parametrize("polish,mean_budget,max_budget", [
    # raw fixed-iteration solve (the cascade's in-loop configuration; its
    # warm starts then reach ~8e-4 — see the warm-sequence test)
    (False, 0.1, 0.4),
    # + device-side df32 active-set polish: the WBC analog of the MPC
    # stage's 1e-4 tier (VERDICT.md round-3 item 4).  Measured 0.023 / 0.10.
    (True, 0.05, 0.2),
])
def test_f32_cold_solve_parity(ticks, polish, mean_budget, max_budget):
    """Fixed-iteration f32 device solve, cold-started, across all 40 ticks.
    The round-1 regression sat at mean 1.6 / max 3.2 — 16x the no-polish
    budget."""
    solve = jax.jit(lambda *a: admm_solve(*a, iters=60, adapt_rounds=3,
                                          rho=0.1, polish_kkt=polish))
    errs = []
    for q, v, refs, o_tau in ticks:
        H, g, A, l, u, Mm, h, JcT = build64(q, v, refs)
        s = solve(*[jnp.asarray(a, F32) for a in (H, g, A, l, u)])
        tau = tau_of(np.asarray(s.x, np.float64), Mm, h, JcT)
        errs.append(np.abs(tau - o_tau).max())
    errs = np.asarray(errs)
    assert errs.mean() < mean_budget, errs.mean()
    assert errs.max() < max_budget, errs.max()


def test_wbc_parity_tier_under_1e4(ticks):
    """The NAMED WBC parity tier (config.py WBC_PARITY_SOLVER): f64-island
    admm_solve, warm-started, polish on — must land under 1e-4 of tau_max
    (2.7e-4 Nm) against the oracle cascade's torques (BASELINE.json:5).

    Measured round 5: mean 1.85e-5 / max 2.53e-5 Nm — the formulation floor
    (an exact f64 oracle solve of the same QPs gives the same numbers; the
    residue is the deliberate ridge-vs-bound swing pinning difference).
    config.py documents why the f64 island is provably necessary: the f32
    data cast is NOT the floor (exact solve on f32-cast data: 1.9e-5), the
    f32 solve arithmetic is (best measured f32 tier: 7.4e-4)."""
    from mpctsid_tpu.config import WBC_PARITY_SOLVER

    qpdata = []
    for q, v, refs, o_tau in ticks:
        qpdata.append(build64(q, v, refs) + [o_tau])
    jax.config.update("jax_enable_x64", True)
    try:
        solve = jax.jit(lambda H, g, A, l, u, x0, y0: admm_solve(
            H, g, A, l, u, x0=x0, y0=y0,
            iters=WBC_PARITY_SOLVER.wbc_iters,
            adapt_rounds=WBC_PARITY_SOLVER.wbc_adapt_rounds,
            rho=WBC_PARITY_SOLVER.rho, polish_kkt=True))
        errs = []
        wx = wy = None
        for H, g, A, l, u, Mm, h, JcT, o_tau in qpdata:
            a = [jnp.asarray(x, jnp.float64) for x in (H, g, A, l, u)]
            if wx is None:
                wx = jnp.zeros(H.shape[0], jnp.float64)
                wy = jnp.zeros(A.shape[0], jnp.float64)
            s = solve(*a, wx, wy)
            assert np.asarray(s.x).dtype == np.float64
            wx, wy = s.x, s.y
            tau = tau_of(np.asarray(s.x), Mm, h, JcT)
            errs.append(np.abs(tau - o_tau).max())
    finally:
        jax.config.update("jax_enable_x64", False)
    errs = np.asarray(errs)
    tau_budget = 1e-4 * CFG.wbc.tau_max          # 2.7e-4 Nm
    assert errs.mean() < tau_budget, errs.mean()
    # max budget: ~4x the measured max (2.53e-5), still under the tier budget
    assert errs.max() < 1e-4, errs.max()


def test_f32_warm_sequence_tracks_oracle(ticks):
    """The cascade's actual operating mode: warm-start each tick from the
    previous solution, at the PRODUCTION solver budget (CFG.solver), so this
    test tracks what the cascade actually ships.  End-of-sequence torque
    parity must stay bounded."""
    errs = []
    wx = wy = None
    for q, v, refs, o_tau in ticks:
        tau, qdd, f, sol = solve_wbc(
            TREE, CFG.wbc, jnp.asarray(q, F32), jnp.asarray(v, F32),
            jax_refs(refs), iters=CFG.solver.wbc_iters,
            adapt_rounds=CFG.solver.wbc_adapt_rounds, warm_x=wx, warm_y=wy)
        wx, wy = sol.x, sol.y
        errs.append(np.abs(np.asarray(tau, np.float64) - o_tau).max())
    errs = np.asarray(errs)
    assert np.isfinite(errs).all()
    # measured mean 9.9e-4 Nm at the round-5 production budget 40/3
    # (scripts/probe_wbc_budget.py; see config.py SolverConfig for why 3
    # adapt rounds are load-bearing).  Budget = 3x measured so a 10x
    # regression cannot hide (tau scale: tau_max = 2.7).  The 1e-4
    # CONTRACT tier is test_wbc_parity_tier_under_1e4 above.
    assert errs.mean() < 3e-3, errs.mean()


def test_batched_vs_single_consistency(ticks):
    """SURVEY.md §4.4: vmapped WBC solve == per-sample solve."""
    sub = [ticks[k] for k in [0, 15, 30]]
    qs = jnp.stack([jnp.asarray(q, F32) for q, *_ in sub])
    vs = jnp.stack([jnp.asarray(v, F32) for _, v, *_ in sub])
    refs_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[jax_refs(r) for _, _, r, _ in sub])
    solve_b = jax.jit(jax.vmap(lambda q, v, r: solve_wbc(TREE, CFG.wbc, q, v, r)))
    tau_b, qdd_b, f_b, _ = solve_b(qs, vs, refs_b)
    for i, (q, v, refs, _) in enumerate(sub):
        tau, qdd, f, _ = solve_wbc(TREE, CFG.wbc, jnp.asarray(q, F32),
                                   jnp.asarray(v, F32), jax_refs(refs))
        # vmap changes matmul reduction order, which through the cond~1e5
        # WBC KKT amplifies to ~cond * eps_f32 ~ 1e-2 relative worst-case
        # divergence between the two f32 solves (tau scale: tau_max = 2.7).
        # Measured: ~1e-3 round 4, 1.3e-2 worst element round 5 after the
        # norm-only Ruiz rewrite re-rolled the fp noise (the Ruiz scales
        # themselves are bitwise vmap-vs-single identical; verified round 5).
        # Budget = the amplification bound, not the lucky draw.
        np.testing.assert_allclose(np.asarray(tau_b[i]), np.asarray(tau),
                                   atol=2e-2)


def test_swing_forces_pinned(ticks):
    """The ridge must hold swing-foot forces at ~0 through the solve."""
    for k in [10, 25]:
        q, v, refs, _ = ticks[k]
        c = np.asarray(refs.contacts)
        if (c > 0.5).all():
            continue
        tau, qdd, f, _ = solve_wbc(TREE, CFG.wbc, jnp.asarray(q, F32),
                                   jnp.asarray(v, F32), jax_refs(refs))
        swing_f = np.asarray(f)[c < 0.5]
        assert np.abs(swing_f).max() < 1e-2


def test_torque_bounds_respected(ticks):
    for k in [5, 20, 35]:
        q, v, refs, _ = ticks[k]
        tau, *_ = solve_wbc(TREE, CFG.wbc, jnp.asarray(q, F32),
                            jnp.asarray(v, F32), jax_refs(refs))
        assert np.abs(np.asarray(tau)).max() < CFG.wbc.tau_max * 1.05
