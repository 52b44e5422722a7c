"""Diagnose the f32 WBC regression: compare swing-force pinning formulations
on real trot-tick QP instances against the f64 oracle solution.

Candidates:
  pyr0   — current: swing fz in [0,0] pyramid bounds (degenerate tight pair)
  ident  — swing contact rows become identity-on-f equality rows (l=u=0),
           swing pyramid rows freed
  ridge  — 1e6 Hessian ridge on swing forces (round-1 original)
"""
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree, NV
from mpctsid_tpu.oracle.cascade import OracleController
from mpctsid_tpu.oracle.sim import SimState, step as o_step
from mpctsid_tpu.oracle.wbc import solve_wbc as oracle_solve_wbc, WbcRefs as OWbcRefs
from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp
from mpctsid_tpu.qp.admm import admm_solve, INF

M = SOLO12
cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
tree = build_tree(M)
q0 = np.zeros(19); q0[2] = M.h_ref; q0[6] = 1.0; q0[7:] = M.q_stand

ctl = OracleController(M, cfg, q0)
sim = SimState.init(q0)

samples = []   # (q, v, refs)
NTICK = 5 * cfg.cascade.mpc_every
for k in range(NTICK):
    # reach inside: compute() builds refs then solves; replicate by calling
    # compute and stashing via monkey capture of the last refs
    cmd, log = ctl.compute(sim.q, sim.v)
    tau = cmd.torque(sim.q[7:], sim.v[6:])
    # rebuild refs identically to oracle compute() internals for the sample:
    samples.append((sim.q.copy(), sim.v.copy(), log.contacts.copy(),
                    log.f_plan.copy()))
    sim, _ = o_step(tree, sim, tau)

# to get full refs (swing traj), easier: instrument controller — re-run with a
# hook. Patch solve_wbc to capture args.
import mpctsid_tpu.oracle.cascade as ocas
captured = []
_orig = ocas.solve_wbc
def hook(tree_, cfgw, q, v, refs, **kw):
    captured.append((q.copy(), v.copy(), refs))
    return _orig(tree_, cfgw, q, v, refs, **kw)
ocas.solve_wbc = hook
ctl = OracleController(M, cfg, q0)
sim = SimState.init(q0)
for k in range(NTICK):
    cmd, log = ctl.compute(sim.q, sim.v)
    sim, _ = o_step(tree, sim, cmd.torque(sim.q[7:], sim.v[6:]))
ocas.solve_wbc = _orig
print(f"captured {len(captured)} ticks")

jtree = build_tree(M)  # same tree works for the jax builder (pure data)

def build_variant(q, v, refs, pin):
    jrefs = WbcRefs(
        contacts=jnp.asarray(refs.contacts, jnp.float64),
        f_mpc=jnp.asarray(refs.f_mpc),
        foot_pos_ref=jnp.asarray(refs.foot_pos_ref),
        foot_vel_ref=jnp.asarray(refs.foot_vel_ref),
        foot_acc_ref=jnp.asarray(refs.foot_acc_ref),
        q_posture=jnp.asarray(refs.q_posture),
        base_rpy_ref=jnp.asarray(refs.base_rpy_ref),
        h_ref=jnp.asarray(refs.h_ref))
    H, g, A, l, u, Mm, h, JcT = build_wbc_qp(
        jtree, cfg.wbc, jnp.asarray(q), jnp.asarray(v), jrefs)
    H, g, A, l, u = (np.array(a) for a in (H, g, A, l, u))
    c = np.asarray(refs.contacts)
    if pin == "ident":
        # free the swing pyramid rows entirely
        for i in range(4):
            if c[i] < 0.5:
                r0 = 18 + 5 * i
                l[r0:r0 + 5] = [-INF, 0.0, -INF, 0.0, -INF]
                u[r0:r0 + 5] = [0.0, INF, 0.0, INF, INF]
                l[r0:r0+5] = -INF; u[r0:r0+5] = INF
                # contact rows -> identity on f_i with l=u=0
                rc = 38 + 3 * i
                A[rc:rc + 3, :] = 0.0
                A[rc:rc + 3, NV + 3*i:NV + 3*i + 3] = np.eye(3)
                l[rc:rc + 3] = 0.0
                u[rc:rc + 3] = 0.0
    elif pin == "ridge":
        for i in range(4):
            if c[i] < 0.5:
                r0 = 18 + 5 * i
                l[r0:r0+5] = [-INF, 0.0, -INF, 0.0, 0.0]
                u[r0:r0+5] = [0.0, INF, 0.0, INF, INF]
                idx = NV + 3*i + np.arange(3)
                H[idx, idx] += 1e6
    return H, g, A, l, u, np.asarray(Mm), np.asarray(h), np.asarray(JcT)

def tau_of(x, Mm, h, JcT):
    return Mm[6:] @ x[:NV] + h[6:] - JcT[6:] @ x[NV:]

rng = np.random.default_rng(0)
report = {}
for pin in ["pyr0", "ident", "ridge"]:
    errs_cold = []
    errs_warm = []
    prev = None
    for (q, v, refs) in captured:
        H, g, A, l, u, Mm, h, JcT = build_variant(q, v, refs, pin)
        # f64 truth: long ADMM in f64
        s64 = admm_solve(jnp.asarray(H), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(l), jnp.asarray(u),
                         iters=2000, adapt_rounds=10, rho=0.1,
                         mode="exact_inv")
        tau64 = tau_of(np.asarray(s64.x), Mm, h, JcT)
        c32 = lambda a: jnp.asarray(a, jnp.float32)
        s32 = admm_solve(c32(H), c32(g), c32(A), c32(l), c32(u),
                         iters=60, adapt_rounds=3, rho=0.1)
        tau32 = tau_of(np.asarray(s32.x, np.float64), Mm, h, JcT)
        errs_cold.append(np.abs(tau32 - tau64).max())
        if prev is not None:
            s32w = admm_solve(c32(H), c32(g), c32(A), c32(l), c32(u),
                              x0=c32(prev[0]), y0=c32(prev[1]),
                              iters=60, adapt_rounds=3, rho=0.1)
            tau32w = tau_of(np.asarray(s32w.x, np.float64), Mm, h, JcT)
            errs_warm.append(np.abs(tau32w - tau64).max())
        prev = (np.asarray(s32.x), np.asarray(s32.y))
    errs_cold = np.array(errs_cold); errs_warm = np.array(errs_warm)
    report[pin] = (errs_cold, errs_warm)
    print(f"{pin:6s} cold: mean {errs_cold.mean():.2e} max {errs_cold.max():.2e} | "
          f"warm: mean {errs_warm.mean():.2e} max {errs_warm.max():.2e}")
