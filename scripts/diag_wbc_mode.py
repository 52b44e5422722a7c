"""Compare WBC KKT modes (exact_inv vs blockinv) on the RIDGE formulation:
per-tick torque parity vs the oracle polished solve, across 100 trot ticks.
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
import mpctsid_tpu.oracle.cascade as ocas
from mpctsid_tpu.oracle.qp import solve_qp
from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp
from mpctsid_tpu.qp.admm import admm_solve

M = SOLO12
cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
tree = build_tree(M)
q0 = np.zeros(19); q0[2] = M.h_ref; q0[6] = 1.0; q0[7:] = M.q_stand

captured = []
_orig = ocas.solve_wbc
def hook(tree_, cfgw, q, v, refs, **kw):
    out = _orig(tree_, cfgw, q, v, refs, **kw)
    captured.append((q.copy(), v.copy(), refs))
    return out
ocas.solve_wbc = hook
ctl = OracleController(M, cfg, q0)
sim = SimState.init(q0)
for k in range(5 * cfg.cascade.mpc_every):
    cmd, log = ctl.compute(sim.q, sim.v)
    sim, _ = o_step(tree, sim, cmd.torque(sim.q[7:], sim.v[6:]))
ocas.solve_wbc = _orig

def tau_of(x, Mm, h, JcT):
    return Mm[6:] @ x[:NV] + h[6:] - JcT[6:] @ x[NV:]

c32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
solve32 = jax.jit(lambda H, g, A, l, u, mode: admm_solve(
    H, g, A, l, u, iters=60, adapt_rounds=3, rho=0.1, mode=mode),
    static_argnames=("mode",))

errs = {m: [] for m in ["exact_inv", "blockinv", "inv"]}
for (q, v, refs) in captured:
    jrefs = WbcRefs(*[jnp.asarray(getattr(refs, f)) for f in
                      ["contacts", "f_mpc", "foot_pos_ref", "foot_vel_ref",
                       "foot_acc_ref", "q_posture", "base_rpy_ref", "h_ref"]])
    out = build_wbc_qp(tree, cfg.wbc, jnp.asarray(q), jnp.asarray(v), jrefs)
    H, g, A, l, u = (np.asarray(a) for a in out[:5])
    Mm, hb, JcT = (np.asarray(a) for a in out[5:8])
    r_o = solve_qp(H, g, A, l, u)
    tau_ref = tau_of(r_o.x, Mm, hb, JcT)
    for m in errs:
        s = solve32(c32(H), c32(g), c32(A), c32(l), c32(u), m)
        tau = tau_of(np.asarray(s.x, np.float64), Mm, hb, JcT)
        errs[m].append(np.abs(tau - tau_ref).max())

for m, e in errs.items():
    e = np.array(e)
    print(f"{m:10s}: mean {e.mean():.3e}  p90 {np.percentile(e,90):.3e}  "
          f"max {e.max():.3e}")
