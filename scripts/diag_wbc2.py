"""Check the diag harness itself: oracle polished solver vs JAX f64 long ADMM
vs f32 60-iter, on captured trot WBC ticks. Also report per-tick contact sets."""
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
from mpctsid_tpu.oracle import wbc as owbc
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
    captured.append((q.copy(), v.copy(), refs, out))
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

for k in [0, 25, 30, 45, 50, 70, 95]:
    q, v, refs, (o_tau, o_qdd, o_f, o_res) = captured[k]
    jrefs = WbcRefs(*[jnp.asarray(getattr(refs, f)) for f in
                      ["contacts", "f_mpc", "foot_pos_ref", "foot_vel_ref",
                       "foot_acc_ref", "q_posture", "base_rpy_ref", "h_ref"]])
    H, g, A, l, u, Mm, h, JcT = build_wbc_qp(
        tree, cfg.wbc, jnp.asarray(q), jnp.asarray(v), jrefs)
    Hn, gn, An, ln, un = (np.asarray(a) for a in (H, g, A, l, u))
    Mm, h, JcT = np.asarray(Mm), np.asarray(h), np.asarray(JcT)
    # oracle solver on the JAX-built QP
    r_o = solve_qp(Hn, gn, An, ln, un)
    tau_oracle_qp = tau_of(r_o.x, Mm, h, JcT)
    # jax f64 long admm
    s64 = admm_solve(H, g, A, l, u, iters=2000, adapt_rounds=10, rho=0.1,
                     mode="exact_inv")
    tau64 = tau_of(np.asarray(s64.x), Mm, h, JcT)
    c32 = lambda a: jnp.asarray(a, jnp.float32)
    s32 = admm_solve(c32(Hn), c32(gn), c32(An), c32(ln), c32(un),
                     iters=60, adapt_rounds=3, rho=0.1)
    tau32 = tau_of(np.asarray(s32.x, np.float64), Mm, h, JcT)
    print(f"tick {k:3d} contacts {refs.contacts} | "
          f"o_tau vs oracleQP(jaxbuild) {np.abs(o_tau - tau_oracle_qp).max():.2e} | "
          f"truth64 vs oracleQP {np.abs(tau64 - tau_oracle_qp).max():.2e} | "
          f"f32-60 vs oracleQP {np.abs(tau32 - tau_oracle_qp).max():.2e} | "
          f"o_res conv={o_res.converged} pol={r_o.polished}")
