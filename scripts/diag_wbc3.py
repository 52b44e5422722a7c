"""Dissect one bad WBC tick: f32 ADMM convergence vs iters/rounds/polish/warm.

Captures trot WBC QPs via the oracle cascade hook (as diag_wbc2), picks a tick
where f32-60 was bad, and sweeps solver settings against the oracle polished
solution.
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

k = 45
q, v, refs, _ = captured[k]
jrefs = WbcRefs(*[jnp.asarray(getattr(refs, f)) for f in
                  ["contacts", "f_mpc", "foot_pos_ref", "foot_vel_ref",
                   "foot_acc_ref", "q_posture", "base_rpy_ref", "h_ref"]])
H, g, A, l, u = build_wbc_qp(tree, cfg.wbc, jnp.asarray(q), jnp.asarray(v),
                             jrefs)[:5]
Mm = np.asarray(build_wbc_qp(tree, cfg.wbc, jnp.asarray(q), jnp.asarray(v),
                             jrefs)[5])
hb, JcT = (np.asarray(a) for a in build_wbc_qp(
    tree, cfg.wbc, jnp.asarray(q), jnp.asarray(v), jrefs)[6:8])
Hn, gn, An, ln, un = (np.asarray(a) for a in (H, g, A, l, u))
r_o = solve_qp(Hn, gn, An, ln, un)
tau_ref = tau_of(r_o.x, Mm, hb, JcT)
print(f"tick {k} contacts {np.asarray(refs.contacts)}  tau_ref |max| "
      f"{np.abs(tau_ref).max():.3f}")

c32 = lambda a: jnp.asarray(a, jnp.float32)
H32, g32, A32, l32, u32 = (c32(a) for a in (Hn, gn, An, ln, un))

for iters, rounds, pol, mode in [
        (60, 3, False, "blockinv"), (60, 3, True, "blockinv"),
        (120, 3, False, "blockinv"), (120, 3, True, "blockinv"),
        (240, 4, False, "blockinv"), (240, 4, True, "blockinv"),
        (600, 6, False, "blockinv"), (600, 6, True, "blockinv"),
        (60, 3, True, "exact_inv"), (240, 4, True, "exact_inv"),
        (60, 1, False, "blockinv"), (240, 1, False, "blockinv"),
        (600, 1, False, "blockinv")]:
    s = admm_solve(H32, g32, A32, l32, u32, iters=iters,
                   adapt_rounds=rounds, rho=0.1, mode=mode, polish_kkt=pol)
    tau = tau_of(np.asarray(s.x, np.float64), Mm, hb, JcT)
    print(f"iters {iters:4d} rounds {rounds} polish {int(pol)} mode "
          f"{mode:9s}: tau err {np.abs(tau - tau_ref).max():.3e}  "
          f"prim {float(s.prim_res):.2e} dual {float(s.dual_res):.2e}")

# same in f64 at 60 iters: is it iterations or precision?
s = admm_solve(H, g, A, l, u, iters=60, adapt_rounds=3, rho=0.1,
               mode="exact_inv")
tau = tau_of(np.asarray(s.x), Mm, hb, JcT)
print(f"f64 60/3 exact_inv: tau err {np.abs(tau - tau_ref).max():.3e}  "
      f"prim {float(s.prim_res):.2e} dual {float(s.dual_res):.2e}")
s = admm_solve(H, g, A, l, u, iters=60, adapt_rounds=3, rho=0.1,
               mode="exact_inv", polish_kkt=True)
tau = tau_of(np.asarray(s.x), Mm, hb, JcT)
print(f"f64 60/3 exact_inv +polish: tau err {np.abs(tau - tau_ref).max():.3e}")
