"""Inverse-quality probe on real WBC KKT matrices (ridge formulation).

Builds the Ruiz-scaled KKT K = P + sigma I + A' diag(rho) A for captured trot
ticks, then measures ||I - K X||_F for spd_inverse_chol at several ns_steps vs
f32 LU inverse vs f64 truth.  Also: does feeding the better inverse into a
60-iter ADMM recover exact_inv parity?
"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree
from mpctsid_tpu.oracle.cascade import OracleController
from mpctsid_tpu.oracle.sim import SimState, step as o_step
import mpctsid_tpu.oracle.cascade as ocas
from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp
from mpctsid_tpu.qp.admm import ruiz_equilibrate, INF
from mpctsid_tpu.qp.blockinv import spd_inverse_chol

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

for k in [0, 45, 70]:
    q, v, refs = captured[k]
    jrefs = WbcRefs(*[jnp.asarray(getattr(refs, f)) for f in
                      ["contacts", "f_mpc", "foot_pos_ref", "foot_vel_ref",
                       "foot_acc_ref", "q_posture", "base_rpy_ref", "h_ref"]])
    H, g, A, l, u = build_wbc_qp(tree, cfg.wbc, jnp.asarray(q),
                                 jnp.asarray(v), jrefs)[:5]
    # f32 Ruiz-scaled problem, like admm_solve sees it
    c32 = lambda a: jnp.asarray(np.asarray(a), jnp.float32)
    Pb, qb, Ab, lb, ub, D, E, c = ruiz_equilibrate(
        c32(H), c32(g), c32(A), c32(l), c32(u), 8)
    eq = (np.asarray(u) - np.asarray(l)) < 1e-9
    rho_vec = jnp.asarray(np.where(eq, 1e3, 1.0) * 0.1, jnp.float32)
    K = Pb + 1e-6 * jnp.eye(30, dtype=jnp.float32) + (Ab.T * rho_vec) @ Ab
    K64 = np.asarray(K, np.float64)
    cond = np.linalg.cond(K64)
    X_true = np.linalg.inv(K64)
    eye = np.eye(30)
    def res(X):
        return np.linalg.norm(eye - K64 @ np.asarray(X, np.float64))
    X_lu = jnp.linalg.inv(K)
    line = f"tick {k:3d} cond(K) {cond:.2e} | lu {res(X_lu):.2e}"
    for ns in [0, 1, 2, 3]:
        Xc = spd_inverse_chol(K, ns_steps=ns)
        line += f" | chol+{ns}ns {res(Xc):.2e}"
    print(line)
