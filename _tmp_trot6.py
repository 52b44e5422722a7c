import os, sys, functools
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
import mpctsid_tpu.qp.admm as admm
_orig = admm.admm_solve
variant = sys.argv[1]

def mk32(**extra):
    def qp_f32(P,q,A,l,u,x0=None,y0=None,**kw):
        kw.update(extra)
        c32 = lambda a: None if a is None else a.astype(jnp.float32)
        sol = _orig(c32(P),c32(q),c32(A),c32(l),c32(u),x0=c32(x0),y0=c32(y0),**kw)
        return jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), sol)
    return qp_f32

import mpctsid_tpu.wbc.tsid as tsid
import mpctsid_tpu.cascade.engine as eng
pol = {"polish_kkt": True} if "polish" in variant else {}
if "wbc32" in variant:
    tsid.admm_solve = mk32(**pol)
if "mpc32" in variant:
    eng.admm_solve = mk32(**pol)

from mpctsid_tpu.cascade import CascadeConfigured, cascade_rollout, init_controller
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
M = SOLO12
q0 = np.zeros(19, np.float64); q0[2]=M.h_ref; q0[6]=1.0; q0[7:]=M.q_stand
cfg = EngineConfig(gait="trot", v_ref=(0.3,0.0,0.0))
cc = CascadeConfigured(M, cfg)
gid = jnp.int32(GAIT_IDS["trot"])
ctl = init_controller(M, cfg, cc.tree, jnp.asarray(q0), gid)
pl = PlantState.init(jnp.asarray(q0))
roll = jax.jit(functools.partial(cascade_rollout, cc, n_periods=60))
ctl, pl, metrics = roll(ctl, pl, gid, jnp.asarray((0.3,0.0,0.0), jnp.float64), ContactParams.default())
x = np.asarray(metrics["x_srb"])
print(variant, "minz=%.3f maxrp=%.3f fwd=%.3f vmean=%.3f nan=%s" % (
    x[:,2].min(), np.abs(x[:,3:5]).max(), x[-1,0], np.mean(x[30:,6]), np.isnan(x).any()))
