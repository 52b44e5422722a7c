import os, sys, functools
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np

variant = sys.argv[1]
import mpctsid_tpu.qp.admm as admm
_orig = admm.admm_solve
wbc_mode = "blockinv" if "wbcchol" in variant else "exact_inv"
mpc_mode = "blockinv" if "mpcchol" in variant else "exact_inv"
import mpctsid_tpu.wbc.tsid as tsid
tsid.admm_solve = functools.partial(_orig, mode=wbc_mode)
admm.admm_solve = functools.partial(_orig, mode=mpc_mode)
# mpc module imports admm_solve where?
import mpctsid_tpu.mpc as mpc_pkg
for name in dir(mpc_pkg):
    pass
import importlib, pkgutil
import mpctsid_tpu.mpc
for mod in list(sys.modules.values()):
    n = getattr(mod, "__name__", "")
    if n.startswith("mpctsid_tpu.mpc") and hasattr(mod, "admm_solve"):
        mod.admm_solve = functools.partial(_orig, mode=mpc_mode)

from mpctsid_tpu.cascade import CascadeConfigured, cascade_rollout, init_controller
import mpctsid_tpu.cascade as casc
for mod in list(sys.modules.values()):
    n = getattr(mod, "__name__", "")
    if n.startswith("mpctsid_tpu.cascade") and hasattr(mod, "admm_solve"):
        mod.admm_solve = functools.partial(_orig, mode=mpc_mode)
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
M = SOLO12
q0 = np.zeros(19, np.float32); q0[2]=M.h_ref; q0[6]=1.0; q0[7:]=M.q_stand
cfg = EngineConfig(gait="trot", v_ref=(0.3,0.0,0.0))
cc = CascadeConfigured(M, cfg)
gid = jnp.int32(GAIT_IDS["trot"])
ctl = init_controller(M, cfg, cc.tree, jnp.asarray(q0), gid)
pl = PlantState.init(jnp.asarray(q0))
roll = jax.jit(functools.partial(cascade_rollout, cc, n_periods=60))
ctl, pl, metrics = roll(ctl, pl, gid, jnp.asarray((0.3,0.0,0.0), jnp.float32), ContactParams.default())
x = np.asarray(metrics["x_srb"])
print(variant, "minz=%.3f maxrp=%.3f fwd=%.3f vmean=%.3f nan=%s" % (
    x[:,2].min(), np.abs(x[:,3:5]).max(), x[-1,0], np.mean(x[30:,6]), np.isnan(x).any()))
