import os, sys, functools
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
import mpctsid_tpu.qp.admm as admm
_orig = admm.admm_solve
variant = sys.argv[1]
kw = {}
if "polish" in variant: kw["polish_kkt"] = True
if "exact" in variant: kw["mode"] = "exact_inv"
patched = functools.partial(_orig, **kw) if kw else _orig
admm.admm_solve = patched
import mpctsid_tpu.wbc.tsid as tsid; tsid.admm_solve = patched
import mpctsid_tpu.cascade.engine as eng; eng.admm_solve = patched
from mpctsid_tpu.cascade import CascadeConfigured, cascade_rollout, init_controller
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
