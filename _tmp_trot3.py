import os, sys, functools
import jax
jax.config.update("jax_platforms", "cpu")
if "x64" in sys.argv[1:]:
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from mpctsid_tpu.cascade import CascadeConfigured, cascade_rollout, init_controller
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
M = SOLO12
kw = {}
for a in sys.argv[1:]:
    if "=" in a:
        k, v = a.split("="); kw[k] = int(v)
dtype = jnp.float64 if "x64" in sys.argv[1:] else jnp.float32
q0 = np.zeros(19, dtype); q0[2]=M.h_ref; q0[6]=1.0; q0[7:]=M.q_stand
cfg = EngineConfig(gait="trot", v_ref=(0.3,0.0,0.0))
cc = CascadeConfigured(M, cfg)
gid = jnp.int32(GAIT_IDS["trot"])
ctl = init_controller(M, cfg, cc.tree, jnp.asarray(q0, dtype), gid)
pl = PlantState.init(jnp.asarray(q0, dtype))
roll = jax.jit(functools.partial(cascade_rollout, cc, n_periods=60, **kw))
ctl, pl, metrics = roll(ctl, pl, gid, jnp.asarray((0.3,0.0,0.0), dtype), ContactParams.default())
x = np.asarray(metrics["x_srb"])
print(" ".join(sys.argv[1:]) or "base", "minz=%.3f maxrp=%.3f fwd=%.3f vmean=%.3f nan=%s" % (
    x[:,2].min(), np.abs(x[:,3:5]).max(), x[-1,0], np.mean(x[30:,6]), np.isnan(x).any()))
