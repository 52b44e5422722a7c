import numpy as np
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.model.tree import build_tree
from mpctsid_tpu.oracle.cascade import OracleController
from mpctsid_tpu.oracle.sim import SimState, step as o_step
M = SOLO12
q0 = np.zeros(19); q0[2]=M.h_ref; q0[6]=1.0; q0[7:]=M.q_stand
cfg = EngineConfig(gait="trot", v_ref=(0.3,0.0,0.0))
tree = build_tree(M)
ctl = OracleController(M, cfg, q0)
sim = SimState.init(q0)
import mpctsid_tpu.oracle.dynamics as dyn
zs=[]; rps=[]
nticks = 60*cfg.cascade.mpc_every
for k in range(nticks):
    cmd, log = ctl.compute(sim.q, sim.v)
    tau = cmd.torque(sim.q[7:], sim.v[6:])
    sim, _ = o_step(tree, sim, tau)
    if k % cfg.cascade.mpc_every == 0:
        zs.append(sim.q[2])
        # rpy from quaternion
        w,x,y,z = sim.q[6], sim.q[3], sim.q[4], sim.q[5]
        import math
        roll = math.atan2(2*(w*x+y*z), 1-2*(x*x+y*y))
        pitch = math.asin(max(-1,min(1,2*(w*y-z*x))))
        rps.append((roll,pitch))
zs=np.array(zs); rps=np.array(rps)
print("oracle minz=%.3f maxrp=%.3f fwd=%.3f" % (zs.min(), np.abs(rps).max(), sim.q[0]))
