import functools
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from mpctsid_tpu import dyn
from mpctsid_tpu.qp.admm import admm_solve
from mpctsid_tpu.cascade import CascadeConfigured, init_controller
from mpctsid_tpu.cascade.engine import srb_state, ControllerState
from mpctsid_tpu.config import EngineConfig
from mpctsid_tpu.env.plant import ContactParams, PlantState, plant_step
from mpctsid_tpu.model.gaits import GAIT_IDS
from mpctsid_tpu.model.solo12 import SOLO12
from mpctsid_tpu.mpc.srb import build_mpc_qp, reference_rollout
from mpctsid_tpu.plan.footsteps import plan_footsteps_horizon
from mpctsid_tpu.plan.gait import contacts_at, swing_tables
from mpctsid_tpu.plan.swing import swing_foot_ref
from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp, NV

M = SOLO12
cfg = EngineConfig(gait="trot", v_ref=(0.3,0.0,0.0))
cc = CascadeConfigured(M, cfg)
tree = cc.tree
q0 = np.zeros(19); q0[2]=M.h_ref; q0[6]=1.0; q0[7:]=M.q_stand
gid = jnp.int32(GAIT_IDS["trot"])
ctl = init_controller(M, cfg, cc.tree, jnp.asarray(q0), gid)
pl = PlantState.init(jnp.asarray(q0))
cp = ContactParams.default()
vc = jnp.asarray((0.3,0.0,0.0))
dtype = jnp.float64
mpc_every = cfg.cascade.mpc_every

worst = (0.0, None)
for period in range(10):
    phase = ctl.phase
    contacts = contacts_at(gid, phase).astype(dtype)
    feet_now = dyn.foot_positions(tree, pl.q)
    x_srb = srb_state(pl.q, pl.v)
    to_swing = (contacts < 0.5) & (ctl.prev_contacts > 0.5)
    liftoff = jnp.where(to_swing[:, None], feet_now, ctl.liftoff)
    fsteps, next_td = plan_footsteps_horizon(M, cfg.mpc, cfg.cascade, gid, phase, x_srb, vc, feet_now)
    touchdown = jnp.where((contacts < 0.5)[:, None], next_td, ctl.touchdown)
    x_ref = reference_rollout(M, cfg.mpc, x_srb, vc)
    cont_h = jnp.stack([contacts_at(gid, phase + k).astype(dtype) for k in range(cfg.mpc.horizon)])
    P, q_lin, A, l, u = build_mpc_qp(M, cfg.mpc, x_srb, x_ref, fsteps, cont_h)
    mpc_sol = admm_solve(P, q_lin, A, l, u, x0=ctl.mpc_warm_x, y0=ctl.mpc_warm_y, iters=100, adapt_rounds=4, rho=0.1)
    new_plan = mpc_sol.x.reshape(cfg.mpc.horizon, 4, 3)
    f_used = ctl.f_plan[1] * contacts[:, None]
    back, fwd, dur, stance_steps = swing_tables(gid, phase)
    T_swing = dur.astype(dtype) * cfg.mpc.dt
    wx, wy = ctl.wbc_warm_x, ctl.wbc_warm_y
    for t in range(mpc_every):
        frac = t / mpc_every
        s = jnp.where(dur > 0, (back.astype(dtype) + frac) / jnp.maximum(dur.astype(dtype), 1.0), 0.0)
        pos, vel, acc = swing_foot_ref(liftoff, touchdown, s, T_swing, cfg.cascade.swing_height)
        refs = WbcRefs(contacts=contacts, f_mpc=f_used, foot_pos_ref=pos, foot_vel_ref=vel,
                       foot_acc_ref=acc, q_posture=jnp.asarray(M.q_stand, dtype),
                       base_rpy_ref=jnp.zeros(2, dtype), h_ref=jnp.asarray(M.h_ref, dtype))
        H, g, Aw, lw, uw, Mm, h, JcT = build_wbc_qp(tree, cfg.wbc, pl.q, pl.v, refs)
        sol64 = admm_solve(H, g, Aw, lw, uw, x0=wx, y0=wy, iters=60, adapt_rounds=3, rho=0.1)
        c32 = lambda a: None if a is None else a.astype(jnp.float32)
        sol32 = admm_solve(c32(H), c32(g), c32(Aw), c32(lw), c32(uw), x0=c32(wx), y0=c32(wy), iters=60, adapt_rounds=3, rho=0.1)
        e = float(jnp.max(jnp.abs(sol64.x - sol32.x.astype(dtype))))
        n32 = bool(jnp.isnan(sol32.x).any())
        if n32 or e > worst[0]:
            worst = (e, (period, t, n32))
            np.savez("/tmp/wbc_bad.npz", H=np.asarray(H), g=np.asarray(g), A=np.asarray(Aw),
                     l=np.asarray(lw), u=np.asarray(uw), wx=np.asarray(wx), wy=np.asarray(wy))
        if n32:
            print("NaN at period", period, "tick", t)
        # continue the f64 loop
        qdd = sol64.x[:NV]; f = sol64.x[NV:]
        tau_ff = Mm[6:] @ qdd + h[6:] - JcT[6:] @ f
        tau_ff = jnp.clip(tau_ff, -cfg.wbc.tau_max, cfg.wbc.tau_max)
        wbc_dt = cfg.cascade.wbc_dt
        qd_des = pl.v[6:] + qdd[6:] * wbc_dt
        q_des = pl.q[7:] + pl.v[6:] * wbc_dt + 0.5 * qdd[6:] * wbc_dt**2
        tau = jnp.clip(tau_ff + 6.0*(q_des - pl.q[7:]) + 0.3*(qd_des - pl.v[6:]), -cfg.wbc.tau_max, cfg.wbc.tau_max)
        pl, _ = plant_step(tree, pl, tau, dt=wbc_dt, params=cp)
        wx, wy = sol64.x, sol64.y
    ctl = ControllerState(phase=phase+1, liftoff=liftoff, touchdown=touchdown,
                          prev_contacts=contacts, f_plan=new_plan,
                          mpc_warm_x=mpc_sol.x, mpc_warm_y=mpc_sol.y,
                          wbc_warm_x=wx, wbc_warm_y=wy)
    print("period", period, "worst err so far %.2e" % worst[0], worst[1])
print("WORST:", worst)
