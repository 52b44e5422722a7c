"""Headline benchmark: batched MPC+TSID cascade throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

What is counted (BASELINE.md measurement protocol): one "cascade solve" is one
full control tick of the cascade — a WBC (TSID) QP solve + plant step plus its
amortized share of the 50 Hz centroidal MPC QP (1/20th of a 100-iteration
adaptive-rho ADMM solve, including QP construction and footstep planning).
Throughput = scenarios x periods x mpc_every / wall_time, measured on device
with DIFFERENTIAL timing (an N-period and a 1-period program; the difference
cancels dispatch/transfer overhead — necessary because this environment's
remote-TPU tunnel makes per-call timing meaningless and block_until_ready a
no-op).

vs_baseline: the reference publishes no numbers (BASELINE.json:13); the
contract target is >=10,000 solves/s on a v5e-8, i.e. 1,250/chip
(BASELINE.json:5).  vs_baseline = value / 1250.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from mpctsid_tpu.cascade import CascadeConfigured, cascade_rollout, \
        init_controller
    from mpctsid_tpu.config import EngineConfig
    from mpctsid_tpu.env.plant import ContactParams, PlantState
    from mpctsid_tpu.model.gaits import GAIT_IDS
    from mpctsid_tpu.model.solo12 import SOLO12

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    B = 1024 if on_tpu else 16
    PERIODS = 5

    model = SOLO12
    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    cc = CascadeConfigured(model, cfg)
    q0 = np.zeros(19, np.float32)
    q0[2] = model.h_ref
    q0[6] = 1.0
    q0[7:] = model.q_stand
    q0 = jnp.asarray(q0)
    gid = jnp.int32(GAIT_IDS["trot"])
    ctl = init_controller(model, cfg, cc.tree, q0, gid)
    plant = PlantState.init(q0)

    rep = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    ctl_b = jax.tree_util.tree_map(rep, ctl)
    plant_b = jax.tree_util.tree_map(rep, plant)
    gid_b = jnp.full((B,), gid, jnp.int32)
    # spread of velocity commands so scenarios are not redundant
    rng = np.random.default_rng(0)
    vc_b = jnp.asarray(
        np.stack([rng.uniform(-0.4, 0.4, B), rng.uniform(-0.15, 0.15, B),
                  rng.uniform(-0.4, 0.4, B)], -1).astype(np.float32))
    cp_b = jax.tree_util.tree_map(rep, ContactParams.default())

    def rollout(n, ctl_b, plant_b):
        f = jax.vmap(functools.partial(cascade_rollout, cc, n_periods=n))
        ctl2, plant2, metrics = f(ctl_b, plant_b, gid_b, vc_b, cp_b)
        # reduce to a scalar so timing includes execution, not D2H volume
        return metrics["x_srb"].sum()

    run_1 = jax.jit(functools.partial(rollout, 1))
    run_n = jax.jit(functools.partial(rollout, PERIODS))

    # compile + warm both programs
    float(np.asarray(run_1(ctl_b, plant_b)))
    float(np.asarray(run_n(ctl_b, plant_b)))

    t0 = time.time()
    float(np.asarray(run_1(ctl_b, plant_b)))
    t1 = time.time() - t0
    t0 = time.time()
    float(np.asarray(run_n(ctl_b, plant_b)))
    tn = time.time() - t0
    per_period = max((tn - t1) / (PERIODS - 1), 1e-9)

    ticks_per_s = B * cfg.cascade.mpc_every / per_period
    target_per_chip = 10000.0 / 8.0
    print(json.dumps({
        "metric": "cascade MPC+TSID control ticks/s per chip "
                  f"(B={B}, trot, incl. MPC QP + WBC QP + plant)",
        "value": round(ticks_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(ticks_per_s / target_per_chip, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
