"""A/B the cascade's QP backends on the real chip.

Times the full B=1024 trot cascade (bench.py's headline measurement) for each
(mpc_backend, wbc_backend) combo and prints one JSON line per combo with
ticks/s + the upright-fraction guard.  Used to decide the `auto` resolution in
cascade/engine.py (round-3 fused-kernel evaluation)."""

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from bench import build_batch, diff_time  # noqa: E402


def measure(cc, args, periods=5, reps=3, **solver_kw):
    from mpctsid_tpu.cascade import cascade_rollout

    ctl_b, plant_b, gid_b, vc_b, cp_b = args
    B = int(gid_b.shape[0])
    mpc_every = cc.cfg.cascade.mpc_every

    def make_run(n):
        f = jax.jit(jax.vmap(functools.partial(
            cascade_rollout, cc, n_periods=n, **solver_kw)))
        return lambda: f(ctl_b, plant_b, gid_b, vc_b, cp_b)[2]["x_srb"].sum()

    per_period = max(diff_time(make_run, 1, periods + 1, reps), 1e-9)
    f = jax.jit(jax.vmap(functools.partial(
        cascade_rollout, cc, n_periods=periods + 1, **solver_kw)))
    _, _, metrics = f(ctl_b, plant_b, gid_b, vc_b, cp_b)
    x = np.asarray(metrics["x_srb"])
    return {
        "ticks_per_s": round(B * mpc_every / per_period, 1),
        "upright_frac": round(float((x[:, -1, 2] > 0.15).mean()), 4),
        "mpc_fail_frac": round(
            float((~np.asarray(metrics["mpc_ok"])).mean()), 4),
    }


def main():
    from mpctsid_tpu.config import EngineConfig

    combos = [
        {"mpc_backend": "pallas_vpu", "wbc_backend": "xla"},   # current auto
        {"mpc_backend": "pallas_vpu", "wbc_backend": "fused"},
        {"mpc_backend": "fused", "wbc_backend": "xla"},
        {"mpc_backend": "fused", "wbc_backend": "fused"},
    ]
    if len(sys.argv) > 1:   # e.g. "fused:fused" to run one combo
        m, w = sys.argv[1].split(":")
        combos = [{"mpc_backend": m, "wbc_backend": w}]

    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    B = 1024 if any(d.platform == "tpu" for d in jax.devices()) else 16
    cc, args = build_batch(cfg, B)
    for kw in combos:
        try:
            r = measure(cc, args, **kw)
        except Exception as e:  # noqa: BLE001
            r = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({**kw, **r}), flush=True)


if __name__ == "__main__":
    main()
