"""On-chip cascade throughput A/B over solver budgets (round 5)."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np  # noqa: E402
import jax  # noqa: E402

from bench import build_batch, diff_time  # noqa: E402
from mpctsid_tpu.config import EngineConfig  # noqa: E402
from mpctsid_tpu.cascade import cascade_rollout  # noqa: E402

B = 1024
cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
cc, args = build_batch(cfg, B)


def run_at(mi, mr, wi, wr):
    def rollout_fn(n):
        return jax.jit(jax.vmap(functools.partial(
            cascade_rollout, cc, n_periods=n, mpc_iters=mi, mpc_rounds=mr,
            wbc_iters=wi, wbc_rounds=wr)))

    def make_run(n):
        f = rollout_fn(n)
        return lambda: f(*args)[2]["x_srb"].sum()

    per = diff_time(make_run, 1, 6, reps=3)
    tps = B * 20 / per
    m = rollout_fn(6)(*args)[2]
    x = np.asarray(m["x_srb"])
    print(f"mpc {mi}/{mr} wbc {wi}/{wr}: {tps:,.0f} ticks/s "
          f"upright={float((x[:, -1, 2] > 0.15).mean()):.3f} "
          f"dual={float(np.asarray(m['mpc_dual_res']).mean()):.2e} "
          f"wbc_ok={float(np.asarray(m['wbc_ok_frac']).mean()):.4f}",
          flush=True)


if __name__ == "__main__":
    for t in sys.argv[1:] or ["80,2,60,2", "60,2,60,2", "80,2,60,3"]:
        run_at(*[int(v) for v in t.split(",")])
