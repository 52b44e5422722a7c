"""Roofline: per-stage achieved FLOP/s and HBM bandwidth vs the v5e peaks
(VERDICT.md round-3 weak #6: "speed-of-light" was asserted, never
quantified).

FLOP/byte counts come from XLA's own cost model
(`compiled.cost_analysis()`); times are the bench.py differential scan-chain
protocol.  Pallas custom-calls are opaque to the XLA cost model, so the two
QP stages are counted through their backend="xla" lowering (identical math,
same operand traffic), while the full-period row times the production
(pallas_vpu) program against the xla-counted flops — stated in the output.

v5e peaks used: 197 TFLOP/s bf16 MXU (f32 runs at ~half of that), 819 GB/s
HBM.  A stage is called HBM-bound / MXU-bound by whichever fraction is
higher; both < 10% => launch/latency-bound.

Usage: python scripts/roofline.py [B]     (default 1024; also run 4096 to
find the batch knee)
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import build_batch, diff_time, _mpc_qp_batch  # noqa: E402

PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = PEAK_BF16_TFLOPS / 2.0
PEAK_HBM_GBS = 819.0


def cost_of(fn, *args):
    """(flops, hbm_bytes) per one call of fn(*args), from XLA's cost model.
    args are lowering ARGUMENTS (never closures — tunnel payload limit)."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    return flops, bytes_acc


def classify(tflops_s, gb_s):
    """NOTE on pct_hbm: XLA's "bytes accessed" sums operand+result bytes per
    op — an UPPER BOUND on physical HBM traffic (fusion keeps intermediates
    in registers/VMEM), so >100% means the stage reuses on-chip data faster
    than HBM could feed it, not that it beats the hardware."""
    pct_mxu = tflops_s / PEAK_F32_TFLOPS
    pct_hbm = gb_s / PEAK_HBM_GBS
    if max(pct_mxu, pct_hbm) < 0.10:
        bound = "launch/latency"
    elif pct_hbm >= 1.0:
        bound = "fused/on-chip"
    elif pct_hbm >= pct_mxu:
        bound = "HBM"
    else:
        bound = "MXU"
    return round(100 * pct_mxu, 1), round(100 * pct_hbm, 1), bound


def main(B=1024):
    from mpctsid_tpu.cascade import cascade_period
    from mpctsid_tpu.config import EngineConfig
    from mpctsid_tpu.env.plant import plant_step
    from mpctsid_tpu.qp.admm import admm_solve
    from mpctsid_tpu.wbc.tsid import WbcRefs, build_wbc_qp
    from mpctsid_tpu.plan.gait import contacts_at

    cfg = EngineConfig(gait="trot", v_ref=(0.3, 0.0, 0.0))
    cc, args = build_batch(cfg, B)
    ctl_b, plant_b, gid_b, vc_b, cp_b = args
    rows = {"B": B, "device": jax.devices()[0].device_kind,
            "peaks": {"f32_tflops": PEAK_F32_TFLOPS,
                      "bf16_tflops": PEAK_BF16_TFLOPS,
                      "hbm_gbs": PEAK_HBM_GBS}}

    def chain(step, batch, init, n):
        """Scan-chain n dependent applications of step(batch, carry).

        batch is passed as jit ARGUMENTS, never closed over: a closure
        constant of 1024 KKT matrices (~150 MB of HLO literals) exceeds the
        remote-compile tunnel's payload limit (HTTP 413)."""
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(batch, init, n):
            def body(c, _):
                return step(batch, c), ()
            c, _ = jax.lax.scan(body, init, None, length=n)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + x.sum(), c, 0.0)
        return lambda: run(batch, init, n=n)

    def cost_of_step(step, batch, init):
        return cost_of(lambda b, c: step(b, c), batch, init)

    def add(name, per_call_s, flops, bytes_acc, note=""):
        if per_call_s < 2e-4:
            # below the differential-timing noise floor; rates meaningless
            rows[name] = {"ms": round(per_call_s * 1e3, 3),
                          "gflop": round(flops / 1e9, 2),
                          "gbytes": round(bytes_acc / 1e9, 3),
                          "tflops_s": 0.0, "gb_s": 0.0,
                          "pct_mxu_f32": 0.0, "pct_hbm": 0.0,
                          "bound": "sub-noise"}
            print(f"  {name}: {rows[name]}", file=sys.stderr, flush=True)
            return
        tf = flops / per_call_s / 1e12
        gb = bytes_acc / per_call_s / 1e9
        pm, ph, bound = classify(tf, gb)
        rows[name] = {
            "ms": round(per_call_s * 1e3, 2),
            "gflop": round(flops / 1e9, 2),
            "gbytes": round(bytes_acc / 1e9, 3),
            "tflops_s": round(tf, 2), "gb_s": round(gb, 1),
            "pct_mxu_f32": pm, "pct_hbm": ph, "bound": bound,
        }
        if note:
            rows[name]["note"] = note
        print(f"  {name}: {rows[name]}", file=sys.stderr, flush=True)

    # ---- MPC QP solve (xla-counted; also times the pallas_vpu production
    # backend against the same flop count) --------------------------------
    mpc_batch = _mpc_qp_batch(cc, args)

    def mpc_solve(backend):
        def step(batch, carry):
            x, y = carry
            sol = jax.vmap(lambda P, q, A, l, u, x0, y0: admm_solve(
                P, q + 1e-7 * x0.mean(), A, l, u, x0=x0, y0=y0,
                iters=cfg.solver.mpc_iters,
                adapt_rounds=cfg.solver.mpc_adapt_rounds,
                rho=0.1, backend=backend))(
                    *batch, x, y)
            return (sol.x, sol.y)
        return step

    init = (jnp.zeros_like(mpc_batch[1]), jnp.zeros_like(mpc_batch[3]))
    fl, by = cost_of_step(mpc_solve("xla"), mpc_batch, init)
    for backend in ("xla", "pallas_vpu", "pallas_m2"):
        t = diff_time(
            lambda n, b=backend: chain(mpc_solve(b), mpc_batch, init, n),
            1, 4, reps=3)
        add(f"mpc_solve_{backend}", t, fl, by,
            note="" if backend == "xla"
            else "flops/bytes counted from the xla lowering")

    # ---- WBC QP stage ----------------------------------------------------
    def wbc_qp_one(q, v, gid):
        contacts = contacts_at(gid, jnp.int32(0)).astype(q.dtype)
        refs = WbcRefs(
            contacts=contacts,
            f_mpc=jnp.zeros((4, 3), q.dtype).at[:, 2].set(
                cc.model.total_mass * cc.model.g / 2.0 * contacts),
            foot_pos_ref=jnp.zeros((4, 3), q.dtype),
            foot_vel_ref=jnp.zeros((4, 3), q.dtype),
            foot_acc_ref=jnp.zeros((4, 3), q.dtype),
            q_posture=jnp.asarray(cc.model.q_stand, q.dtype),
            base_rpy_ref=jnp.zeros(2, q.dtype),
            h_ref=jnp.asarray(cc.model.h_ref, q.dtype))
        H, g, A, l, u, _, _, _ = build_wbc_qp(cc.tree, cfg.wbc, q, v, refs)
        return H, g, A, l, u

    wbc_batch = jax.jit(jax.vmap(wbc_qp_one))(plant_b.q, plant_b.v, gid_b)

    def wbc_solve(batch, carry):
        x, y = carry
        sol = jax.vmap(lambda P, q, A, l, u, x0, y0: admm_solve(
            P, q + 1e-7 * x0.mean(), A, l, u, x0=x0, y0=y0,
            iters=cfg.solver.wbc_iters,
            adapt_rounds=cfg.solver.wbc_adapt_rounds,
            rho=0.1, status_tol=0.5,
            backend="xla"))(*batch, x, y)
        return (sol.x, sol.y)

    initw = (jnp.zeros_like(wbc_batch[1]), jnp.zeros_like(wbc_batch[3]))
    fl, by = cost_of_step(wbc_solve, wbc_batch, initw)
    t = diff_time(lambda n: chain(wbc_solve, wbc_batch, initw, n), 1, 4,
                  reps=3)
    add("wbc_solve_xla", t, fl, by)

    # ---- WBC assembly (rigid-body dynamics) ------------------------------
    def wbc_build_step(batch, qs):
        vs, gids = batch
        outs = jax.vmap(wbc_qp_one)(qs, vs, gids)
        return qs + 1e-9 * outs[1][:, :19]

    bb = (plant_b.v, gid_b)
    fl, by = cost_of_step(wbc_build_step, bb, plant_b.q)
    t = diff_time(lambda n: chain(wbc_build_step, bb, plant_b.q, n), 1, 6,
                  reps=3)
    add("wbc_build", t, fl, by)

    # ---- plant step ------------------------------------------------------
    tau0 = jnp.zeros((B, 12), jnp.float32)

    def plant_chain_step(batch, st):
        tau, cp = batch
        st2, _ = jax.vmap(lambda s, t, p: plant_step(
            cc.tree, s, t, dt=cfg.cascade.wbc_dt, params=p))(st, tau, cp)
        return st2

    pb = (tau0, cp_b)
    fl, by = cost_of_step(plant_chain_step, pb, plant_b)
    t = diff_time(lambda n: chain(plant_chain_step, pb, plant_b, n), 1, 11,
                  reps=3)
    add("plant_step", t, fl, by)

    # ---- full period (production backends) -------------------------------
    def period_step(batch, carry):
        gids, vcs, cps = batch
        ctl, plant = carry
        ctl, plant, _, _ = jax.vmap(functools.partial(cascade_period, cc))(
            ctl, plant, gids, vcs, cps)
        return (ctl, plant)

    fb = (gid_b, vc_b, cp_b)
    fl, by = cost_of_step(period_step, fb, (ctl_b, plant_b))
    t = diff_time(lambda n: chain(period_step, fb, (ctl_b, plant_b), n),
                  1, 4, reps=3)
    add("full_period", t, fl, by,
        note="production backends; pallas kernel flops opaque to the cost "
             "model, so MXU% is a lower bound")

    print(json.dumps(rows))

    # merge into ROOFLINE.json (keyed by batch size) so bench.py --full's
    # write_results can render the roofline section of RESULTS.md
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    try:
        with open(path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged[str(B)] = rows
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
