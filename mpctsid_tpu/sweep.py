"""Monte-Carlo scenario sweeps with checkpoint/resume (SURVEY.md §5.4;
VERDICT.md round-1 missing #4).

A sweep evaluates `total` scenarios — per-scenario gait, velocity command and
ground friction drawn deterministically from (seed, scenario_index) — in
device-batch chunks.  After every chunk the sweep state (scenario cursor +
seed + accumulated per-scenario metrics) is serialized via flax msgpack, so a
preempted sweep resumes from the cursor and produces BITWISE the results of an
uninterrupted run (tests/test_sweep.py).

CLI:
    python -m mpctsid_tpu.sweep --total 4096 --chunk 512 \
        --ckpt /tmp/sweep.msgpack --jsonl /tmp/sweep_results.jsonl

The reference has no counterpart (a control loop has no training state); this
is the new framework's Monte-Carlo robustness-evaluation harness
(BASELINE.json:9-11 perturbation batches / 32k+ scenario sweeps).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

METRIC_KEYS = ["final_z", "upright", "final_x", "vx_err",
               "max_mpc_res", "mpc_fail", "min_wbc_ok_frac"]


@dataclasses.dataclass
class SweepState:
    """Checkpointable sweep progress."""

    seed: int
    total: int
    cursor: int                    # scenarios completed
    n_periods: int
    metrics: dict                  # key -> np.ndarray (total,)

    def to_bytes(self) -> bytes:
        from flax import serialization
        return serialization.msgpack_serialize({
            "seed": self.seed, "total": self.total, "cursor": self.cursor,
            "n_periods": self.n_periods,
            "metrics": {k: np.asarray(v) for k, v in self.metrics.items()},
        })

    @classmethod
    def from_bytes(cls, data: bytes) -> "SweepState":
        from flax import serialization
        d = serialization.msgpack_restore(data)
        return cls(seed=int(d["seed"]), total=int(d["total"]),
                   cursor=int(d["cursor"]), n_periods=int(d["n_periods"]),
                   # np.array (copy): msgpack_restore yields read-only views
                   metrics={k: np.array(v)
                            for k, v in d["metrics"].items()})

    @classmethod
    def fresh(cls, seed: int, total: int, n_periods: int) -> "SweepState":
        return cls(seed=seed, total=total, cursor=0, n_periods=n_periods,
                   metrics={k: np.full(total, np.nan, np.float32)
                            for k in METRIC_KEYS})

    def save(self, path: str):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.to_bytes())
        os.replace(tmp, path)      # atomic: a crash never corrupts the ckpt

    @classmethod
    def load(cls, path: str) -> "SweepState":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())


def scenario_params(seed: int, idx: np.ndarray):
    """Deterministic per-scenario draws, independent of chunking.

    Each scenario's RNG is seeded by (seed, index), so chunk boundaries and
    resume points cannot change any scenario's parameters.  Draws cover the
    BASELINE.json:9-11 perturbation axes: gait, velocity command, friction,
    and payload mass (0-0.4 kg point mass at the base)."""
    from mpctsid_tpu.model.gaits import GAIT_IDS

    gaits = ["trot", "walk", "bound"]
    gids = np.empty(len(idx), np.int32)
    vcs = np.empty((len(idx), 3), np.float32)
    mus = np.empty(len(idx), np.float32)
    payloads = np.empty(len(idx), np.float32)
    for j, i in enumerate(idx):
        r = np.random.default_rng([seed, int(i)])
        g = gaits[int(r.integers(0, len(gaits)))]
        gids[j] = GAIT_IDS[g]
        vmax = 0.3 if g != "walk" else 0.2
        vcs[j] = [r.uniform(0.05, vmax), r.uniform(-0.05, 0.05),
                  r.uniform(-0.2, 0.2)]
        mus[j] = r.uniform(0.45, 1.0)
        payloads[j] = r.uniform(0.0, 0.4)
    return gids, vcs, mus, payloads


@functools.lru_cache(maxsize=4)
def _chunk_runner(chunk: int, n_periods: int):
    """jitted (gids, vcs, mus) -> per-scenario metric dict for one chunk."""
    from mpctsid_tpu.cascade import (CascadeConfigured, cascade_rollout,
                                     init_controller)
    from mpctsid_tpu.config import EngineConfig
    from mpctsid_tpu.env.plant import ContactParams, PlantState
    from mpctsid_tpu.model.solo12 import SOLO12

    model = SOLO12
    cfg = EngineConfig()
    cc = CascadeConfigured(model, cfg)
    q0 = np.zeros(19, np.float32)
    q0[2] = model.h_ref
    q0[6] = 1.0
    q0[7:] = model.q_stand
    q0 = jnp.asarray(q0)

    def one(gid, vc, mu, payload):
        ctl = init_controller(model, cfg, cc.tree, q0, gid, payload=payload)
        plant = PlantState.init(q0)
        cp = ContactParams.default()
        cp = dataclasses.replace(cp, mu=mu)
        ctl, plant, m = cascade_rollout(cc, ctl, plant, gid, vc, cp,
                                        n_periods=n_periods, payload=payload)
        x = m["x_srb"]
        return {
            "final_z": x[-1, 2],
            "upright": (x[:, 2] > 0.12).all().astype(jnp.float32),
            "final_x": x[-1, 0],
            "vx_err": jnp.abs(x[n_periods // 2:, 6].mean() - vc[0]),
            "max_mpc_res": m["mpc_prim_res"].max(),
            "mpc_fail": (~m["mpc_ok"]).sum().astype(jnp.float32),
            "min_wbc_ok_frac": m["wbc_ok_frac"].min(),
        }

    return jax.jit(jax.vmap(one))


def run_sweep(state: SweepState, chunk: int, ckpt_path: str | None = None,
              max_chunks: int | None = None, verbose: bool = True):
    """Advance the sweep until done (or max_chunks), checkpointing per chunk."""
    runner = _chunk_runner(chunk, state.n_periods)
    done_chunks = 0
    while state.cursor < state.total:
        if max_chunks is not None and done_chunks >= max_chunks:
            break
        lo = state.cursor
        hi = min(lo + chunk, state.total)
        idx = np.arange(lo, hi)
        gids, vcs, mus, payloads = scenario_params(state.seed, idx)
        # fixed-shape chunk: pad the tail by repeating the last scenario
        pad = chunk - len(idx)
        if pad:
            gids = np.concatenate([gids, np.repeat(gids[-1:], pad)])
            vcs = np.concatenate([vcs, np.repeat(vcs[-1:], pad, 0)])
            mus = np.concatenate([mus, np.repeat(mus[-1:], pad)])
            payloads = np.concatenate(
                [payloads, np.repeat(payloads[-1:], pad)])
        out = runner(jnp.asarray(gids), jnp.asarray(vcs), jnp.asarray(mus),
                     jnp.asarray(payloads))
        out = {k: np.asarray(v)[:len(idx)] for k, v in out.items()}
        for k in METRIC_KEYS:
            state.metrics[k][lo:hi] = out[k]
        state.cursor = hi
        done_chunks += 1
        if ckpt_path:
            state.save(ckpt_path)
        if verbose:
            up = np.nanmean(state.metrics["upright"][:state.cursor])
            print(f"  sweep {state.cursor}/{state.total} "
                  f"(upright so far {up:.3f})", file=sys.stderr)
    return state


def summarize(state: SweepState) -> dict:
    done = state.cursor
    m = {k: v[:done] for k, v in state.metrics.items()}
    return {
        "scenarios": int(done),
        "upright_frac": float(np.mean(m["upright"])) if done else 0.0,
        "mean_vx_err": float(np.mean(m["vx_err"])) if done else 0.0,
        "max_mpc_res": float(np.max(m["max_mpc_res"])) if done else 0.0,
        "mpc_fail_total": float(np.sum(m["mpc_fail"])) if done else 0.0,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--total", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--periods", type=int, default=25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default="/tmp/mpctsid_sweep.msgpack")
    p.add_argument("--jsonl", default=None,
                   help="write per-scenario results at the end")
    p.add_argument("--resume", action="store_true",
                   help="continue from --ckpt if it exists")
    p.add_argument("--cpu", action="store_true")
    a = p.parse_args(argv)

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")

    if a.resume and os.path.exists(a.ckpt):
        state = SweepState.load(a.ckpt)
        print(f"resuming at {state.cursor}/{state.total}", file=sys.stderr)
    else:
        state = SweepState.fresh(a.seed, a.total, a.periods)
    state = run_sweep(state, a.chunk, ckpt_path=a.ckpt)
    print(json.dumps(summarize(state)))

    if a.jsonl:
        with open(a.jsonl, "w") as f:
            for i in range(state.cursor):
                f.write(json.dumps(
                    {"scenario": i,
                     **{k: float(state.metrics[k][i])
                        for k in METRIC_KEYS}}) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
