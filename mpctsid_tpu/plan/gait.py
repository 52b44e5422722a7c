"""JAX gait scheduling: periodic contact tables + precomputed swing-phase data.

The oracle's GaitScheduler (oracle/planner.py) walks the contact table backward/
forward to find swing lift-off and touchdown — data-dependent loops.  Here every
such quantity is PRECOMPUTED at trace time into constant lookup tables indexed
by (gait_id, phase, leg), so on device a gait roll is an integer increment and
every query is a single gather.  Batches mix gaits freely via per-scenario
gait_id (BASELINE.json:8 "gait sweep ... varying footstep plans").
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from mpctsid_tpu.model.gaits import GAIT_PERIOD, gait_tables

TABLES = gait_tables()  # (4, 16, 4) numpy constant


def _swing_tables_np():
    """Constant (4,16,4) arrays: steps since lift-off (back), steps until
    touchdown (fwd), swing duration (dur, in MPC steps; 0 in stance)."""
    n_g = TABLES.shape[0]
    back = np.zeros((n_g, GAIT_PERIOD, 4))
    fwd = np.zeros((n_g, GAIT_PERIOD, 4))
    dur = np.zeros((n_g, GAIT_PERIOD, 4))
    for g in range(n_g):
        for ph in range(GAIT_PERIOD):
            for leg in range(4):
                col = TABLES[g, :, leg]
                if col[ph] > 0.5:
                    continue
                b = 0
                while col[(ph - b - 1) % GAIT_PERIOD] < 0.5 and b < GAIT_PERIOD:
                    b += 1
                f = 0
                while col[(ph + f + 1) % GAIT_PERIOD] < 0.5 and f < GAIT_PERIOD:
                    f += 1
                back[g, ph, leg] = b
                fwd[g, ph, leg] = f
                dur[g, ph, leg] = b + f + 1
    return back, fwd, dur


_BACK_NP, _FWD_NP, _DUR_NP = _swing_tables_np()


def _stance_duration_np():
    return TABLES.sum(axis=1)  # (4 gaits, 4 legs)


_STANCE_STEPS_NP = _stance_duration_np()


def contacts_at(gait_id, phase):
    """(4,) stance flags for one scenario at an integer phase."""
    t = jnp.asarray(TABLES)
    return t[gait_id, phase % GAIT_PERIOD]


def contacts_horizon(gait_id, phase, n: int):
    """(n,4) contact schedule for MPC steps [phase, phase+n)."""
    t = jnp.asarray(TABLES)[gait_id]
    idx = (phase + jnp.arange(n)) % GAIT_PERIOD
    return t[idx]


def swing_tables(gait_id, phase):
    """(back(4,), fwd(4,), dur(4,), stance_steps(4,)) for one scenario."""
    ph = phase % GAIT_PERIOD
    back = jnp.asarray(_BACK_NP)[gait_id, ph]
    fwd = jnp.asarray(_FWD_NP)[gait_id, ph]
    dur = jnp.asarray(_DUR_NP)[gait_id, ph]
    stance = jnp.asarray(_STANCE_STEPS_NP)[gait_id]
    return back, fwd, dur, stance
