"""Plant interface protocol (SURVEY.md §2.1 "Real-robot interface" / §7.4).

Real-robot masterboard I/O is out of scope (no hardware in this environment),
but the reference keeps a thin plant abstraction so the same controller drives
either PyBullet or the robot.  This protocol is that slot: the simulated JAX
plant (env/plant.py, via `SimPlant`) and a future hardware bridge share it.

The protocol is deliberately host-side and imperative — a real robot is a
stateful 1 kHz device, not a pure function — while the simulated
implementation simply wraps the functional `plant_step`.  Batched/device-side
rollouts (cascade/engine.py) bypass it and call `plant_step` directly; the
protocol exists for single-robot host-loop deployment
(`python -m mpctsid_tpu.run` style) and hardware bring-up.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp

from mpctsid_tpu.env.plant import ContactParams, PlantState, plant_step
from mpctsid_tpu.model.tree import KinematicTree


@dataclasses.dataclass
class Sensors:
    """What one control tick may read (reference: IMU + joint encoders)."""

    q: jnp.ndarray        # (19,) base pose + joint positions
    v: jnp.ndarray        # (18,) base twist + joint velocities
    gyro: jnp.ndarray     # (3,) base angular velocity, body frame
    accel: jnp.ndarray    # (3,) specific force, body frame
    q_joints: jnp.ndarray   # (12,)
    qd_joints: jnp.ndarray  # (12,)


# Module-level jit cache keyed on (id(tree), dt): constructing many SimPlants
# over the same tree (MC sweeps, tests) must not recompile plant_step/imu per
# instance (ADVICE.md round 2).  The entry holds a strong ref to the tree so
# its id can never be recycled while the cache entry lives.
_JIT_CACHE: dict = {}


def _jitted_for(tree: KinematicTree, dt: float):
    from mpctsid_tpu.est.filter import imu_from_plant
    key = (id(tree), float(dt))
    hit = _JIT_CACHE.get(key)
    if hit is None or hit[0] is not tree:
        hit = (tree,
               jax.jit(functools.partial(plant_step, tree, dt=dt)),
               jax.jit(functools.partial(imu_from_plant, tree)))
        _JIT_CACHE[key] = hit
    return hit[1], hit[2]


@runtime_checkable
class Plant(Protocol):
    """One robot (or one simulated robot) driven at the WBC rate.

    read() returns the latest sensor snapshot; apply(tau) commands the next
    joint torques and advances the plant by one WBC tick (1 ms)."""

    def read(self) -> Sensors: ...

    def apply(self, tau: jnp.ndarray) -> None: ...


class SimPlant:
    """`Plant` implementation backed by the functional JAX plant."""

    def __init__(self, tree: KinematicTree, q0: jnp.ndarray,
                 params: ContactParams | None = None, dt: float = 1e-3):
        self.tree = tree
        self.state = PlantState.init(q0)
        self.params = params or ContactParams.default()
        self.dt = dt
        # jit once PER (tree, dt), not per instance: a host loop calling these
        # eagerly pays per-op dispatch (~300 ms/tick on CPU) instead of one
        # compiled program (~1 ms), and bulk construction shares the cache
        self._step, self._imu = _jitted_for(tree, dt)

    def read(self) -> Sensors:
        q, v = self.state.q, self.state.v
        gyro, accel = self._imu(q, v)
        return Sensors(q=q, v=v, gyro=gyro, accel=accel,
                       q_joints=q[7:], qd_joints=v[6:])

    def apply(self, tau: jnp.ndarray) -> None:
        self.state, _ = self._step(self.state, tau, params=self.params)
