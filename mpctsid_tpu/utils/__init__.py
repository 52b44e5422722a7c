"""Shared utilities: XLA/TPU precision policy.

TPU MXUs run f32 `dot_general` at bfloat16 precision by DEFAULT (one MXU
pass).  For this engine that is not a tuning knob but a correctness cliff:
the QP core's Newton-Schulz inverse, the ADMM fixed point, and the leg-odometry
Jacobian products all assume f32 products, and under bf16 the estimator-in-
the-loop cascade was observed to diverge to NaN on-device while the identical
program is stable on CPU (where DEFAULT already means f32).

`f32_matmuls` pins matmul precision to full f32 (HIGHEST: the MXU's f32
multi-pass mode) for everything traced inside the wrapped function.  It is
applied to every public jitted entry point of the engine — the contract
(BASELINE.json:5, <1e-4 control error vs the CPU oracle) must hold on the
hardware the bench runs on, not just in CPU tests.  Throughput is quoted with
this policy on.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["f32_matmuls"]


def f32_matmuls(fn):
    """Trace `fn` with full-f32 matmul precision (TPU: multi-pass MXU)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
