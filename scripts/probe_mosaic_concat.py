"""Probe: which block-assembly patterns does Mosaic TC compile?

Round-3 finding: odd-offset (h=15, h=3...) axis-1/axis-2 concats in the
recursive blocked Cholesky SIGABRT the Mosaic compiler through the remote
compile tunnel.  Round-4 question: do 8-aligned (sublane-aligned, but NOT
128/lane-aligned) offsets compile?  Run each case in a fresh subprocess so a
SIGABRT doesn't kill the probe.
"""
import subprocess
import sys
import textwrap

CASE = textwrap.dedent("""
import jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, N, H = 4, %d, %d
AXIS = %d

def kern(a_ref, o_ref):
    a = a_ref[:]
    if AXIS == 1:
        top = a[:, :H, :]
        bot = a[:, H:, :]
        o_ref[:] = jnp.concatenate([bot, top], axis=1)
    else:
        lft = a[:, :, :H]
        rgt = a[:, :, H:]
        o_ref[:] = jnp.concatenate([rgt, lft], axis=2)

x = jnp.arange(G * N * N, dtype=jnp.float32).reshape(G, N, N)
out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((G, N, N), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x)
import numpy as np
ref = (np.concatenate([x[:, H:, :], x[:, :H, :]], axis=1) if AXIS == 1
       else np.concatenate([x[:, :, H:], x[:, :, :H]], axis=2))
assert np.array_equal(np.asarray(out), ref)
print("OK")
""")

cases = [
    (32, 16, 1), (32, 16, 2),   # 16-offset on 32
    (32, 8, 1), (32, 8, 2),     # 8-offset
    (24, 8, 1), (24, 8, 2),     # non-pow2 total, 8-aligned
    (192, 96, 1), (192, 96, 2),  # MPC sizes
    (192, 64, 2),                # 64-offset lane concat
    (32, 15, 2),                 # known-bad control (odd offset)
]

for n, h, axis in cases:
    r = subprocess.run([sys.executable, "-c", CASE % (n, h, axis)],
                       capture_output=True, text=True, timeout=600)
    status = "OK" if r.returncode == 0 and "OK" in r.stdout else \
        f"FAIL rc={r.returncode} {r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else ''}"
    print(f"n={n:4d} h={h:3d} axis={axis}: {status}", flush=True)
