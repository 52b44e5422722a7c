"""Probe: compile the fused-kernel building blocks on real Mosaic, piecewise.

Each case in a fresh subprocess (SIGABRT isolation).  Narrows down WHICH part
of _admm_fused_kernel breaks the compile: _bchol alone, _btri alone,
_bspd_inverse_chol, or the full fused kernel, at WBC (n=30/32) and MPC
(n=192) sizes.
"""
import subprocess
import sys
import textwrap

CASE = textwrap.dedent("""
import jax, jax.numpy as jnp, functools, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mpctsid_tpu.qp.pallas_kernels import _bchol, _btri_lower_inverse, _bspd_inverse_chol

G, N = 2, %d
WHAT = %r

def kern(a_ref, o_ref):
    a = a_ref[:]
    if WHAT == "bchol":
        o_ref[:] = _bchol(a)
    elif WHAT == "btri":
        o_ref[:] = _btri_lower_inverse(a)
    elif WHAT == "spdinv":
        eye = jnp.broadcast_to(jnp.eye(N, dtype=a.dtype), a.shape)
        o_ref[:] = _bspd_inverse_chol(a, eye)

r = np.random.default_rng(0)
Q = r.normal(size=(G, N, N)).astype(np.float32)
K = np.einsum('gij,gkj->gik', Q, Q) / N + 0.1 * np.eye(N, dtype=np.float32)
if WHAT == "btri":
    K = np.linalg.cholesky(K)
out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((G, N, N), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(jnp.asarray(K))
res = np.asarray(out)
assert np.all(np.isfinite(res))
if WHAT == "spdinv":
    err = np.abs(np.einsum('gij,gjk->gik', K, res) - np.eye(N)).max()
    assert err < 1e-2, err
print("OK")
""")

cases = [
    ("btri", 32), ("bchol", 32), ("spdinv", 32),
    ("btri", 30), ("bchol", 30), ("spdinv", 30),
    ("btri", 192), ("bchol", 192), ("spdinv", 192),
]

for what, n in cases:
    r = subprocess.run([sys.executable, "-c", CASE % (n, what)],
                       capture_output=True, text=True, timeout=900,
                       cwd="/root/repo")
    if r.returncode == 0 and "OK" in r.stdout:
        status = "OK"
    else:
        last = r.stderr.strip().splitlines()[-1][:160] if r.stderr.strip() else ""
        status = f"FAIL rc={r.returncode} {last}"
    print(f"{what:7s} n={n:4d}: {status}", flush=True)
