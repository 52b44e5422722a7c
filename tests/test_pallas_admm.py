"""Pallas ADMM iteration kernel vs the XLA reference path (VERDICT.md round-1
weak #3: the kernel had zero test coverage).

The kernel implements EXACTLY the run_block update of qp/admm.py; the paths
must agree to f32 reduction-order noise.  Interpret mode runs in-suite on the
forced-CPU platform; the real-hardware parity check runs the same comparison
in a subprocess that is allowed to see the TPU (the suite's conftest pins
this process to CPU before jax initializes).
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpctsid_tpu.qp.admm import admm_solve

F32 = jnp.float32


def random_qp(seed, n=24, m=40, eq=True):
    r = np.random.default_rng(seed)
    Q = r.normal(size=(n, n))
    P = Q @ Q.T / n + 0.1 * np.eye(n)
    q = r.normal(size=n)
    A = r.normal(size=(m, n))
    x_feas = r.normal(size=n) * 0.1
    margin = np.abs(r.normal(size=m)) + 0.1
    l = A @ x_feas - margin
    u = A @ x_feas + margin
    if eq:
        # a few equality rows exercise the rho boost
        l[:4] = u[:4] = (A @ x_feas)[:4]
    return [jnp.asarray(a, F32) for a in (P, q, A, l, u)]


def _qp_for(backend, seed, **kw):
    """pallas_m2 is the MPC-stage backend and is specified for
    INEQUALITY-ONLY QPs: the 1e3 equality-rho boost pushes cond(K) to ~1e4,
    where explicitly forming M2 = 2X - XKX loses the refinement accuracy
    that the sequential residual form keeps (measured: 1e-3 drift with eq
    rows, 1e-6 without; see qp/admm.py backend docs).  The MPC QP has no
    equality rows (friction pyramid + force bounds only)."""
    return random_qp(seed, eq=(backend != "pallas_m2"), **kw)


@pytest.mark.parametrize("backend",
                         ["pallas", "pallas_vpu", "pallas_packed",
                          "pallas_m2", "fused"])
@pytest.mark.parametrize("seed", range(3))
def test_pallas_interpret_matches_xla(seed, backend):
    P, q, A, l, u = _qp_for(backend, seed)
    kw = dict(iters=60, adapt_rounds=2, rho=0.1)
    s_x = admm_solve(P, q, A, l, u, backend="xla", **kw)
    s_p = admm_solve(P, q, A, l, u, backend=backend,
                     backend_interpret=True, **kw)
    # the two backends run the same update with different matmul reduction
    # orders; 60 f32 iterations of a fixed-point method drift ~1e-4
    np.testing.assert_allclose(np.asarray(s_p.x), np.asarray(s_x.x),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_p.y), np.asarray(s_x.y),
                               atol=1e-2)


@pytest.mark.parametrize("seed", range(2))
def test_fused_pads_non_multiple_of_8(seed):
    """WBC-sized QPs (n=30) exercise the fused front-end's n->32 padding
    (identity-diagonal rows; see admm_solve_fused_batch).  The padded solve
    must match XLA on the unpadded problem."""
    P, q, A, l, u = random_qp(seed, n=30, m=50)
    kw = dict(iters=60, adapt_rounds=2, rho=0.1)
    s_x = admm_solve(P, q, A, l, u, backend="xla", **kw)
    s_p = admm_solve(P, q, A, l, u, backend="fused",
                     backend_interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(s_p.x), np.asarray(s_x.x),
                               atol=1e-3)


@pytest.mark.parametrize("backend", ["pallas", "pallas_packed", "pallas_m2",
                                     "fused"])
def test_pallas_interpret_matches_xla_batched(backend):
    # pallas_packed/pallas_m2/fused go through custom_vmap (G-packed grid);
    # the batched path is a different lowering than the unbatched one
    qps = [_qp_for(backend, s) for s in range(4)]
    Ps, qs, As, ls, us = [jnp.stack([qp[i] for qp in qps]) for i in range(5)]
    kw = dict(iters=60, adapt_rounds=2, rho=0.1)
    s_x = jax.vmap(lambda *a: admm_solve(*a, backend="xla", **kw))(
        Ps, qs, As, ls, us)
    s_p = jax.vmap(lambda *a: admm_solve(*a, backend=backend,
                                         backend_interpret=True, **kw))(
        Ps, qs, As, ls, us)
    np.testing.assert_allclose(np.asarray(s_p.x), np.asarray(s_x.x),
                               atol=1e-3)


_TPU_SCRIPT = textwrap.dedent("""
    import json
    import numpy as np
    import jax
    import jax.numpy as jnp
    import sys
    sys.path.insert(0, %r)
    from tests.test_pallas_admm import random_qp
    from mpctsid_tpu.qp.admm import admm_solve

    assert any(d.platform == "tpu" for d in jax.devices()), jax.devices()
    # prove the device actually executes before any kernel work: failures
    # after this sentinel are REAL regressions (e.g. a Mosaic SIGABRT through
    # the remote-compile tunnel), never "no TPU" skips
    assert float(jnp.ones((8, 128)).sum()) == 1024.0
    print("TPU_READY", flush=True)
    kw = dict(iters=60, adapt_rounds=2, rho=0.1)
    worst = 0.0
    scale = 0.0
    for eq in (True, False):
        qps = [random_qp(s, eq=eq) for s in range(8)]
        Ps, qs, As, ls, us = [jnp.stack([qp[i] for qp in qps])
                              for i in range(5)]
        s_x = jax.jit(jax.vmap(lambda *a: admm_solve(*a, backend="xla",
                                                     **kw)))(
            Ps, qs, As, ls, us)
        # pallas_m2 is specified for inequality-only QPs (see _qp_for)
        backends = (("pallas_m2",) if not eq else
                    ("pallas", "pallas_vpu", "pallas_packed", "fused"))
        for backend in backends:
            s_p = jax.jit(jax.vmap(lambda *a: admm_solve(*a, backend=backend,
                                                         **kw)))(
                Ps, qs, As, ls, us)
            worst = max(worst, float(
                np.abs(np.asarray(s_p.x) - np.asarray(s_x.x)).max()))
        scale = max(scale, float(np.abs(np.asarray(s_x.x)).max()))
    print(json.dumps({"max_dx": worst, "scale": scale}))
""")


@pytest.mark.tpu
def test_pallas_tpu_matches_xla():
    """Real-Mosaic-lowering parity, run in a TPU-visible subprocess.

    Skip policy (VERDICT.md round-3 weak #2: the old stderr-grep heuristic
    could mask a Mosaic SIGABRT as "no TPU"): the subprocess prints TPU_READY
    only after jax.devices() shows a TPU AND a trivial device computation
    returned the right answer.  A nonzero exit BEFORE the sentinel is an
    environment skip; any failure AFTER it — including a tpu_compile_helper
    SIGABRT on a kernel lowering — fails the suite."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    # the remote-TPU Mosaic compile of the kernel can take ~20 min cold; the
    # persistent compilation cache (set below) makes reruns seconds
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    r = subprocess.run([sys.executable, "-c", _TPU_SCRIPT % root],
                       capture_output=True, text=True, timeout=1800, env=env)
    if r.returncode != 0 and "TPU_READY" not in r.stdout:
        pytest.skip(f"no TPU reachable: {r.stderr[-200:]}")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["max_dx"] < 1e-3 * max(out["scale"], 1.0), out
