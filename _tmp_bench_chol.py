import time, jax, jax.numpy as jnp, numpy as np
from mpctsid_tpu.qp.blockinv import spd_inverse_chol, spd_inverse_sorted
from mpctsid_tpu.utils import f32_matmuls

def mk(n, B, cond):
    k = jax.random.PRNGKey(0)
    Q, _ = jnp.linalg.qr(jax.random.normal(k, (B, n, n), dtype=jnp.float64 if False else jnp.float32))
    d = jnp.logspace(0, np.log10(cond), n).astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        K = jnp.einsum('bij,j,bkj->bik', Q, d, Q)
    return np.asarray(K), K

def bench(f, Ks, iters=10):
    np.asarray(f(Ks))  # warmup incl. compile, forced D2H
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(Ks)
    np.asarray(r)
    return (time.perf_counter() - t0) / iters * 1e3

for n, B in [(30, 1024), (192, 1024)]:
    _, Ks = mk(n, B, 1e4)
    fc = jax.jit(f32_matmuls(jax.vmap(lambda K: spd_inverse_chol(K, ns_steps=1))))
    fs = jax.jit(f32_matmuls(jax.vmap(lambda K: spd_inverse_sorted(K, ns_steps=2))))
    fl = jax.jit(f32_matmuls(jax.vmap(jnp.linalg.inv)))
    eye = jnp.eye(n)
    res_f = jax.jit(f32_matmuls(lambda X: jnp.max(jnp.abs(eye - jnp.einsum('bij,bjk->bik', Ks, X)))))
    for name, f in [("chol_ns1", fc), ("sorted_ns2", fs), ("lu", fl)]:
        ms = bench(f, Ks)
        r = float(np.asarray(res_f(f(Ks))))
        print(f"n={n:4d} B={B} {name:11s} {ms:7.2f} ms  res={r:.2e}")
