import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from mpctsid_tpu.qp.admm import admm_solve, ruiz_equilibrate, INF
d = np.load("/tmp/wbc_bad.npz")
H, g, A, l, u = d["H"], d["g"], d["A"], d["l"], d["u"]
wx, wy = d["wx"], d["wy"]
print("n,m:", H.shape, A.shape)
print("cond(H):", np.linalg.cond(H))
print("H diag range:", H.diagonal().min(), H.diagonal().max())
print("|A| max:", np.abs(A).max(), "rows l==u:", np.sum((u-l)<1e-9))
sol64 = admm_solve(jnp.asarray(H), jnp.asarray(g), jnp.asarray(A), jnp.asarray(l), jnp.asarray(u),
                   x0=jnp.asarray(wx), y0=jnp.asarray(wy), iters=60, adapt_rounds=3, rho=0.1)
c32 = lambda a: jnp.asarray(a, jnp.float32)
for mode in ["blockinv", "exact_inv", "chol"]:
    for pol in [False, True]:
        s = admm_solve(c32(H), c32(g), c32(A), c32(l), c32(u), x0=c32(wx), y0=c32(wy),
                       iters=60, adapt_rounds=3, rho=0.1, mode=mode, polish_kkt=pol)
        e = float(jnp.max(jnp.abs(sol64.x - s.x.astype(jnp.float64))))
        print(f"f32 {mode:10s} polish={pol}: err={e:9.2e} prim={float(s.prim_res):.2e} dual={float(s.dual_res):.2e}")
print("f64 prim/dual:", float(sol64.prim_res), float(sol64.dual_res))
# also: more iterations f32
s = admm_solve(c32(H), c32(g), c32(A), c32(l), c32(u), x0=c32(wx), y0=c32(wy),
               iters=300, adapt_rounds=6, rho=0.1, mode="exact_inv")
print("f32 exact 300it err:", float(jnp.max(jnp.abs(sol64.x - s.x.astype(jnp.float64)))))
# cold start f32
s = admm_solve(c32(H), c32(g), c32(A), c32(l), c32(u), iters=60, adapt_rounds=3, rho=0.1)
print("f32 cold err:", float(jnp.max(jnp.abs(sol64.x - s.x.astype(jnp.float64)))))
# is f64 solve itself converged? compare vs scipy
s2 = admm_solve(jnp.asarray(H), jnp.asarray(g), jnp.asarray(A), jnp.asarray(l), jnp.asarray(u),
                iters=2000, adapt_rounds=10, rho=0.1)
print("f64 60it vs f64 2000it:", float(jnp.max(jnp.abs(sol64.x - s2.x))))
