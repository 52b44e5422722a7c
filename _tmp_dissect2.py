import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from mpctsid_tpu.qp.admm import ruiz_equilibrate, INF
from mpctsid_tpu.qp.blockinv import spd_inverse_chol, chol_blocked, tri_lower_inverse
d = np.load("/tmp/wbc_bad.npz")
H, g, A, l, u = [jnp.asarray(d[k], jnp.float32) for k in ["H","g","A","l","u"]]
Pb, qb, Ab, lb, ub, D, E, c = ruiz_equilibrate(H, g, A, l, u, 8)
print("equilibrated: cond(Pb)=%.2e |Ab|max=%.2f" % (np.linalg.cond(np.asarray(Pb,np.float64)), np.abs(Ab).max()))
eq = (np.asarray(ub)-np.asarray(lb)) < 1e-9  # NOTE admm uses u0-l0 (unscaled)
eq0 = (d["u"]-d["l"]) < 1e-9
sigma=1e-6
for rho in [0.1, 1.0, 10.0]:
    rho_vec = (1.0 + eq0.astype(np.float32)*(1e3-1.0))*rho
    K = Pb + sigma*jnp.eye(30, dtype=jnp.float32) + (Ab.T * rho_vec) @ Ab
    K64 = np.asarray(K, np.float64)
    print(f"rho={rho}: cond(K)={np.linalg.cond(K64):.2e} diag[{K64.diagonal().min():.2e},{K64.diagonal().max():.2e}]")
    for ns in [0, 1, 2]:
        X = spd_inverse_chol(K, ns_steps=ns)
        r = np.abs(np.eye(30) - K64 @ np.asarray(X, np.float64)).max()
        print(f"  spd_inverse_chol ns={ns}: |I-KX|max={r:.2e}")
    Xlu = jnp.linalg.inv(K)
    print(f"  jnp LU inv: {np.abs(np.eye(30)-K64@np.asarray(Xlu,np.float64)).max():.2e}")
    # true f64 inverse of the f32 K
    print(f"  f64 inv of same K: {np.abs(np.eye(30)-K64@np.linalg.inv(K64)).max():.2e}")
