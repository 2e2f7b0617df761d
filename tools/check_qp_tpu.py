"""TPU-vs-reference check of the two-phase Newton-QP batch path."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax, jax.numpy as jnp
from smplsim_tpu.ops import qp_kernel as qk

B, K = 512, int(os.environ.get("SMPLSIM_QP_ROWS", 32))
rng = np.random.RandomState(0)
Y = rng.randn(B, K, K) * 0.5
A = jnp.asarray(Y @ np.swapaxes(Y, 1, 2) + np.eye(K) * 0.1, jnp.float32)
b = jnp.asarray(rng.randn(B, K), jnp.float32)
active = jnp.asarray(rng.rand(B, K) < 0.6)
f0 = jnp.zeros((B, K), jnp.float32)

f_tpu = jax.jit(jax.vmap(qk.newton_qp))(A, b, active, f0)
ref = jax.jit(jax.vmap(lambda a, x, m, w: qk.newton_qp_reference(a, x, m, w, qk.NEWTON_ITERS)))
f_ref = ref(A, b, active, f0)

def kkt(A, b, act, f):
    g = jnp.einsum("bij,bj->bi", A, f) - b
    return jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * act, axis=-1)

k_tpu = np.asarray(kkt(A, b, active.astype(jnp.float32), f_tpu))
k_ref = np.asarray(kkt(A, b, active.astype(jnp.float32), f_ref))
df = np.abs(np.asarray(f_tpu) - np.asarray(f_ref)).max()
print("platform:", jax.default_backend())
print("max KKT residual: tpu", k_tpu.max(), " ref", k_ref.max())
print("max |f_tpu - f_ref|:", df)
print("unconverged envs (tpu):", int((k_tpu > 1e-3).sum()), "/", B)
