"""TPU-hardware validation + microbenchmark for the Pallas kernels.

Run on a machine with a real TPU (inherits the axon env):

    python tools/bench_kernels.py

Checks the QP and linalg kernels against their pure-JAX reference
implementations on random systems, then reports sustained timings (true
host-read sync — block_until_ready under-reports through the remote tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    print(f"{name:32s} {(time.perf_counter() - t0) / n * 1e3:8.2f} ms")


def main():
    from smplsim_tpu.ops import linalg_kernels as lk
    from smplsim_tpu.ops import qp_kernel

    B, K, n = 1024, 64, 75
    rng = np.random.default_rng(0)

    # --- QP kernel ---
    W = rng.normal(size=(B, K, 40)) * 0.5
    A = (W @ np.swapaxes(W, 1, 2)
         + np.eye(K)[None] * rng.uniform(1e-3, 1.0, (B, 1, 1))).astype(np.float32)
    b = rng.normal(size=(B, K)).astype(np.float32)
    act = rng.uniform(size=(B, K)) > 0.2
    Aj, bj, actj = jnp.asarray(A), jnp.asarray(b), jnp.asarray(act)

    f0 = jnp.zeros_like(bj)
    f_pal = np.asarray(qp_kernel._newton_qp_pallas(Aj, bj, actj, f0))
    f_ref = np.asarray(
        jax.jit(jax.vmap(qp_kernel.newton_qp_reference))(Aj, bj, actj, f0)
    )

    def obj(f):
        return 0.5 * np.einsum("bi,bij,bj->b", f, A, f) - np.einsum(
            "bi,bi->b", f, b
        )

    gap = obj(f_pal) - obj(f_ref)
    print(f"QP kernel objective gap vs reference: max {gap.max():.2e} "
          f"(negative = kernel converged further); worse on "
          f"{(gap > 1e-5).mean() * 100:.1f}% of systems")
    assert gap.max() < 1e-2, "kernel diverged from reference QP solutions"

    timeit("newton_qp pallas cold (B=1024)", qp_kernel._newton_qp_pallas, Aj, bj, actj, f0)
    timeit("newton_qp pallas warm (B=1024)", qp_kernel._newton_qp_pallas, Aj, bj, actj, jnp.asarray(f_pal))
    timeit("newton_qp reference (SoA)",
           jax.jit(jax.vmap(qp_kernel.newton_qp_reference)), Aj, bj, actj, f0)

    # --- linalg kernels ---
    X = rng.normal(size=(B, n, n))
    M = jnp.asarray((X @ np.swapaxes(X, 1, 2) + 10 * np.eye(n)).astype(np.float32))
    L = lk.cholesky_batched(M)
    Lnp = np.linalg.cholesky(np.asarray(M, np.float64))
    rel = np.abs(np.asarray(L) - Lnp).max() / np.abs(Lnp).max()
    print(f"cholesky kernel rel err: {rel:.2e}")
    assert rel < 1e-4

    rhs = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    x = lk.solve_lower_batched(L, rhs)
    xs = np.linalg.solve(np.tril(Lnp), np.asarray(rhs, np.float64)[..., None])[..., 0]
    rel = np.abs(np.asarray(x) - xs).max() / np.abs(xs).max()
    print(f"solve_lower kernel rel err: {rel:.2e}")
    assert rel < 1e-4

    timeit("cholesky_batched (n=75)", lk.cholesky_batched, M)
    timeit("solve_lower_batched vec", lambda l, r: lk.solve_lower_batched(l, r), L, rhs)
    print("all kernel checks passed")


if __name__ == "__main__":
    main()
