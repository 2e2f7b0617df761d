"""smplsim_tpu: TPU-native SMPL humanoid simulation + RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SMPLSim
(ZhengyiLuo/SMPLSim): procedurally generated SMPL/SMPLH/SMPLX humanoids,
batched articulated rigid-body dynamics with contacts, stable-PD control,
speed/getup/reach RL tasks, a mocap motion library, PPO training, and
CEM/iLQR model-predictive control — all vmapped/jit-compiled per chip and
sharded over TPU meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# Full-f32 matmuls everywhere. JAX's DEFAULT matmul precision truncates f32
# dot inputs to bfloat16 on TPU (and on this XLA CPU build), which is ~1e-3
# relative noise. The physics pipeline leans on 0/1 one-hot matmuls as
# TPU-friendly gathers (constraints/solver/collision row selection) — those
# MUST be exact selections — and on small dense contractions (CRBA, contact
# jacobians, Delassus) whose bf16 noise is amplified by stiff contact
# dynamics. 'float32' (bf16_3x) restores full f32 results; compute-bound
# NN layers that prefer raw bf16 speed can request precision=DEFAULT
# explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")
