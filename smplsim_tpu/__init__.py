"""smplsim_tpu: TPU-native SMPL humanoid simulation + RL framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of SMPLSim
(ZhengyiLuo/SMPLSim): procedurally generated SMPL/SMPLH/SMPLX humanoids,
batched articulated rigid-body dynamics with contacts, stable-PD control,
speed/getup/reach RL tasks, a mocap motion library, PPO training, and
CEM/iLQR model-predictive control — all vmapped/jit-compiled per chip and
sharded over TPU meshes.
"""

__version__ = "0.1.0"
