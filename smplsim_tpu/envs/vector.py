"""Gymnasium-facing vectorized env facade over the jitted batch.

Rebuild of the reference's GymVectEnv (smpl_sim/envs/nv/gymwrapper.py:7-65):
same gymnasium.vector API — batched Box spaces, obs clamp, autoreset with
`final_observation` in info — but the batch underneath is one jitted
`vmap(step_autoreset)` on device instead of an Isaac sim. This is the
imperative shell for code written against gym vector envs (e.g. external RL
libraries); framework-native training uses the pure-functional API directly.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from smplsim_tpu.envs.base import HumanoidEnv

try:  # gymnasium is optional — only this facade needs it
    from gymnasium import spaces
    from gymnasium.vector.utils import batch_space

    _HAS_GYM = True
except Exception:  # pragma: no cover
    _HAS_GYM = False


class GymVectEnv:
    """num_envs copies of `env` stepping in lockstep on device."""

    def __init__(
        self,
        env: HumanoidEnv,
        num_envs: int,
        clip_observations: float = float(np.inf),
        seed: int = 0,
    ):
        self._env = env
        self.num_envs = num_envs
        self._clip_obs = clip_observations
        self._seed = seed
        self._states = None

        self._reset = jax.jit(jax.vmap(env.reset))
        self._step = jax.jit(jax.vmap(env.step_autoreset), donate_argnums=0)

        if _HAS_GYM:
            inf = float(np.inf)
            self.single_observation_space = spaces.Box(
                -inf * np.ones(env.obs_size), inf * np.ones(env.obs_size)
            )
            self.single_action_space = spaces.Box(
                -np.ones(env.action_size), np.ones(env.action_size)
            )
            self.observation_space = batch_space(
                self.single_observation_space, num_envs
            )
            self.action_space = batch_space(self.single_action_space, num_envs)

    # -- gymnasium.vector API ------------------------------------------------
    def reset(self, seed: int | None = None, options=None):
        if seed is not None:
            self._seed = seed
        keys = jax.random.split(jax.random.PRNGKey(self._seed), self.num_envs)
        self._states = self._reset(keys)
        return self._clipped_obs(), {}

    def step(self, actions):
        assert self._states is not None, "call reset() first"
        obs_before = self._clipped_obs()
        actions = jnp.asarray(np.asarray(actions, np.float32))
        self._states = self._step(self._states, actions)
        st = self._states

        obs = self._clipped_obs()
        reward = np.asarray(st.reward)
        terminated = np.asarray(st.terminated)
        truncated = np.asarray(st.truncated)
        info = {k: np.asarray(v) for k, v in st.info.items()}
        if (terminated | truncated).any():
            # autoreset already happened on device; the pre-reset obs is the
            # final one (gymwrapper.py:58-60)
            info["final_observation"] = obs_before
        return obs, reward, terminated, truncated, info

    def close(self) -> None:
        self._states = None

    def render(self, mode="rgb_array"):  # pragma: no cover
        raise NotImplementedError("use smplsim_tpu viewers/offline tooling")

    def _clipped_obs(self) -> np.ndarray:
        obs = np.asarray(self._states.obs)
        if np.isfinite(self._clip_obs):
            obs = np.clip(obs, -self._clip_obs, self._clip_obs)
        return obs
