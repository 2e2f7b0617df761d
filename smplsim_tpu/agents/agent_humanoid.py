"""Training driver: env + PPO + checkpointing + logging.

The TPU-native AgentHumanoid (reference smpl_sim/agents/agent_humanoid.py):
builds the task env from the registry, runs the PPO epoch loop with
T_sample/T_update wall-clock accounting (agent_humanoid.py:196-225), saves
orbax checkpoints as Humanoid_{epoch:08d} with resume by epoch=-1|N
(:113-160), logs epoch metrics to log.txt as JSON lines (wandb-free;
learning/logger_txt.py equivalent), and offers run_policy for eval rollouts
(:232-250). The multiprocessing sampler is gone — rollouts are part of the
jitted train step.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu.agents.config import RunConfig
from smplsim_tpu.envs.tasks import TASKS
from smplsim_tpu.learning.ppo import PPO, TrainState
from smplsim_tpu.models import registry


class AgentHumanoid:
    def __init__(self, cfg: RunConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.model = registry.default_humanoid(dtype=dtype)
        self.env = TASKS[cfg.task](self.model, cfg.env)
        self.ppo = PPO(self.env, cfg.learning)
        self.out_dir = os.path.join(cfg.output_dir, cfg.exp_name)
        os.makedirs(self.out_dir, exist_ok=True)
        self._train_step = jax.jit(self.ppo.train_step)
        self.state: TrainState | None = None

    # ---------------- checkpointing ----------------
    def _ckpt_dir(self, epoch: int) -> str:
        return os.path.join(self.out_dir, f"Humanoid_{epoch:08d}")

    def save_checkpoint(self, ts: TrainState) -> str:
        import orbax.checkpoint as ocp

        epoch = int(jax.device_get(ts.epoch))
        path = os.path.abspath(self._ckpt_dir(epoch))
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, jax.device_get(ts), force=True)
        return path

    def load_checkpoint(self, epoch: int = -1) -> TrainState:
        import orbax.checkpoint as ocp

        if epoch == -1:
            cands = sorted(
                d for d in os.listdir(self.out_dir) if d.startswith("Humanoid_")
            )
            if not cands:
                raise FileNotFoundError(f"no checkpoints under {self.out_dir}")
            path = os.path.join(self.out_dir, cands[-1])
        else:
            path = self._ckpt_dir(epoch)
        ckpt = ocp.PyTreeCheckpointer()
        template = self.ppo.init(jax.random.PRNGKey(self.cfg.seed))
        restored = ckpt.restore(os.path.abspath(path), item=jax.device_get(template))
        return jax.tree.map(jnp.asarray, restored)

    # ---------------- logging ----------------
    def _maybe_init_wandb(self):
        """Optional wandb mirroring (reference run.py:49-59 wandb init with
        resume); enabled by cfg.wandb=True and a working wandb install."""
        if getattr(self, "_wandb", None) is not None:
            return self._wandb
        self._wandb = False
        if getattr(self.cfg, "wandb", False):
            try:
                import wandb

                wandb.init(
                    project=getattr(self.cfg, "wandb_project", "smplsim_tpu"),
                    name=self.cfg.exp_name, resume="allow",
                    id=self.cfg.exp_name, config=dataclasses_asdict(self.cfg),
                )
                self._wandb = wandb
            except Exception:
                pass
        return self._wandb

    def log(self, record: dict[str, Any]):
        line = json.dumps({k: _py(v) for k, v in record.items()})
        with open(os.path.join(self.out_dir, "log.txt"), "a") as f:
            f.write(line + "\n")
        print(line, flush=True)
        wb = self._maybe_init_wandb()
        if wb:
            wb.log({k: _py(v) for k, v in record.items()})

    # ---------------- training ----------------
    def optimize_policy(self, num_epochs: int | None = None):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        if self.state is None:
            if cfg.epoch != 0:
                self.state = self.load_checkpoint(cfg.epoch)
            else:
                self.state = self.ppo.init(jax.random.PRNGKey(cfg.seed))
        ts = self.state
        start = int(jax.device_get(ts.epoch))
        for epoch in range(start, start + num_epochs):
            t0 = time.perf_counter()
            ts, metrics = self._train_step(ts)
            jax.block_until_ready(ts.policy_params)
            t_step = time.perf_counter() - t0
            steps = cfg.learning.horizon * cfg.learning.num_envs
            self.log(
                {
                    "epoch": epoch + 1,
                    "T_step": round(t_step, 3),
                    "steps_per_sec": round(steps / t_step, 1),
                    **{k: _py(v) for k, v in metrics.items()},
                }
            )
            if (epoch + 1) % cfg.save_frequency == 0:
                self.save_checkpoint(ts)
        self.state = ts
        self.save_checkpoint(ts)
        return ts

    # ---------------- eval ----------------
    def run_policy(self, n_episodes: int = 4, horizon: int = 300,
                   stochastic: bool = False, record_path: str | None = None,
                   render_path: str | None = None):
        """Deterministic (mean-action) eval rollouts; returns metrics.

        record_path: optionally dump the rollout state trajectories
        (qpos/qvel/reward/done per step) to a joblib pkl — the reference's
        record-states-on-keypress feature (base_env.py:181-201), here as an
        explicit eval artifact.
        render_path: optionally render episode 0's qpos trajectory to an
        animated GIF (geom-level matplotlib; smplsim_tpu/render.py) — the
        reference's mp4 eval dump (base_env.py:148-179), GL-free."""
        from smplsim_tpu.learning.nets import sample_action
        from smplsim_tpu.learning.running_norm import normalize

        ts = self.state or self.load_checkpoint(self.cfg.epoch)
        env = self.env

        def policy_action(key, obs):
            nobs = normalize(ts.obs_norm, obs, self.ppo.cfg.obs_clip)
            mean, log_std = self.ppo.policy.apply(ts.policy_params, nobs)
            return sample_action(key, mean, log_std) if stochastic else mean

        def rollout(key):
            st = env.reset(key)

            def body(carry, k):
                st, ret, alive, length = carry
                a = policy_action(k, st.obs)
                st2 = env.step(st, jnp.clip(a, -1, 1))
                ret = ret + st2.reward * alive
                length = length + alive
                alive = alive * (1.0 - st2.done.astype(jnp.float32))
                return (st2, ret, alive, length), None

            def body_rec(carry, k):
                carry, _ = body(carry, k)
                st2 = carry[0]
                rec = {
                    "qpos": st2.phys.qpos, "qvel": st2.phys.qvel,
                    "reward": st2.reward, "done": st2.done,
                }
                return carry, rec

            (st, ret, alive, length), traj = jax.lax.scan(
                body_rec,
                (st, jnp.zeros(()), jnp.ones(()), jnp.zeros(())),
                jax.random.split(key, horizon),
            )
            return ret, length, traj

        keys = jax.random.split(jax.random.PRNGKey(self.cfg.seed + 1), n_episodes)
        rets, lengths, traj = jax.jit(jax.vmap(rollout))(keys)
        if record_path:
            import joblib

            joblib.dump(
                {k: np.asarray(v) for k, v in traj.items()}, record_path
            )
        if render_path:
            from smplsim_tpu.render import render_rollout

            render_rollout(
                self.env.model, np.asarray(traj["qpos"][0]), render_path,
                every=2,
            )
        out = {
            "eval_return_mean": float(jnp.mean(rets)),
            "eval_return_std": float(jnp.std(rets)),
            "eval_length_mean": float(jnp.mean(lengths)),
        }
        self.log(out)
        return out


def dataclasses_asdict(cfg):
    import dataclasses

    try:
        return dataclasses.asdict(cfg)
    except Exception:
        return {}


def _py(v):
    if isinstance(v, (jnp.ndarray, np.ndarray)):
        return float(np.asarray(v))
    return v
