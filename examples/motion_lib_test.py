"""Motion-library load + playback smoke (reference examples/motion_lib_test.py).

With real AMASS data:   python examples/motion_lib_test.py motion_file=path.pkl
Without (default):      synthesizes a smooth random motion and replays it.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from smplsim_tpu.envs.legacy import HumanoidPlayback  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.motion import HumanoidBatchFK, MotionLib, MotionLibConfig  # noqa: E402


def main():
    motion_file = next(
        (a.split("=")[1] for a in sys.argv[1:] if a.startswith("motion_file=")), None
    )
    model = registry.default_humanoid()
    fk = HumanoidBatchFK.from_robot_model(model, filter_vel=False)
    if motion_file:
        lib = MotionLib(fk, MotionLibConfig(motion_file=motion_file))
    else:
        rng = np.random.RandomState(0)
        T = 60
        pose = rng.randn(T, fk.num_joints, 3).cumsum(0) * 0.01
        trans = np.tile([0, 0, 1.0], (T, 1))
        lib = MotionLib(
            fk, MotionLibConfig(randomize_heading=False),
            motion_dict={"synthetic": {"pose_aa": pose, "trans": trans, "fps": 30.0}},
        )
    lib.load_motions()
    print(f"loaded {lib.num_current_motions()} motions, "
          f"{lib.get_total_length():.2f}s total, {lib.gts.shape[0]} frames")

    env = HumanoidPlayback(model, lib)
    st = env.reset(jax.random.PRNGKey(0))
    for t in range(20):
        st = env.step(st, jnp.zeros(env.action_size))
    print("playback 20 frames ok; root height:",
          float(st.phys.qpos[2]))

    state = lib.get_motion_state(
        jnp.zeros(4, jnp.int32), jnp.linspace(0.0, 1.0, 4)
    )
    print("sampled blended states:", {k: tuple(v.shape) for k, v in state.items()})


if __name__ == "__main__":
    main()
