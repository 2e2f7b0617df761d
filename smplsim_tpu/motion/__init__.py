from smplsim_tpu.motion.fk import HumanoidBatchFK
from smplsim_tpu.motion.motion_lib import MotionLib, MotionLibConfig, FixHeightMode

__all__ = ["HumanoidBatchFK", "MotionLib", "MotionLibConfig", "FixHeightMode"]
