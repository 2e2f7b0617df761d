from smplsim_tpu.poselib.skeleton import SkeletonMotion, SkeletonState, SkeletonTree
from smplsim_tpu.poselib import visualization

__all__ = ["SkeletonTree", "SkeletonState", "SkeletonMotion", "visualization"]
