from smplsim_tpu.poselib.skeleton import SkeletonMotion, SkeletonState, SkeletonTree

__all__ = ["SkeletonTree", "SkeletonState", "SkeletonMotion"]
