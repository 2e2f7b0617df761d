from smplsim_tpu.control.cem import CEMConfig, CEMPlanner
from smplsim_tpu.control.ilqr import ILQRConfig, ilqr_plan

__all__ = ["CEMConfig", "CEMPlanner", "ILQRConfig", "ilqr_plan"]
