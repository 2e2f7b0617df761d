from smplsim_tpu.body_model.lbs import lbs
from smplsim_tpu.body_model.smpl import SMPLParser, load_smpl_data

__all__ = ["lbs", "SMPLParser", "load_smpl_data"]
