from smplsim_tpu.utils.tolerance import tolerance

__all__ = ["tolerance"]
