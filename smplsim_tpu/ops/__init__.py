from smplsim_tpu.ops.qp_kernel import newton_qp

__all__ = ["newton_qp"]
