from smplsim_tpu.eval.metrics import (
    compute_accel,
    compute_error_accel,
    compute_error_vel,
    compute_metrics_lite,
    compute_penetration,
    compute_skate,
    compute_vel,
    frobenius_root_error,
    p_mpjpe,
)

__all__ = [
    "compute_accel", "compute_error_accel", "compute_error_vel",
    "compute_metrics_lite", "compute_penetration", "compute_skate",
    "compute_vel", "frobenius_root_error", "p_mpjpe",
]
