from smplsim_tpu.learning.nets import MLP, PolicyGaussian, ValueNet
from smplsim_tpu.learning.running_norm import RunningNorm, norm_init, norm_update, normalize
from smplsim_tpu.learning.gae import estimate_advantages

__all__ = [
    "MLP", "PolicyGaussian", "ValueNet",
    "RunningNorm", "norm_init", "norm_update", "normalize",
    "estimate_advantages",
]
