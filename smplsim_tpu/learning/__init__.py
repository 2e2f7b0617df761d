from smplsim_tpu.learning.nets import (
    AMPDiscriminator, MLP, PolicyGaussian, PolicyMCP, PolicyPNN, ValueNet,
    amp_disc_loss, amp_reward,
)
from smplsim_tpu.learning.running_norm import RunningNorm, norm_init, norm_update, normalize
from smplsim_tpu.learning.gae import estimate_advantages

__all__ = [
    "AMPDiscriminator", "MLP", "PolicyGaussian", "PolicyMCP", "PolicyPNN",
    "ValueNet", "amp_disc_loss", "amp_reward",
    "RunningNorm", "norm_init", "norm_update", "normalize",
    "estimate_advantages",
]
