from dvae_tpu.models.mixvae import (  # noqa: F401
    MixVAEOutputs,
    apply,
    init_bn_state,
    init_params,
    param_count,
    state_changes,
)
from dvae_tpu.models.losses import LossOutputs, mixvae_loss  # noqa: F401
