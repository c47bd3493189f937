"""Network families, losses, optimizers."""

from muax_tpu.models.networks import (
    MZNetworks,
    MZParams,
    make_mlp_networks,
    make_efficientzero_networks,
    make_resnet_networks,
)
from muax_tpu.models.losses import muzero_loss, LossMetrics
from muax_tpu.models.optimizers import muzero_optimizer, create_optimizer
