"""Network families, losses, optimizers."""

from muax_tpu.models.networks import (
    MZNetworks,
    MZParams,
    make_mlp_networks,
    make_efficientzero_networks,
    make_resnet_networks,
)
from muax_tpu.models.losses import muzero_loss, LossMetrics
from muax_tpu.models.optimizers import (create_optimizer, flatten_optimizer,
                                        muzero_optimizer)
from muax_tpu.models.acme_networks import (
    CategoricalMZNetworks,
    make_categorical_mlp_networks,
    make_fc_resnet_networks,
)
from muax_tpu.models.stochastic_networks import (
    SMZNetworks,
    SMZParams,
    make_stochastic_mlp_networks,
)
from muax_tpu.models.stochastic_losses import stochastic_muzero_loss
from muax_tpu.models.diffusion import (
    RectifiedFlow,
    SDE,
    batch_add,
    batch_mul,
    flow_matching_loss,
)
from muax_tpu.models.diffusion_networks import (
    DMZNetworks,
    DMZParams,
    make_diffusion_mlp_networks,
)
from muax_tpu.models.diffusion_losses import diffusion_muzero_loss
from muax_tpu.models.az_networks import AZNetwork, make_az_mlp, make_az_resnet
from muax_tpu.models.env_model import (
    EnvModel,
    ModelSearchParams,
    env_model_loss,
    make_mlp_transition_model,
    make_model_policy_fn,
    make_model_recurrent_fn,
    make_model_update_fn,
    make_simulator_policy_fn,
    make_simulator_recurrent_fn,
    model_replay_add,
    model_replay_init,
    model_replay_sample,
)
