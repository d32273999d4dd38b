from agents_tpu.networks.actor_distribution_network import (
    make_actor_distribution_network,
    make_deterministic_actor_network,
    make_sac_actor_network,
)
from agents_tpu.networks.encoding_network import make_encoding_network
from agents_tpu.networks.lstm_networks import (
    make_actor_distribution_rnn_network,
    make_q_rnn_network,
    make_value_rnn_network,
)
from agents_tpu.networks.network import Network
from agents_tpu.networks.projection_networks import (
    CategoricalProjection,
    NormalProjection,
    TanhNormalProjection,
)
from agents_tpu.networks.q_network import (
    make_categorical_q_network,
    make_q_network,
)
from agents_tpu.networks.value_network import (
    make_critic_network,
    make_value_network,
)

__all__ = [
    "CategoricalProjection", "Network", "NormalProjection",
    "TanhNormalProjection", "make_actor_distribution_network",
    "make_actor_distribution_rnn_network", "make_categorical_q_network",
    "make_critic_network", "make_deterministic_actor_network",
    "make_encoding_network", "make_q_network", "make_q_rnn_network",
    "make_sac_actor_network", "make_value_network", "make_value_rnn_network",
]
