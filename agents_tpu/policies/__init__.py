from agents_tpu.policies.actor_policy import (
    ActorPolicy,
    DeterministicActorPolicy,
)
from agents_tpu.policies.policy import Policy, clip_to_spec
from agents_tpu.policies.q_policy import CategoricalQPolicy, QPolicy
from agents_tpu.policies.random_policy import (
    FixedPolicy,
    RandomPolicy,
    ScriptedPolicy,
)
from agents_tpu.policies.wrappers import (
    BoltzmannPolicy,
    EpsilonGreedyPolicy,
    GaussianPolicy,
    GreedyPolicy,
    OUNoisePolicy,
)

__all__ = [
    "ActorPolicy", "BoltzmannPolicy", "CategoricalQPolicy",
    "DeterministicActorPolicy", "EpsilonGreedyPolicy", "FixedPolicy",
    "GaussianPolicy", "GreedyPolicy", "OUNoisePolicy", "Policy", "QPolicy",
    "RandomPolicy", "ScriptedPolicy", "clip_to_spec",
]
