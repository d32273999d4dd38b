from agents_tpu.bandits.policies.linalg import (
    conjugate_gradient,
    simplified_woodbury_update,
    solve_spd,
    update_inverse,
)
from agents_tpu.bandits.policies.linear_bandit_policy import (
    ExplorationStrategy,
    LinearBanditPolicy,
)

__all__ = [
    "ExplorationStrategy", "LinearBanditPolicy", "conjugate_gradient",
    "simplified_woodbury_update", "solve_spd", "update_inverse",
]
