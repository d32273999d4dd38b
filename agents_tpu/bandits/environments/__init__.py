from agents_tpu.bandits.environments.bandit_envs import (
    BanditJaxEnvironment,
    BernoulliBandit,
    ClassificationBandit,
    DriftingLinearBandit,
    RandomBandit,
    StationaryStochasticBandit,
    WheelBandit,
)

__all__ = [
    "BanditJaxEnvironment", "BernoulliBandit", "ClassificationBandit",
    "DriftingLinearBandit", "RandomBandit", "StationaryStochasticBandit",
    "WheelBandit",
]
