from agents_tpu.bandits.environments.bandit_envs import (
    BanditJaxEnvironment,
    BernoulliBandit,
    ClassificationBandit,
    DriftingLinearBandit,
    RandomBandit,
    StationaryStochasticBandit,
    WheelBandit,
)
from agents_tpu.bandits.environments.movielens import (
    MovieLensBandit,
    MovieLensPerArmBandit,
    load_movielens_data,
    synthetic_ratings_matrix,
)

__all__ = [
    "BanditJaxEnvironment", "BernoulliBandit", "ClassificationBandit",
    "DriftingLinearBandit", "MovieLensBandit", "MovieLensPerArmBandit",
    "RandomBandit", "StationaryStochasticBandit", "WheelBandit",
    "load_movielens_data", "synthetic_ratings_matrix",
]
