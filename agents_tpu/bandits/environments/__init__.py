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
from agents_tpu.bandits.environments.nonstationary_envs import (
    NonStationaryStochasticBandit,
    PiecewiseBernoulliBandit,
    PiecewiseStationaryStochasticBandit,
    piece_schedule,
)
from agents_tpu.bandits.environments.structured_envs import (
    BernoulliActionMaskBandit,
    ClickModel,
    ExplicitPositionalBiasRankingEnv,
    FeedbackModel,
    RankingBanditEnv,
    StationaryStochasticPerArmBandit,
    cascading_to_score_vector,
)
from agents_tpu.bandits.environments import dataset_utilities
from agents_tpu.bandits.environments import environment_utilities

__all__ = [
    "BanditJaxEnvironment", "BernoulliActionMaskBandit", "BernoulliBandit",
    "ClassificationBandit", "ClickModel", "DriftingLinearBandit",
    "ExplicitPositionalBiasRankingEnv",
    "FeedbackModel", "MovieLensBandit", "MovieLensPerArmBandit",
    "NonStationaryStochasticBandit", "PiecewiseBernoulliBandit",
    "PiecewiseStationaryStochasticBandit", "RandomBandit",
    "RankingBanditEnv", "StationaryStochasticBandit",
    "StationaryStochasticPerArmBandit", "WheelBandit",
    "cascading_to_score_vector", "dataset_utilities",
    "environment_utilities", "load_movielens_data", "piece_schedule",
    "synthetic_ratings_matrix",
]
