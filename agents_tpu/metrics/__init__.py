from agents_tpu.metrics.jax_metrics import (
    AverageEpisodeLengthMetric,
    AverageReturnMetric,
    ChosenActionHistogram,
    DequeState,
    EnvironmentSteps,
    MaxReturnMetric,
    Metric,
    MinReturnMetric,
    NumberOfEpisodes,
    standard_collect_metrics,
)

__all__ = [
    "AverageEpisodeLengthMetric", "AverageReturnMetric",
    "ChosenActionHistogram", "DequeState", "EnvironmentSteps",
    "MaxReturnMetric", "Metric", "MinReturnMetric", "NumberOfEpisodes",
    "standard_collect_metrics",
]
