from agents_tpu.metrics.jax_metrics import (
    AverageEpisodeLengthMetric,
    AverageReturnMetric,
    AverageReturnMultiMetric,
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
    "AverageReturnMultiMetric",
    "ChosenActionHistogram", "DequeState", "EnvironmentSteps",
    "MaxReturnMetric", "Metric", "MinReturnMetric", "NumberOfEpisodes",
    "standard_collect_metrics",
]
