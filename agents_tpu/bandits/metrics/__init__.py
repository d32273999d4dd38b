from agents_tpu.bandits.metrics.bandit_metrics import (
    ConstraintViolationsMetric,
    DistanceFromGreedyMetric,
    RegretMetric,
    SuboptimalArmsMetric,
)

__all__ = [
    "ConstraintViolationsMetric", "DistanceFromGreedyMetric",
    "RegretMetric", "SuboptimalArmsMetric",
]
