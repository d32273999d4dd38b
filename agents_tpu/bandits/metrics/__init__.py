from agents_tpu.bandits.metrics.bandit_metrics import (
    ConstraintViolationsMetric,
    RegretMetric,
    SuboptimalArmsMetric,
)

__all__ = [
    "ConstraintViolationsMetric", "RegretMetric", "SuboptimalArmsMetric",
]
