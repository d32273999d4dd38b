from agents_tpu.distributions.distributions import (
    Bernoulli,
    Beta,
    Categorical,
    Deterministic,
    Distribution,
    GumbelSoftmax,
    Independent,
    MaskedCategorical,
    Normal,
    OneHotCategorical,
    ShiftedCategorical,
    SquashedNormal,
    kl_divergence,
)

__all__ = [
    "Bernoulli", "Beta", "Categorical", "Deterministic", "Distribution",
    "GumbelSoftmax", "Independent", "MaskedCategorical", "Normal",
    "OneHotCategorical", "ShiftedCategorical", "SquashedNormal",
    "kl_divergence",
]
