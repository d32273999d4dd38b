from agents_tpu.bandits.multi_objective.scalarizer import (
    ChebyshevScalarizer,
    HyperVolumeScalarizer,
    LinearScalarizer,
    Scalarizer,
)

__all__ = [
    "ChebyshevScalarizer", "HyperVolumeScalarizer", "LinearScalarizer",
    "Scalarizer",
]
