from agents_tpu.replay_buffers.prioritized_replay import (
    PrioritizedBufferInfo,
    PrioritizedReplay,
    PrioritizedReplayState,
)
from agents_tpu.replay_buffers.uniform_replay import (
    BufferInfo,
    ReplayState,
    UniformReplay,
)

__all__ = [
    "BufferInfo",
    "PrioritizedBufferInfo",
    "PrioritizedReplay",
    "PrioritizedReplayState",
    "ReplayState",
    "UniformReplay",
]
