from agents_tpu.replay_buffers.uniform_replay import (
    BufferInfo,
    ReplayState,
    UniformReplay,
)

__all__ = ["BufferInfo", "ReplayState", "UniformReplay"]
