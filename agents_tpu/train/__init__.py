from agents_tpu.train.fused_loop import FusedTrainLoop, LoopState

__all__ = ["FusedTrainLoop", "LoopState"]
