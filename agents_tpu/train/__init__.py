from agents_tpu.train.fused_loop import FusedTrainLoop, LoopState

__all__ = ["FusedTrainLoop", "LoopState"]
from agents_tpu.train.on_policy_loop import OnPolicyLoopState, OnPolicyTrainLoop

__all__ += ["OnPolicyLoopState", "OnPolicyTrainLoop"]
