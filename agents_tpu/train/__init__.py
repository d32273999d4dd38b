from agents_tpu.train.actor import Actor, collect_metrics, eval_metrics
from agents_tpu.train.checkpointer import Checkpointer
from agents_tpu.train.fused_loop import FusedTrainLoop, LoopState
from agents_tpu.train.host_device_loop import DeviceState, HostDeviceTrainLoop
from agents_tpu.train.learner import JsonlSummaryWriter, Learner
from agents_tpu.utils.tb_writer import MultiWriter, TensorBoardEventWriter
from agents_tpu.train.on_policy_loop import (
    OnPolicyLoopState,
    OnPolicyTrainLoop,
)
from agents_tpu.train.triggers import (
    IntervalTrigger,
    PolicyCheckpointTrigger,
    StepPerSecondLogTrigger,
    StepPerSecondTracker,
)

__all__ = [
    "Actor", "Checkpointer", "DeviceState", "FusedTrainLoop",
    "HostDeviceTrainLoop", "IntervalTrigger", "JsonlSummaryWriter",
    "MultiWriter", "TensorBoardEventWriter",
    "Learner", "LoopState", "OnPolicyLoopState", "OnPolicyTrainLoop",
    "PolicyCheckpointTrigger", "StepPerSecondLogTrigger",
    "StepPerSecondTracker", "collect_metrics", "eval_metrics",
]
from agents_tpu.train.async_host_device_loop import AsyncHostDeviceTrainLoop

__all__ += ["AsyncHostDeviceTrainLoop"]
from agents_tpu.train.host_on_policy_loop import HostOnPolicyTrainLoop

__all__ += ["HostOnPolicyTrainLoop"]
