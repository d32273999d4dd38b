from agents_tpu.trajectories import policy_step, time_step, trajectory
from agents_tpu.trajectories.policy_step import PolicyInfo, PolicyStep
from agents_tpu.trajectories.time_step import StepType, TimeStep
from agents_tpu.trajectories.trajectory import Trajectory, Transition

__all__ = [
    "PolicyInfo", "PolicyStep", "StepType", "TimeStep", "Trajectory",
    "Transition", "policy_step", "time_step", "trajectory",
]
