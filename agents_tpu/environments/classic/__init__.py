from agents_tpu.environments.classic.acrobot import Acrobot
from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.classic.catch import Catch
from agents_tpu.environments.classic.mountain_car import (
    ContinuousMountainCar,
    MountainCar,
)
from agents_tpu.environments.classic.pendulum import Pendulum

__all__ = [
    "Acrobot",
    "CartPole",
    "Catch",
    "ContinuousMountainCar",
    "MountainCar",
    "Pendulum",
]
