from agents_tpu.environments.classic.cartpole import CartPole
from agents_tpu.environments.classic.catch import Catch
from agents_tpu.environments.classic.pendulum import Pendulum

__all__ = ["CartPole", "Catch", "Pendulum"]
