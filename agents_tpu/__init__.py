"""agents_tpu: a TPU-native reinforcement-learning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TF-Agents
(reference: tensorflow/agents). Collection, replay, and training run as
jitted programs over a `jax.sharding.Mesh`; nests are pytrees; policies and
agents are pure functions over explicit state (params, optimizer state,
replay state, RNG keys).

Layer map (mirrors reference SURVEY.md §1):
  specs         - shape/dtype/bounds data model
  trajectories  - TimeStep / Trajectory / Transition / PolicyStep pytrees
  environments  - host (python) envs + pure-JAX vectorized envs
  networks      - flax.linen modules built from specs
  distributions - in-repo minimal distribution library
  policies      - pure-function policies + wrappers
  agents        - RL algorithms (DQN family, SAC, PPO, DDPG, TD3, ...)
  replay_buffers- on-HBM ring/episodic buffers as pytree state
  drivers       - jitted lax.scan collectors + host py driver
  metrics       - pytree metric accumulators + numpy twins
  train         - Actor / Learner orchestration, triggers, checkpointing
  parallel      - mesh construction, sharding rules, collectives
  bandits       - contextual-bandit vertical (LinUCB/LinTS/neural/...)
  ops           - Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
