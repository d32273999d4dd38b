"""Trainable action-feasibility constraints for bandit policies.

TPU-native analogue of ``tf_agents/bandits/policies/constraints.py``
(BaseConstraint :39, NeuralConstraint :79, RelativeConstraint :215,
AbsoluteConstraint :298, QuantileConstraint :355,
RelativeQuantileConstraint :418, InputNetworkConstraint :499,
compute_feasibility_probability :557,
construct_mask_from_multiple_sources :575).

Constraints here are *stateless* objects over explicit params (pytrees),
so they compose with jitted agents: the owning agent carries each
constraint's network params in its own state and differentiates the
joint (reward + constraint) loss in one backward pass.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from agents_tpu.bandits.specs.bandit_spec_utils import NUM_ACTIONS_FEATURE_KEY
from agents_tpu.utils import common


def pinball_loss(y_true, y_pred, quantile: float = 0.5):
  """Quantile-regression (pinball) loss, elementwise (reference
  ``tf_agents/bandits/policies/loss_utils.pinball_loss``)."""
  err = y_true - y_pred
  return jnp.maximum(quantile * err, (quantile - 1.0) * err)


class BaseConstraint:
  """Feasibility computation: probability of each action being feasible
  (reference constraints.py:39)."""

  def __init__(self, time_step_spec, action_spec, name: str = "Constraint"):
    self.time_step_spec = time_step_spec
    self.action_spec = action_spec
    self.name = name
    self.num_actions = int(action_spec.num_values)

  def init_params(self, key) -> Any:
    """Returns this constraint's trainable params (a pytree; () if none)."""
    return ()

  def compute_loss(self, params, observations, actions, rewards,
                   weights=None) -> jax.Array:
    """Scalar loss for training the constraint's network (0 if frozen)."""
    del params, observations, actions, rewards, weights
    return jnp.zeros(())

  def __call__(self, params, observation) -> jax.Array:
    """Returns [B, num_actions] probability of each action being feasible."""
    raise NotImplementedError


class NeuralConstraint(BaseConstraint):
  """Trainable constraint backed by a network predicting per-action
  values (reference :79). The base class regresses observed rewards and
  declares every action feasible; subclasses derive feasibility from the
  predictions."""

  def __init__(self, time_step_spec, action_spec, constraint_network,
               error_loss_fn: Callable = common.element_wise_squared_loss,
               name: str = "NeuralConstraint"):
    super().__init__(time_step_spec, action_spec, name)
    self.constraint_network = constraint_network
    self.error_loss_fn = error_loss_fn

  def init_params(self, key):
    return self.constraint_network.init_params(key)

  def _predict(self, params, observation):
    values, _ = self.constraint_network.apply(params, observation, None, ())
    return values  # [B, num_actions]

  def compute_loss(self, params, observations, actions, rewards,
                   weights=None):
    """Regression of the constraint net's chosen-action prediction onto
    the observed (constraint) reward signal (reference :149-198)."""
    predicted = self._predict(params, observations)
    chosen = common.index_with_actions(predicted, actions)
    per_example = self.error_loss_fn(rewards, chosen)
    if weights is not None:
      per_example = per_example * weights
    return jnp.mean(per_example)

  def __call__(self, params, observation):
    batch = jax.tree_util.tree_leaves(observation)[0].shape[0]
    return jnp.ones((batch, self.num_actions))


class RelativeConstraint(NeuralConstraint):
  """expected_value(action) >=/<= (1 - margin) * expected_value(baseline)
  (reference :215)."""

  def __init__(self, time_step_spec, action_spec, constraint_network,
               error_loss_fn: Callable = common.element_wise_squared_loss,
               comparator_fn: Callable = jnp.greater, margin: float = 0.0,
               baseline_action_fn: Optional[Callable] = None,
               name: str = "RelativeConstraint"):
    super().__init__(time_step_spec, action_spec, constraint_network,
                     error_loss_fn, name)
    self.comparator_fn = comparator_fn
    self.margin = margin
    self.baseline_action_fn = baseline_action_fn

  def __call__(self, params, observation):
    predicted = self._predict(params, observation)
    if self.baseline_action_fn is not None:
      baseline_action = self.baseline_action_fn(observation)
    else:
      baseline_action = jnp.zeros((predicted.shape[0],), jnp.int32)
    baseline = common.index_with_actions(predicted, baseline_action)
    ok = self.comparator_fn(predicted, (1.0 - self.margin) * baseline[:, None])
    return ok.astype(jnp.float32)


class AbsoluteConstraint(NeuralConstraint):
  """expected_value(action) >=/<= absolute_value (reference :298)."""

  def __init__(self, time_step_spec, action_spec, constraint_network,
               error_loss_fn: Callable = common.element_wise_squared_loss,
               comparator_fn: Callable = jnp.greater,
               absolute_value: float = 0.0, name: str = "AbsoluteConstraint"):
    super().__init__(time_step_spec, action_spec, constraint_network,
                     error_loss_fn, name)
    self.comparator_fn = comparator_fn
    self.absolute_value = absolute_value

  def __call__(self, params, observation):
    predicted = self._predict(params, observation)
    return self.comparator_fn(predicted, self.absolute_value).astype(
        jnp.float32)


class QuantileConstraint(NeuralConstraint):
  """Q_tau(action) >=/<= quantile_value; net trained with pinball loss
  (reference :355)."""

  def __init__(self, time_step_spec, action_spec, constraint_network,
               quantile: float = 0.5, comparator_fn: Callable = jnp.greater,
               quantile_value: float = 0.0, name: str = "QuantileConstraint"):
    super().__init__(
        time_step_spec, action_spec, constraint_network,
        error_loss_fn=lambda t, p: pinball_loss(t, p, quantile), name=name)
    self.comparator_fn = comparator_fn
    self.quantile_value = quantile_value

  def __call__(self, params, observation):
    predicted = self._predict(params, observation)
    return self.comparator_fn(predicted, self.quantile_value).astype(
        jnp.float32)


class RelativeQuantileConstraint(NeuralConstraint):
  """Q_tau(action) >=/<= Q_tau(baseline_action) (reference :418)."""

  def __init__(self, time_step_spec, action_spec, constraint_network,
               quantile: float = 0.5, comparator_fn: Callable = jnp.greater,
               baseline_action_fn: Optional[Callable] = None,
               name: str = "RelativeQuantileConstraint"):
    super().__init__(
        time_step_spec, action_spec, constraint_network,
        error_loss_fn=lambda t, p: pinball_loss(t, p, quantile), name=name)
    self.comparator_fn = comparator_fn
    self.baseline_action_fn = baseline_action_fn

  def __call__(self, params, observation):
    predicted = self._predict(params, observation)
    if self.baseline_action_fn is not None:
      baseline_action = self.baseline_action_fn(observation)
    else:
      baseline_action = jnp.zeros((predicted.shape[0],), jnp.int32)
    baseline = common.index_with_actions(predicted, baseline_action)
    return self.comparator_fn(predicted, baseline[:, None]).astype(
        jnp.float32)


class InputNetworkConstraint(BaseConstraint):
  """Constraint from an already-trained network: no loss contribution
  (reference :499). Subclass and implement ``__call__``."""

  def __init__(self, time_step_spec, action_spec, input_network=None,
               name: str = "InputNetworkConstraint"):
    super().__init__(time_step_spec, action_spec, name)
    self.network = input_network


def compute_feasibility_probability(
    observation, constraints: Iterable[BaseConstraint],
    constraint_params: Sequence[Any], num_actions: int,
    action_mask: Optional[jax.Array] = None) -> jax.Array:
  """[B, num_actions] product of independent constraints' feasibility
  (reference :557)."""
  batch = jax.tree_util.tree_leaves(observation)[0].shape[0]
  prob = jnp.ones((batch, num_actions))
  if action_mask is not None:
    prob = action_mask.astype(jnp.float32)
  for c, p in zip(constraints, constraint_params):
    prob = prob * c(p, observation)
  return prob


def construct_mask_from_multiple_sources(
    key, observation, observation_and_action_constraint_splitter,
    constraints: Sequence[BaseConstraint], constraint_params: Sequence[Any],
    max_num_actions: int) -> Tuple[Any, Optional[jax.Array]]:
  """Combines (1) an action mask embedded in the observation, (2) the
  ``num_actions`` feature limiting per-sample arm counts, and (3) the
  constraints' feasibility — Bernoulli-sampled into a 0/1 mask
  (reference :575). Returns (network_observation, mask-or-None)."""
  mask = None
  if observation_and_action_constraint_splitter is not None:
    observation, mask = observation_and_action_constraint_splitter(observation)
  # Independent sources combined by AND (reference :575 uses two
  # separate ifs): a splitter does not disable the num_actions feature —
  # arms beyond a sample's num_actions are padding and stay masked.
  if (isinstance(observation, dict)
      and NUM_ACTIONS_FEATURE_KEY in observation):
    num = observation[NUM_ACTIONS_FEATURE_KEY]
    num_mask = (jnp.arange(max_num_actions)[None, :]
                < num.reshape(-1, 1)).astype(jnp.int32)
    mask = num_mask if mask is None else mask * num_mask
  if constraints:
    prob = compute_feasibility_probability(
        observation, constraints, constraint_params, max_num_actions, mask)
    mask = (jax.random.uniform(key, prob.shape) < prob).astype(jnp.int32)
  return observation, mask
