"""Policy config registry: serializable policy-architecture configs.

Together with ``networks.registry`` this makes a saved policy artifact
self-contained: the manifest records which policy class (and wrapper
stack) to rebuild, and the network configs inside it; ``build_policy``
reconstructs the whole object from specs alone — the analogue of a
SavedModel restoring with zero user code
(``tf_agents/policies/policy_saver.py:103`` /
``py_tf_eager_policy.py:150``).

``policy_config`` returns None for policies it cannot represent (custom
classes, callable epsilon schedules, splitters, normalizers, custom CEM
samplers); such artifacts still save, but must be loaded the explicit way
(caller supplies the policy object). A policy class outside this module's
dispatch table can opt in by defining ``policy_config(self) -> dict`` and
registering a builder in ``POLICY_BUILDERS``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from agents_tpu.networks import registry as net_registry

POLICY_BUILDERS: Dict[str, Callable] = {}


def _net_cfg(network) -> Optional[dict]:
  return getattr(network, "build_config", None)


def policy_config(policy) -> Optional[dict]:
  """Serializable config for `policy`, or None when unrepresentable."""
  from agents_tpu.policies import actor_policy as ap
  from agents_tpu.policies import cem_policy as cp
  from agents_tpu.policies import q_policy as qp
  from agents_tpu.policies import wrappers as w

  if hasattr(policy, "policy_config"):
    return policy.policy_config()

  # Wrappers: serialize recursively.
  simple_wrappers = (
      (w.GreedyPolicy, lambda p: {}),
      (w.EpsilonGreedyPolicy,
       lambda p: None if callable(p.epsilon) else {"epsilon": p.epsilon}),
      (w.BoltzmannPolicy,
       lambda p: None if callable(p.temperature)
       else {"temperature": p.temperature}),
      (w.GaussianPolicy, lambda p: {"scale": p.scale}),
      (w.OUNoisePolicy,
       lambda p: {"ou_stddev": p.ou_stddev, "ou_damping": p.ou_damping}),
  )
  for cls, kw_fn in simple_wrappers:
    if type(policy) is cls:
      kw = kw_fn(policy)
      inner = policy_config(policy.wrapped)
      if kw is None or inner is None:
        return None
      return {"type": cls.__name__, "kwargs": kw, "wrapped": inner}

  # Leaf policies.
  if type(policy) is qp.CategoricalQPolicy:
    if policy.splitter is not None or _net_cfg(policy.q_network) is None:
      return None
    return {"type": "CategoricalQPolicy",
            "network": _net_cfg(policy.q_network),
            "kwargs": {"min_q_value": policy.min_q_value,
                       "max_q_value": policy.max_q_value}}
  if type(policy) is qp.QPolicy:
    if policy.splitter is not None or _net_cfg(policy.q_network) is None:
      return None
    return {"type": "QPolicy", "network": _net_cfg(policy.q_network),
            "kwargs": {}}
  if type(policy) is ap.ActorPolicy:
    if (policy.observation_normalizer is not None
        or _net_cfg(policy.actor_network) is None):
      return None
    return {"type": "ActorPolicy",
            "network": _net_cfg(policy.actor_network), "kwargs": {}}
  if type(policy) is ap.DeterministicActorPolicy:
    if _net_cfg(policy.actor_network) is None:
      return None
    return {"type": "DeterministicActorPolicy",
            "network": _net_cfg(policy.actor_network), "kwargs": {}}
  if type(policy) is cp.CEMPolicy:
    from agents_tpu.policies.cem_samplers import GaussianContinuousSampler
    if (_net_cfg(policy.q_network) is None
        or type(policy.sampler) is not GaussianContinuousSampler
        # sample_clippers are arbitrary callables; silently dropping them
        # would rebuild a policy that proposes infeasible candidates.
        or getattr(policy.sampler, "sample_clippers", None)):
      return None
    return {"type": "CEMPolicy", "network": _net_cfg(policy.q_network),
            "kwargs": {"num_samples": policy.num_samples,
                       "num_elites": policy.num_elites,
                       "num_iterations": policy.num_iterations,
                       "initial_std": policy.initial_std}}
  return None


def build_policy(config: dict, time_step_spec, action_spec):
  """Inverse of ``policy_config``."""
  from agents_tpu.policies import actor_policy as ap
  from agents_tpu.policies import cem_policy as cp
  from agents_tpu.policies import q_policy as qp
  from agents_tpu.policies import wrappers as w

  kind = config["type"]
  if kind in POLICY_BUILDERS:
    return POLICY_BUILDERS[kind](config, time_step_spec, action_spec)

  wrapper_classes = {
      "GreedyPolicy": w.GreedyPolicy,
      "EpsilonGreedyPolicy": w.EpsilonGreedyPolicy,
      "BoltzmannPolicy": w.BoltzmannPolicy,
      "GaussianPolicy": w.GaussianPolicy,
      "OUNoisePolicy": w.OUNoisePolicy,
  }
  if kind in wrapper_classes:
    inner = build_policy(config["wrapped"], time_step_spec, action_spec)
    return wrapper_classes[kind](inner, **config.get("kwargs", {}))

  leaf_classes = {
      "QPolicy": qp.QPolicy,
      "CategoricalQPolicy": qp.CategoricalQPolicy,
      "ActorPolicy": ap.ActorPolicy,
      "DeterministicActorPolicy": ap.DeterministicActorPolicy,
      "CEMPolicy": cp.CEMPolicy,
  }
  if kind not in leaf_classes:
    raise KeyError(f"Unknown policy type '{kind}' in saved manifest. "
                   f"Known: {sorted(leaf_classes) + sorted(wrapper_classes)}")
  network = net_registry.build_network(
      config["network"], time_step_spec.observation, action_spec)
  return leaf_classes[kind](time_step_spec, action_spec, network,
                            **config.get("kwargs", {}))
