"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the reference's strategy-parameterized tests
(tf_agents/train/learner_test.py:46-69) which fabricate multi-device rigs on
one host; here we use XLA's host-platform device-count override so sharding
paths (pjit / shard_map over a Mesh) execute without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
