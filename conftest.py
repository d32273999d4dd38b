"""Root conftest: re-exec pytest with the axon TPU plugin disabled.

The environment's sitecustomize (loaded when PALLAS_AXON_POOL_IPS is set)
registers the axon PJRT plugin at interpreter start, which (a) pins the
process to 1 CPU device, breaking the 8-device virtual mesh tests, and
(b) routes work through a remote relay that slows CPU compiles ~50x.
This runs at pytest's earliest conftest stage (before output capture), so
the re-exec'd run prints normally.
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS"):
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  flags = env.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
  os.execvpe(sys.executable,
             [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
