"""Root conftest: re-exec pytest with the axon TPU plugin fully disabled.

The environment's sitecustomize (loaded when PALLAS_AXON_POOL_IPS is set)
registers the axon PJRT plugin at interpreter start, which (a) pins the
process to the single TPU chip, breaking the 8-device virtual mesh tests,
(b) routes work through a remote relay that slows CPU compiles ~50x, and
(c) contends on that relay with any concurrently running training job —
two JAX processes attached to the relay starve each other. Merely
selecting JAX_PLATFORMS=cpu in-process is not enough: register() has
already dialed the relay by the time conftest runs. The only clean fix is
to re-exec the interpreter with PALLAS_AXON_POOL_IPS removed so
sitecustomize never registers anything.

The re-exec happens in pytest_configure (not at import time as an earlier
version did): by then pytest's FD-level capture has started, so we stop
global capturing first to restore the real stdout/stderr file descriptors
— otherwise the re-exec'd run inherits pytest's capture tempfiles and all
output is silently swallowed (exit codes stay correct, output vanishes).

Escape hatches:
  AGENTS_TPU_TESTS_ON_AXON=1  run tests on the real chip (single device;
                              mesh tests will fail or skip).
  Prefix `PALLAS_AXON_POOL_IPS= python -m pytest ...` yourself to skip
  the re-exec entirely (what CI and scripts should do).
"""
import os
import sys


def pytest_configure(config):
  if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    return
  if os.environ.get("AGENTS_TPU_TESTS_ON_AXON"):
    return
  env = dict(os.environ)
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["JAX_PLATFORMS"] = "cpu"
  flags = env.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    env["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
  cap = config.pluginmanager.getplugin("capturemanager")
  if cap is not None:
    try:
      cap.stop_global_capturing()
    except Exception:
      pass
  sys.stdout.flush()
  sys.stderr.flush()
  os.execvpe(sys.executable,
             [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
