"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere.

The original (driver-like) values are preserved in _ORIG_* env vars so that
subprocess tests can reproduce the DRIVER's environment — the round-2
VERDICT showed that masking JAX_PLATFORMS=cpu here hid a dryrun_multichip
failure that only manifests when the axon TPU plugin is the default backend.
"""

import os

# Preserve the pre-mask environment for driver-env subprocess tests.
if "_ORIG_JAX_PLATFORMS" not in os.environ:
    os.environ["_ORIG_JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS", "")

# Tests always run on the virtual CPU mesh, even when a TPU tunnel
# (JAX_PLATFORMS=axon) is configured in the environment.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin registers itself and becomes the default backend even
# with JAX_PLATFORMS=cpu (confirmed round 3: a pytest probe printed
# JAX_PLATFORMS=cpu but default_backend()=tpu, and FFT ops died with
# "UNIMPLEMENTED: TPU backend error" over the tunnel). Worse, while the
# dev tunnel is WEDGED (libtpu upgrades) merely *initializing* backends —
# jax.devices("cpu") included — blocks forever, which would hang the whole
# suite at this import. Drop the non-CPU backend factories before first
# init: registration happened in sitecustomize (interpreter start), but
# initialization is lazy, so popping here keeps the tunnel untouched.
# Tests that want the driver's TPU environment spawn subprocesses with
# _ORIG_JAX_PLATFORMS restored.
import jax  # noqa: E402  (env vars above must be set first)

# The env var alone is NOT enough: the plugin's register() (interpreter
# start, before this file) calls jax.config.update("jax_platforms",
# "axon,cpu"), which overrides the env. Re-assert cpu explicitly so
# backend init never touches the axon factory (and never the tunnel).
jax.config.update("jax_platforms", "cpu")

_cpu_devices = jax.devices("cpu")
jax.config.update("jax_default_device", _cpu_devices[0])
