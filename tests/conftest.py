"""Test configuration: force CPU with 8 virtual devices so the full suite —
including multi-device mesh/sharding tests — runs anywhere (reference
equivalent: dist_adapter's no-op fallback lets its checks run single-process).
"""

import os

# Must be set before jax is imported anywhere. The driver environment pins
# JAX_PLATFORMS=axon (a tunneled remote TPU with remote compilation) — tests
# must override it and run on local CPU with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize hook registers the remote-TPU backend in every
# process and pins it; override again post-import to be certain.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
