"""Test harness: run everything on 8 virtual CPU devices so mesh/collective
logic is exercised without a TPU pod (SURVEY.md §4.6). Must set env before
the first jax import anywhere in the test process."""

import os

# Force-override: the host env pins JAX_PLATFORMS=axon (the remote TPU
# tunnel); tests must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize's register() overrides jax_platforms to "axon,cpu"
# via jax.config (so the env var alone is not enough); force CPU back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
