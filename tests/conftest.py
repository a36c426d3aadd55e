"""Test configuration: force CPU with 8 virtual devices so sharding logic is
exercised without TPU hardware (SURVEY.md §4d)."""

import os

# The image's sitecustomize (/root/.axon_site) registers the axon TPU PJRT
# plugin and rewrites jax_platforms to "axon,cpu" no matter what the env
# says, so the env var alone is not enough — override the config after
# import, before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.device_count() == 8, (
    f"tests need 8 virtual CPU devices, got {jax.devices()}"
)
