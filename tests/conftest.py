"""Test configuration: force the JAX CPU backend with 8 virtual devices.

The container's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (a tunneled single real TPU chip). Unit tests must run
hermetically on host CPU, and the parallelism tests need an 8-device mesh.
Since jax is already imported by the time this conftest runs, the env-var
route is too late — but backends initialize lazily, so jax.config updates
still take effect as long as no array op has run yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it

jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the CPU backend, got " + jax.default_backend()
    )
    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices for mesh tests"
