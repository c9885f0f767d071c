"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Two things conspire against a plain ``JAX_PLATFORMS=cpu``:

* this machine's TPU is attached through the `axon` PJRT plugin, whose
  sitecustomize registers at interpreter start and force-updates
  ``jax_platforms='axon,cpu'`` — overriding the env var; and
* the single TPU chip is exclusive — if the test process grabbed it, every
  eval subprocess would block on the device lock.

So: pin XLA_FLAGS for the virtual 8-device CPU mesh before any backend
initializes, then override jax_platforms at config level (the backends are
not initialized yet at conftest import time).  Eval subprocesses get CPU by
a different route — the sandbox strips PALLAS_AXON_POOL_IPS from their env so
the axon plugin never registers there (see evalkit/sandbox.py).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# children spawned by tests (eval subprocesses) must not register axon either
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
