"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPUs by forcing the CPU
platform with 8 host devices (the driver separately dry-runs the multichip
path the same way).  x64 is enabled so float64 reference-parity tests are
meaningful; library code always uses explicit dtypes and is unaffected.
"""
import os
import sys

# Hard-set (not setdefault): the host environment pins JAX_PLATFORMS=axon
# (the TPU tunnel) and /root/.axon_site re-applies it at interpreter startup.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize initializes jax's backend selection before this file
# runs; the config update (re-read after import) is what actually sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persist compiled programs across test runs (single-core host; the CPU
# compiles are a large share of suite wall-clock).  enable_compile_cache
# also patches the cache's writes to be atomic — the suite segfaulted twice
# deserializing an entry a concurrent bench was mid-writing.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from vican_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache(_REPO)
