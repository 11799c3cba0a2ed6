"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The production target is TPU; tests validate numerics and sharding on CPU with
`--xla_force_host_platform_device_count=8` so multi-chip code paths (pjit /
shard_map over a Mesh) execute without TPU hardware. The axon sitecustomize
pins `jax_platforms` to the TPU plugin, so we override via jax.config here
(env vars alone are ignored — see /root/.axon_site/sitecustomize.py behavior).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the big jitted programs (tracking step, BA)
# take minutes to compile on the 2-core CI host; cache them across runs.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Make the repo root importable when pytest is run from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
