"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere (SURVEY §4.4).
"""

import os

# Force CPU: the shell env pins JAX_PLATFORMS to the real TPU ("axon"), and
# the interpreter imports jax at startup (sitecustomize), so env vars are too
# late — use config updates, which take effect before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses we may spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Compile cost dominates this suite (many small shapes); cache executables
# across runs so iterating on tests is fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
