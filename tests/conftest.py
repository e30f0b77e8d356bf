"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The CI/driver environment pre-registers a TPU backend via sitecustomize, so
plain env vars are not enough — we also flip jax's platform config and clear
any already-initialized backends before tests import anything jax-heavy.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend the sitecustomize may have initialized already
    import jax.extend.backend as _jb

    _jb.clear_backends()
except Exception:
    pass

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

# persistent compilation cache: repeat CI runs skip most XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/neuraloperator_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
