"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded kernels are
validated on host CPU devices and separately dry-run-compiled for TPU
meshes via __graft_entry__.dryrun_multichip.

Note: the 'axon' TPU-tunnel PJRT plugin in this image ignores the
JAX_PLATFORMS environment variable, so we must also force the platform
via jax.config.update after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA compile time dominates the test suite (the limb-arithmetic graphs
# are large); persist compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
