"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded kernels are
validated on host CPU devices and separately dry-run-compiled for TPU
meshes via __graft_entry__.dryrun_multichip.

Note: the 'axon' TPU-tunnel PJRT plugin in this image ignores the
JAX_PLATFORMS environment variable, so we must also force the platform
via jax.config.update after import.
"""

import hashlib
import os

import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _cpu_cache_dir() -> str:
    """Compile-cache dir keyed by the host CPU feature set.

    The box can be re-provisioned to a different CPU mid-project; AOT
    artifacts compiled for the old CPU then SIGILL/SIGSEGV on load
    (observed in the zstandard read path). Keying the dir by the cpuinfo
    flags makes a re-provision start from a clean cache instead.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha256(line.encode()).hexdigest()[:10]
                    return f"/root/.cache/jax_comp_cache_{tag}"
    except OSError:
        pass
    return "/root/.cache/jax_comp_cache"


# XLA compile time dominates the test suite (the limb-arithmetic graphs
# are large); persist compiled executables across runs.
jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


from proof_systems_tpu.utils.cache_hardening import harden as _harden_cache  # noqa: E402

_harden_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: compile-bound test skipped by default; enable with PST_HEAVY=1",
    )


def pytest_collection_modifyitems(config, items):
    """Fast default profile (reference Makefile:174-196 `--skip heavy`)."""
    if os.environ.get("PST_HEAVY") == "1":
        return
    skip = pytest.mark.skip(reason="heavy; set PST_HEAVY=1 to run")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
