"""Repo-root pytest bootstrap.

The container's sitecustomize registers the single-chip `axon` TPU backend at
interpreter startup, *before* pytest imports any conftest, so the usual trick
of setting JAX_PLATFORMS inside conftest is too late.  The test suite needs an
8-device virtual CPU mesh (SURVEY.md §4: multi-chip tests via
`--xla_force_host_platform_device_count=8`), so if the process was started
with the TPU backend we re-exec pytest once with the right environment.
"""

import os
import sys

_REEXEC_FLAG = "CTDB_TESTS_REEXEC"


def _want_reexec() -> bool:
    if os.environ.get(_REEXEC_FLAG) == "1":
        return False
    # Already configured for CPU spoofing (e.g. CI that sets env itself).
    if (
        os.environ.get("JAX_PLATFORMS") == "cpu"
        and not os.environ.get("PALLAS_AXON_POOL_IPS")
        and "--xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
    ):
        return False
    return True


if _want_reexec():
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin registration
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    # Tests run with the loud out-of-vocab guard on (models/transformer.py):
    # embedding gathers use mode="clip" in production, which would silently
    # clamp a bad token id.
    env.setdefault("CTDB_CHECK_VOCAB", "1")
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest"] + sys.argv[1:],
        env,
    )
