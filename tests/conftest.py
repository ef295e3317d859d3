"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container boots every Python process with an `axon` TPU PJRT plugin
forced on via sitecustomize (PYTHONPATH=/root/.axon_site), which overrides
JAX_PLATFORMS before any test code runs.  To get the hermetic 8-virtual-device
CPU environment (SURVEY.md §4: interpret-mode kernels + mocked mesh), conftest
re-execs pytest once with that site hook stripped — after stopping pytest's
global fd capture so the new process inherits the real stdout/stderr.
Set FA_TPU_TEST_REAL=1 to run the suite against the real TPU chip instead.
"""

import os
import sys

_MARK = "FA_TPU_CONFTEST_REEXEC"


def _needs_reexec() -> bool:
    return (
        not os.environ.get("FA_TPU_TEST_REAL")
        and not os.environ.get(_MARK)
        and ".axon_site" in os.environ.get("PYTHONPATH", "")
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_MARK] = "1"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execvpe(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )


if not _needs_reexec() and not os.environ.get("FA_TPU_TEST_REAL"):
    # Clean environment (re-exec'd or launched outside the axon boot):
    # make sure the virtual CPU mesh is in place before jax initializes.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
