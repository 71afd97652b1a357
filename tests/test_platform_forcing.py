"""The package honors platform forcing in this image's env (subprocess tests).

The axon TPU plugin prepends itself to ``jax_platforms`` at jax-import time
(env ``JAX_PLATFORMS=cpu`` still yields config ``'axon,cpu'`` → TPU first),
so CLI invocations forcing CPU used to hang on a downed chip tunnel, and
``posegen_tpu.__init__``'s re-assertion used to clobber an application's own
``jax.config.update("jax_platforms", ...)``. Each scenario runs in a fresh
subprocess because platform choice is process-global.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")}
    env.update(env_overrides)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_env_platforms_cpu_forces_cpu_backend():
    out = _run(
        "import posegen_tpu, jax; print(jax.devices()[0].platform);"
        "print(jax.process_index())",
        {"JAX_PLATFORMS": "cpu"},
    )
    assert out.splitlines() == ["cpu", "0"]


def test_legacy_platform_name_forces_cpu_backend():
    # JAX_PLATFORM_NAME alone (no JAX_PLATFORMS in the env) must also work
    out = _run(
        "import posegen_tpu, jax; print(jax.devices()[0].platform)",
        {"JAX_PLATFORM_NAME": "cpu"},
    )
    assert out.strip() == "cpu"


def test_app_level_config_update_is_not_clobbered():
    # an application that chose its platform via jax.config BEFORE importing
    # posegen_tpu keeps its choice even when the env asks for something else
    out = _run(
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import posegen_tpu; print(jax.config.jax_platforms);"
        "print(jax.devices()[0].platform)",
        {"JAX_PLATFORMS": "axon"},
    )
    assert out.splitlines() == ["cpu", "cpu"]
