"""EDM_PLATFORM override (utils/platform.py): the axon TPU plugin ignores
``JAX_PLATFORMS`` in the environment, so every CLI entry calls
``apply_platform_env()`` before any computation. Verified in a subprocess
(platform choice latches at backend init, so it can't be tested in-process
on top of conftest's own override)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_apply_platform_env_forces_cpu():
    code = (
        "from edm_tts_tpu.utils.platform import apply_platform_env\n"
        "applied = apply_platform_env()\n"
        "import jax\n"
        "assert applied == 'cpu', applied\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "print('ok')\n"
    )
    env = dict(os.environ, EDM_PLATFORM="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout


def test_apply_platform_env_noop_when_unset():
    code = (
        "import os\n"
        "os.environ.pop('EDM_PLATFORM', None)\n"
        "from edm_tts_tpu.utils.platform import apply_platform_env\n"
        "assert apply_platform_env() is None\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ok" in out.stdout
