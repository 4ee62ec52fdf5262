"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 regression: the driver imports the module and calls the function
directly (no __main__ block), in an environment whose sitecustomize forces
JAX_PLATFORMS to the TPU platform. The platform scrub must therefore live
inside dryrun_multichip itself (VERDICT.md round 1, Missing #1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, extra_env: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env.update(extra_env)
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=560)


def test_dryrun_direct_call_with_forced_platform_env():
    # Exactly the driver's shape: import the module, call the function,
    # with JAX_PLATFORMS pre-forced to a TPU platform name.
    proc = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')",
        {"JAX_PLATFORMS": "axon"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_dryrun_subprocess_fallback_when_jax_preinitialized():
    # If JAX is already initialised with the wrong device count, the
    # function must fall back to a scrubbed subprocess rather than fail.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_num_cpu_devices', 2); "
        "assert len(jax.devices()) == 2; "
        "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"
    )
    proc = _run(code, {"JAX_PLATFORMS": ""})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
