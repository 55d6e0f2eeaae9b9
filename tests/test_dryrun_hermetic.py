"""The driver's multi-chip dryrun must be hermetic to TPU-side state.

Round 4's ``MULTICHIP_r04.json`` went red because ``dryrun_multichip``
initialised the default (TPU) backend before selecting virtual CPU
devices, and a libtpu client/terminal version skew killed the first
``device_put`` that landed there.  The dryrun's contract is a virtual CPU
mesh: it must complete even when the TPU platform is poisoned or absent.

This test runs the dryrun in a CHILD process whose environment actively
sabotages the default platform (``JAX_PLATFORMS`` pointing at backends
that do not exist / would crash on init).  A hermetic dryrun never
consults the default backend, so the poison is never evaluated.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_dryrun(extra_env: dict, n: int = 2) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # scrub any harness-provided platform pins so the poison is in charge
    env.pop("XLA_FLAGS", None)
    env.update(extra_env)
    code = (f"import __graft_entry__ as g; g.dryrun_multichip({n}); "
            "print('HERMETIC_OK')")
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1800)


@pytest.mark.parametrize("poison", [
    # a platform name that does not exist: any backend-init attempt on the
    # DEFAULT platform raises immediately
    {"JAX_PLATFORMS": "nonexistent_tpu"},
    # the r4 failure shape: default platform claims to be TPU but no
    # working TPU client can come up in this CI environment
    {"JAX_PLATFORMS": "tpu"},
])
def test_dryrun_survives_poisoned_default_platform(poison):
    r = _run_dryrun(poison)
    assert r.returncode == 0, (
        f"dryrun died under poison {poison}:\n--- stdout ---\n{r.stdout}"
        f"\n--- stderr ---\n{r.stderr[-4000:]}")
    assert "HERMETIC_OK" in r.stdout


def test_dryrun_disables_compile_cache():
    """AOT cache artifacts are what a libtpu roll poisons — the dryrun must
    neither read nor write the persistent compile cache."""
    code = (
        "import __graft_entry__ as g, jax, os\n"
        "g.dryrun_multichip(2)\n"
        "assert os.environ.get('SDV_COMPILE_CACHE') == '0'\n"
        "assert not jax.config.jax_compilation_cache_dir, "
        "jax.config.jax_compilation_cache_dir\n"
        "print('NO_CACHE_OK')\n")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("SDV_COMPILE_CACHE", None)
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "NO_CACHE_OK" in r.stdout
