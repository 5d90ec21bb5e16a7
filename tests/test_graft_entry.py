"""Tests for __graft_entry__ — the one interface the driver executes.

Covers: entry() compiles and runs under jit; dryrun_multichip runs
in-process when enough devices exist; and the self-bootstrap path spawns a
scrubbed-CPU subprocess when the ambient process is device-starved (the
exact situation of the driver's pinned 1-chip axon env, which produced
MULTICHIP_r01.json ok:false).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (2, 16)
    assert np.all(out >= 0) and np.all(out <= 1)


def test_dryrun_multichip_in_process(capsys):
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    graft.dryrun_multichip(8)
    assert "dryrun_multichip(8) ok" in capsys.readouterr().out


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_when_device_starved():
    """Driver scenario: ambient process has 1 device, asks for 4."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax, __graft_entry__ as g; "
         "assert len(jax.devices()) == 1; "
         "g.dryrun_multichip(4)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "dryrun_multichip(4) ok" in proc.stdout


def test_clean_cpu_env_scrubs_axon():
    env = graft._clean_cpu_env(6)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=6" in env["XLA_FLAGS"]
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert all("axon" not in p for p in env["PYTHONPATH"].split(os.pathsep))
    assert REPO in env["PYTHONPATH"].split(os.pathsep)
