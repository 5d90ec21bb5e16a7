"""pytest plugin: re-exec the test run in a clean environment.

Loaded via ``addopts = -p vae_tagger_tpu._pytest_clean_env`` in pytest.ini.
``-p`` plugins are imported during option preparsing — *before* the capture
plugin starts fd-level capture — so a re-exec here keeps the real stdout
(a conftest-based re-exec would write all output into a captured temp file).

Why re-exec at all: the host injects the 'axon' TPU PJRT plugin into every
python process via a sitecustomize on PYTHONPATH and routes XLA compilation
through a remote service with seconds-to-minutes of latency per program.
Tests must run on the fast local CPU backend (8 virtual devices for sharding
tests); the real TPU chip is reserved for bench.py.
"""

import os
import sys

_REEXEC_MARKER = "VAE_TAGGER_TESTS_CLEAN"

if os.environ.get("PALLAS_AXON_POOL_IPS") and _REEXEC_MARKER not in os.environ:
    env = dict(os.environ)
    env[_REEXEC_MARKER] = "1"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
