"""Early pytest plugin (loaded via ``addopts = -p jafpro_test_sanitize``).

Imported during pytest plugin registration — BEFORE output capture starts —
so it can safely re-exec the test process with a sanitized environment.

Why: the build environment routes JAX through a remote-accelerator PJRT
plugin injected by a PYTHONPATH sitecustomize; it requires an exclusive
device tunnel and deadlocks CPU-only JAX.  Tests must run on plain host
CPU with a virtual 8-device mesh.
"""

import os
import sys

_SENTINEL = "JAFPRO_TESTS_SANITIZED"

if _SENTINEL not in os.environ:
    env = dict(os.environ)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    for k in list(env):
        if k.startswith(("AXON_", "PALLAS_AXON")):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    env[_SENTINEL] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
