"""Test configuration: force a virtual 8-device CPU platform for JAX.

The axon TPU plugin resolves the platform at interpreter startup, so
setting env vars inside this process is too late — when the platform
is wrong we re-exec pytest once with the corrected environment.
"""

import os
import sys

_WANT = {
    "JAX_PLATFORM_NAME": "cpu",
    "JAX_PLATFORMS": "cpu",
    # optimization_level=0: XLA:CPU takes minutes at the default level
    # on the long integer-lifting chains; tests don't need it.
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8"
                 " --xla_backend_optimization_level=0",
}

def _restore_stdio():
    """Point fds 1/2 back at the original pipes/tty: pytest's fd
    capture has already swapped them for temp files, which would
    swallow the re-exec'd run's output."""
    import stat

    cands = []
    try:
        for name in os.listdir("/proc/self/fd"):
            fd = int(name)
            if fd <= 2:
                continue
            try:
                st = os.fstat(fd)
            except OSError:
                continue
            if stat.S_ISFIFO(st.st_mode) or os.isatty(fd):
                cands.append(fd)
    except OSError:
        return
    cands.sort()
    if cands:
        os.dup2(cands[0], 1)
        os.dup2(cands[1] if len(cands) > 1 else cands[0], 2)


if (os.environ.get("_DTPU_TEST_REEXEC") != "1"
        and os.environ.get("JAX_PLATFORM_NAME") != "cpu"):
    env = dict(os.environ)
    env.update(_WANT)
    env["_DTPU_TEST_REEXEC"] = "1"
    _restore_stdio()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.update(_WANT)
