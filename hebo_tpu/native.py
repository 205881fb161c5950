"""ctypes bindings + on-demand build for the native runtime components.

Components (native/src/):
  * ``libhebo_native.so`` — threaded subprocess evaluation pool
    (eval_pool.cpp): parallel black-box fan-out replacing the reference's
    multiprocessing actors (AntBO/genetic_algorithm/actor.py).
  * ``aig_opt`` — AIG logic-optimization task executable (aig_opt.cpp):
    the counterpart of the reference's MIG task executable
    (MCBO/mcbo/tasks/mig_seq_opt/mig_task_executable_source_code.cpp).

The build is `make` in native/ (g++ only); artifacts land in
native/build/ and are built lazily on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

__all__ = ["ensure_built", "run_commands", "aig_opt_path", "EvalPool"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")
_LIB = None


def ensure_built() -> None:
    lib = os.path.join(_BUILD_DIR, "libhebo_native.so")
    exe = os.path.join(_BUILD_DIR, "aig_opt")
    if os.path.exists(lib) and os.path.exists(exe):
        return
    subprocess.run(
        ["make", "-C", _NATIVE_DIR, "-j2"],
        check=True,
        capture_output=True,
    )


def _load():
    global _LIB
    if _LIB is None:
        ensure_built()
        _LIB = ctypes.CDLL(os.path.join(_BUILD_DIR, "libhebo_native.so"))
        _LIB.hn_run_commands.restype = ctypes.c_int
        _LIB.hn_run_commands.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_long,
        ]
        assert _LIB.hn_version() >= 10
    return _LIB


def aig_opt_path() -> str:
    ensure_built()
    return os.path.join(_BUILD_DIR, "aig_opt")


def run_commands(
    commands: Sequence[str],
    n_threads: int = 0,
    timeout_ms: int = 0,
    out_capacity: int = 65536,
) -> List[Tuple[int, str]]:
    """Run shell commands in the native thread pool; returns
    [(exit_code, stdout), ...] in input order."""
    lib = _load()
    n = len(commands)
    if n == 0:
        return []
    arr = (ctypes.c_char_p * n)(*[c.encode() for c in commands])
    codes = (ctypes.c_int * n)()
    buf = ctypes.create_string_buffer(n * out_capacity)
    lib.hn_run_commands(
        arr, n, n_threads, timeout_ms, codes, buf, out_capacity
    )
    out = []
    for i in range(n):
        raw = ctypes.string_at(
            ctypes.addressof(buf) + i * out_capacity
        )
        out.append((codes[i], raw.decode(errors="replace")))
    return out


class EvalPool:
    """Black-box fan-out helper: map a command template over points."""

    def __init__(self, n_threads: int = 0):
        self.n_threads = n_threads

    def map(self, commands: Sequence[str]) -> List[Tuple[int, str]]:
        return run_commands(commands, n_threads=self.n_threads)
