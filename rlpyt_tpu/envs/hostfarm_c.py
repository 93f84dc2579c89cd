"""ctypes loader + sync objects for the C host-farm data plane
(csrc/hostfarm.c).  See that file for the protocol; this module builds
the shared library on first use (cc -O2 -shared -fPIC), caches it next
to the package, and exposes master/worker halves of the barrier that
are picklable across ``spawn`` (each process re-opens the library and
re-views the shared control block).

Falls back cleanly: ``get_lib()`` returns None when no compiler / not
Linux, and SharedMemVecEnv keeps its multiprocessing.Event path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_failed = False

CTRL_SLOTS_BASE = 32
CTRL_SLOTS_PER_WORKER = 16
# Spin-before-sleep only pays when every worker (plus the master) has a
# dedicated core — set RLPYT_TPU_FARM_SPIN≈20000 on pinned many-core env
# hosts.  Default 0 (straight futex sleep) is robust under
# oversubscription: measured 2.6x faster than the mp.Event path either
# way on a 2-core box (145 vs 376 µs/step, 4 workers).
DEFAULT_SPIN = int(os.environ.get("RLPYT_TPU_FARM_SPIN", "0"))


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "hostfarm.c")


def _build(src: str, out: str) -> bool:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O2", "-shared", "-fPIC", "-o", out, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=60)
        return True
    except Exception:
        return False


def get_lib():
    """Build (once) + load the hostfarm library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not sys.platform.startswith("linux"):
            _lib_failed = True
            return None
        src = _source_path()
        if not os.path.exists(src):
            _lib_failed = True
            return None
        cache = os.path.join(tempfile.gettempdir(),
                             f"rlpyt_tpu_hostfarm_{os.getuid()}.so")
        if not os.path.exists(cache) or (
                os.path.getmtime(cache) < os.path.getmtime(src)):
            tmp = cache + f".build{os.getpid()}"
            if not _build(src, tmp):
                _lib_failed = True
                return None
            os.replace(tmp, cache)
        try:
            lib = ctypes.CDLL(cache)
        except OSError:
            _lib_failed = True
            return None
        u32p = ctypes.c_void_p
        lib.hf_master_signal.argtypes = [u32p, ctypes.c_uint32]
        lib.hf_master_wait.argtypes = [u32p, ctypes.c_int, ctypes.c_uint32,
                                       ctypes.c_int]
        lib.hf_worker_wait.argtypes = [u32p, ctypes.c_uint32, ctypes.c_int]
        lib.hf_worker_wait.restype = ctypes.c_uint32
        lib.hf_worker_post.argtypes = [u32p, ctypes.c_int, ctypes.c_uint32]
        lib.hf_read_cmd.argtypes = [u32p]
        lib.hf_read_cmd.restype = ctypes.c_uint32
        _lib = lib
        return _lib


class CFarmMaster:
    """Master half: one signal+wait per env step (one C call each)."""

    def __init__(self, ctrl_spec, n_workers: int, spin: int = DEFAULT_SPIN):
        self._spec = ctrl_spec       # _ShmSpec over uint32 slots
        self.n_workers = n_workers
        self.spin = spin
        self._seq = 0
        self._ptr = None

    def _ensure(self):
        if self._ptr is None:
            view = self._spec.view()
            self._ptr = view.ctypes.data_as(ctypes.c_void_p)
            self._view = view               # keep the buffer alive
            self._lib = get_lib()
        return self._lib

    def signal(self, cmd: int):
        lib = self._ensure()
        self._seq += 1
        lib.hf_master_signal(self._ptr, cmd)

    def wait(self):
        lib = self._ensure()
        lib.hf_master_wait(self._ptr, self.n_workers, self._seq, self.spin)


class CFarmWorker:
    """Worker half (picklable; rebuilds lib + view after spawn)."""

    def __init__(self, ctrl_spec, w: int, spin: int = DEFAULT_SPIN):
        self._spec = ctrl_spec
        self.w = w
        self.spin = spin
        self._seq = 0
        self._ptr = None

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_ptr"] = None
        d.pop("_view", None)
        d.pop("_lib", None)
        return d

    def _ensure(self):
        if self._ptr is None:
            view = self._spec.view()
            self._ptr = view.ctypes.data_as(ctypes.c_void_p)
            self._view = view
            self._lib = get_lib()
        return self._lib

    def wait(self) -> int:
        """Block for the next master signal; returns the command word."""
        lib = self._ensure()
        self._seq = int(lib.hf_worker_wait(self._ptr, self._seq, self.spin))
        return int(lib.hf_read_cmd(self._ptr))

    def post(self):
        lib = self._ensure()
        lib.hf_worker_post(self._ptr, self.w, self._seq)
