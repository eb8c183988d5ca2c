"""ctypes bindings for the native shared-memory observation ring.

See native/obsring.cpp for the design. The library is built on demand
(``make -C native``); if the shared object (or a compiler) is unavailable,
``ObservationRing.available()`` returns False and callers fall back to the
in-process driver path.

Typical use — sim workers produce, the driver batches:

    ring = ObservationRing.create("vlfm_obs", slot_bytes=obs_nbytes, n_slots=64)
    # in worker processes:
    ring_w = ObservationRing.open("vlfm_obs")
    ring_w.push(obs_record_bytes)
    # in the driver loop:
    records = ring.poll_batch(max_records=32)   # list[(ticket, bytes)]
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libobsring.so"
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.obsring_create.restype = ctypes.c_void_p
    lib.obsring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.obsring_open.restype = ctypes.c_void_p
    lib.obsring_open.argtypes = [ctypes.c_char_p]
    lib.obsring_slot_bytes.restype = ctypes.c_uint64
    lib.obsring_slot_bytes.argtypes = [ctypes.c_void_p]
    lib.obsring_n_slots.restype = ctypes.c_uint64
    lib.obsring_n_slots.argtypes = [ctypes.c_void_p]
    lib.obsring_push.restype = ctypes.c_int64
    lib.obsring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64]
    lib.obsring_poll.restype = ctypes.c_int64
    lib.obsring_poll.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_uint64,
    ]
    lib.obsring_close.restype = None
    lib.obsring_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class ObservationRing:
    def __init__(self, handle, lib, owner: bool):
        self._h = handle
        self._lib = lib
        self._owner = owner
        self._cursor = ctypes.c_uint64(0)
        self.slot_bytes = int(lib.obsring_slot_bytes(handle))
        self.n_slots = int(lib.obsring_n_slots(handle))

    @staticmethod
    def available() -> bool:
        return _load() is not None

    @classmethod
    def create(cls, name: str, slot_bytes: int, n_slots: int) -> "ObservationRing":
        lib = _load()
        if lib is None:
            raise RuntimeError("obsring native library unavailable")
        h = lib.obsring_create(name.encode(), slot_bytes, n_slots)
        if not h:
            raise RuntimeError(f"obsring_create({name}) failed")
        return cls(h, lib, owner=True)

    @classmethod
    def open(cls, name: str) -> "ObservationRing":
        lib = _load()
        if lib is None:
            raise RuntimeError("obsring native library unavailable")
        h = lib.obsring_open(name.encode())
        if not h:
            raise RuntimeError(f"obsring_open({name}) failed")
        return cls(h, lib, owner=False)

    def push(self, payload: bytes) -> int:
        t = self._lib.obsring_push(self._h, payload, len(payload))
        if t < 0:
            raise ValueError(
                f"payload of {len(payload)} bytes exceeds slot size {self.slot_bytes}"
            )
        return t

    def poll_batch(self, max_records: int = 64) -> List[Tuple[int, bytes]]:
        out = np.empty((max_records, self.slot_bytes), np.uint8)
        lens = (ctypes.c_uint64 * max_records)()
        tickets = (ctypes.c_uint64 * max_records)()
        n = self._lib.obsring_poll(
            self._h,
            ctypes.byref(self._cursor),
            out.ctypes.data_as(ctypes.c_void_p),
            lens,
            tickets,
            max_records,
        )
        return [
            (int(tickets[i]), out[i, : lens[i]].tobytes()) for i in range(int(n))
        ]

    def close(self) -> None:
        if self._h:
            self._lib.obsring_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
