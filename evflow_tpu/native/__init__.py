"""ctypes bindings for the native evio runtime (evio.cpp).

Builds lazily with g++ on first import; every entry point has a pure-Python
fallback so the engine works without a toolchain. `available()` reports which
path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "evio.cpp")
_LIB = os.path.join(_HERE, "libevio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.evio_load_csv.restype = ctypes.c_int64
            lib.evio_analyze_coordinates.restype = ctypes.c_int64
            lib.evio_decode_evt3.restype = ctypes.c_int64
            lib.evio_decode_evt2.restype = ctypes.c_int64
            lib.evio_decode_evt21.restype = ctypes.c_int64
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def load_csv(path: str, capacity: int = 1 << 24):
    """Fast CSV event parse → (x, y, t, p) numpy arrays, or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    xs = np.empty(capacity, np.int32)
    ys = np.empty(capacity, np.int32)
    ts = np.empty(capacity, np.int64)
    ps = np.empty(capacity, np.int32)
    n = lib.evio_load_csv(
        path.encode(), xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(capacity))
    if n < 0:
        raise FileNotFoundError(path)
    return xs[:n].copy(), ys[:n].copy(), ts[:n].copy(), ps[:n].copy()


def decode_evt3(payload: bytes, capacity: int | None = None):
    """Native EVT3 payload decode → (x, y, t, p) arrays, or None on fallback.

    capacity defaults to the exact event count: single-event words plus the
    popcount of the vector words' validity masks."""
    lib = _load()
    if lib is None:
        return None
    if len(payload) % 2:
        payload = payload[:-1]
    if capacity is None:
        w = np.frombuffer(payload, dtype="<u2")
        typ = w >> 12
        vec = (typ == 0x4) | (typ == 0x5)
        # exact bound: singles + set mask bits of vector words
        capacity = int(np.sum(typ == 0x2)) + int(
            np.sum(np.unpackbits(
                (w[vec] & 0xFFF).astype(">u2").view(np.uint8))))
    xs = np.empty(capacity, np.int32)
    ys = np.empty(capacity, np.int32)
    ts = np.empty(capacity, np.int64)
    ps = np.empty(capacity, np.int32)
    n = lib.evio_decode_evt3(
        payload, ctypes.c_int64(len(payload)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(capacity))
    return xs[:n].copy(), ys[:n].copy(), ts[:n].copy(), ps[:n].copy()


def decode_evt2(payload: bytes):
    """Native EVT2 payload decode → (x, y, t, p) arrays, or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    payload = payload[:len(payload) - len(payload) % 4]
    w = np.frombuffer(payload, dtype="<u4")
    capacity = int(np.sum((w >> 28) <= 1))
    xs = np.empty(capacity, np.int32)
    ys = np.empty(capacity, np.int32)
    ts = np.empty(capacity, np.int64)
    ps = np.empty(capacity, np.int32)
    n = lib.evio_decode_evt2(
        payload, ctypes.c_int64(len(payload)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(capacity))
    return xs[:n].copy(), ys[:n].copy(), ts[:n].copy(), ps[:n].copy()


def decode_evt21(payload: bytes, swapped_halves: bool = False):
    """Native EVT2.1 payload decode → (x, y, t, p), or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    payload = payload[:len(payload) - len(payload) % 8]
    w = np.frombuffer(payload, dtype="<u8")
    if swapped_halves:
        w = (w << np.uint64(32)) | (w >> np.uint64(32))
    cd = w[(w >> np.uint64(60)) <= 1]
    capacity = int(np.sum(np.unpackbits(
        (cd & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.uint8))))
    xs = np.empty(max(capacity, 1), np.int32)
    ys = np.empty(max(capacity, 1), np.int32)
    ts = np.empty(max(capacity, 1), np.int64)
    ps = np.empty(max(capacity, 1), np.int32)
    n = lib.evio_decode_evt21(
        payload, ctypes.c_int64(len(payload)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ps.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(capacity), ctypes.c_int32(int(swapped_halves)))
    return xs[:n].copy(), ys[:n].copy(), ts[:n].copy(), ps[:n].copy()


def optics_sweep(nbr_idx: np.ndarray, nbr_dist: np.ndarray,
                 core_dist: np.ndarray):
    """Native OPTICS seed-queue sweep. Returns (order, reach) or None."""
    lib = _load()
    if lib is None:
        return None
    n, k = nbr_idx.shape
    nbr_idx = np.ascontiguousarray(nbr_idx, np.int32)
    nbr_dist = np.ascontiguousarray(nbr_dist, np.float64)
    core = np.ascontiguousarray(core_dist, np.float64)
    order = np.empty(n, np.int64)
    reach = np.empty(n, np.float64)
    lib.optics_sweep(
        ctypes.c_int64(n), ctypes.c_int64(k),
        nbr_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nbr_dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        core.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        reach.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return order, reach


def analyze_coordinates(xs: np.ndarray, ys: np.ndarray):
    """Exact unique-coordinate analysis (CPU dedup oracle). None on fallback."""
    lib = _load()
    if lib is None:
        return None
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    n = len(xs)
    ux = np.empty(n, np.int32)
    uy = np.empty(n, np.int32)
    cnt = lib.evio_analyze_coordinates(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n),
        ux.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        uy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return ux[:cnt].copy(), uy[:cnt].copy()
