"""ctypes loader for the native BCn decode oracle (csrc/).

Auto-builds the shared library on first use (g++ is in the image; no pip
deps). The native decoder is an INDEPENDENT from-spec implementation used by
tests to cross-check the JAX decoders — a shared spec misunderstanding
between JAX encoder and JAX decoder cannot survive both oracles.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SO = os.path.join(_DIR, "libbcn_decode.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO):
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    for name, args in (
            ("decode_bc1", (u8p, u8p, ctypes.c_int, ctypes.c_int)),
            ("decode_bc2", (u8p, u8p, ctypes.c_int)),
            ("decode_bc3", (u8p, u8p, ctypes.c_int)),
            ("decode_bc4", (u8p, u8p, ctypes.c_int)),
            ("decode_bc5", (u8p, u8p, ctypes.c_int)),
            ("decode_bc7", (u8p, u8p, ctypes.c_int)),
            ("decode_bc6h", (u8p, u16p, ctypes.c_int, ctypes.c_int))):
        fn = getattr(lib, name)
        fn.argtypes = args
        fn.restype = None
    return lib


def _as_bytes(words) -> np.ndarray:
    w = np.ascontiguousarray(np.asarray(words), dtype="<u4")
    return w.view(np.uint8).reshape(w.shape[0], -1)


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_bc1(words, force_four: bool = False) -> np.ndarray:
    """(N,2) uint32 -> (N,16,4) uint8 RGBA via the native oracle."""
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 4), np.uint8)
    _lib().decode_bc1(_u8p(blk), _u8p(out), n, int(force_four))
    return out


def decode_bc2(words) -> np.ndarray:
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 4), np.uint8)
    _lib().decode_bc2(_u8p(blk), _u8p(out), n)
    return out


def decode_bc3(words) -> np.ndarray:
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 4), np.uint8)
    _lib().decode_bc3(_u8p(blk), _u8p(out), n)
    return out


def decode_bc4(words) -> np.ndarray:
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16), np.uint8)
    _lib().decode_bc4(_u8p(blk), _u8p(out), n)
    return out


def decode_bc5(words) -> np.ndarray:
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 2), np.uint8)
    _lib().decode_bc5(_u8p(blk), _u8p(out), n)
    return out


def decode_bc7(words) -> np.ndarray:
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 4), np.uint8)
    _lib().decode_bc7(_u8p(blk), _u8p(out), n)
    return out


def decode_bc6h(words, signed: bool = False) -> np.ndarray:
    """(N,4) uint32 -> (N,16,3) uint16 half-bit patterns."""
    blk = _as_bytes(words)
    n = blk.shape[0]
    out = np.empty((n, 16, 3), np.uint16)
    _lib().decode_bc6h(
        _u8p(blk), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        n, int(signed))
    return out
