"""Native (C++) components, built on demand with g++ and loaded via ctypes.

The framework's compute core is JAX/Pallas; these cover the host-side
native slots the reference fills with C/Rust (SURVEY.md §2.3): the
Keccak-f[1600] transcript permutation and the OT-extension bit-matrix
transpose.  Pure-Python fallbacks keep everything working without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native.cpp")
_LIB = os.path.join(_HERE, "libcrypto_tpu_native.so")

_lib = None
_tried = False


def _build() -> bool:
    # build to a process-unique temp path, then os.replace (atomic): several
    # test workers (pytest-xdist) may race to build the same library
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib():
    """The loaded shared library, or None if unavailable (or disabled via
    CRYPTO_TPU_DISABLE_NATIVE=1 — the CI fallback-matrix axis)."""
    global _lib, _tried
    if os.environ.get("CRYPTO_TPU_DISABLE_NATIVE"):
        return None
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or \
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
        lib.keccak_f1600.argtypes = [ctypes.c_char_p]
        lib.bit_transpose.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def keccak_f1600_native(state: bytearray) -> bool:
    """In-place permutation via C++; returns False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    buf = ctypes.create_string_buffer(bytes(state), 200)
    lib.keccak_f1600(buf)
    state[:] = buf.raw[:200]
    return True


def bit_transpose_native(matrix, rows: int, cols: int):
    """numpy-packed bit matrix transpose; returns None if unavailable."""
    import numpy as np
    lib = get_lib()
    if lib is None or rows % 8 or cols % 8:
        return None
    packed = np.packbits(matrix, axis=1).tobytes()
    out = ctypes.create_string_buffer(cols * (rows // 8))
    lib.bit_transpose(packed, out, rows, cols)
    arr = np.frombuffer(out.raw, dtype=np.uint8).reshape(cols, rows // 8)
    return np.unpackbits(arr, axis=1)[:, :rows]


# ---------------------------------------------------------------------------
# WASM interpreter (circom witness generation, SURVEY.md §2.3 item 2)
# ---------------------------------------------------------------------------

_WASM_SRC = os.path.join(_HERE, "wasm_interp.cpp")
_WASM_LIB = os.path.join(_HERE, "libcrypto_tpu_wasm.so")
_wasm_lib = None
_wasm_tried = False


def get_wasm_lib():
    """The WASM interpreter shared library, or None if unavailable."""
    global _wasm_lib, _wasm_tried
    if _wasm_lib is not None or _wasm_tried:
        return _wasm_lib
    _wasm_tried = True
    if not os.path.exists(_WASM_LIB) or \
            os.path.getmtime(_WASM_LIB) < os.path.getmtime(_WASM_SRC):
        tmp = f"{_WASM_LIB}.{os.getpid()}.tmp"
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                 "-o", tmp, _WASM_SRC],
                check=True, capture_output=True, timeout=180)
            os.replace(tmp, _WASM_LIB)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(_WASM_LIB)
        lib.wasm_load.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_char_p, ctypes.c_int]
        lib.wasm_load.restype = ctypes.c_void_p
        lib.wasm_call.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.wasm_call.restype = ctypes.c_int
        lib.wasm_last_error.argtypes = [ctypes.c_void_p]
        lib.wasm_last_error.restype = ctypes.c_char_p
        lib.wasm_free.argtypes = [ctypes.c_void_p]
        _wasm_lib = lib
    except Exception:
        _wasm_lib = None
    return _wasm_lib
