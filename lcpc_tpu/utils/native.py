"""Loader for the native C runtime library (ctypes), with auto-build.

The C library provides the production transcript (Keccak-f/STROBE/merlin);
the pure-Python implementation in lcpc_tpu.fs stays as the bit-exact twin
and fallback.  Set LCPC_NO_NATIVE=1 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "lcpc_native.c")
_SO = os.path.join(_REPO, "native", "liblcpc_native.so")

_lib = None
_tried = False


def _build() -> bool:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
                timeout=120,
            )
            return True
        except (subprocess.SubprocessError, FileNotFoundError):
            continue
    return False


def get_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("LCPC_NO_NATIVE"):
        return None
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    p = ctypes.c_void_p  # accepts ints (numpy .ctypes.data) and ctypes bufs
    lib.lcpc_strobe_init.argtypes = [p, p, ctypes.c_size_t]
    lib.lcpc_strobe_meta_ad.argtypes = [p, p, ctypes.c_size_t, ctypes.c_int]
    lib.lcpc_strobe_ad.argtypes = [p, p, ctypes.c_size_t, ctypes.c_int]
    lib.lcpc_strobe_prf.argtypes = [p, p, ctypes.c_size_t]
    lib.lcpc_transcript_append.argtypes = [
        p, p, ctypes.c_size_t, p, ctypes.c_size_t
    ]
    lib.lcpc_transcript_append_batch.argtypes = [
        p, p, ctypes.c_size_t, p, ctypes.c_size_t, ctypes.c_size_t,
    ]
    lib.lcpc_transcript_challenge.argtypes = [p, p, ctypes.c_size_t, p,
                                              ctypes.c_size_t]
    u64 = ctypes.c_uint64
    lib.lcpc_rng_init.argtypes = [p, p, u64]
    lib.lcpc_gen_code.argtypes = [p, u64, u64, u64, p, ctypes.c_int, u64,
                                  p, p]
    _lib = lib
    return _lib


RNG_STATE_BYTES = 320  # sizeof(lcpc_rng_t), padded
