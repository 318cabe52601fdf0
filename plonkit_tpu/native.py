"""ctypes bindings for the native BN254 host runtime (native/bn254.cpp).

Provides fast host-side pairing checks, Pippenger MSM and keccak-256.  The
library is built on demand (g++ is in the image); every entry point has a
pure-python fallback, so the package works without a toolchain."""

import ctypes
import logging
import os
import subprocess

log = logging.getLogger("plonkit_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbn254.so")

_lib = None
_tried = False


def _build():
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception as e:  # pragma: no cover
        log.debug("native build failed: %s", e)
        return False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        if lib.bn254_abi_version() != 1:
            return None
        lib.bn254_g1_msm.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.bn254_pairing_check.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int)]
        lib.bn254_keccak256.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p]
        _lib = lib
    except OSError as e:  # pragma: no cover
        log.debug("native load failed: %s", e)
        _lib = None
    return _lib


def _g1_bytes(p) -> bytes:
    if p is None:
        return b"\x00" * 64
    return p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")


def _g2_bytes(p) -> bytes:
    if p is None:
        return b"\x00" * 128
    (x0, x1), (y0, y1) = p
    return (x0.to_bytes(32, "little") + x1.to_bytes(32, "little")
            + y0.to_bytes(32, "little") + y1.to_bytes(32, "little"))


def pairing_check_native(pairs):
    """Native product-of-pairings check; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    g1 = b"".join(_g1_bytes(p1) for p1, _ in pairs)
    g2 = b"".join(_g2_bytes(p2) for _, p2 in pairs)
    res = ctypes.c_int(0)
    rc = lib.bn254_pairing_check(g1, g2, len(pairs), ctypes.byref(res))
    if rc != 0:
        return None
    return bool(res.value)


def msm_native(points, scalars):
    """Native Pippenger; returns False if the library is unavailable,
    otherwise the affine point (None = point at infinity)."""
    lib = get_lib()
    if lib is None:
        return False
    from .fields import FR_MODULUS
    pts = b"".join(_g1_bytes(p) for p in points)
    n = len(points)
    sc = list(scalars) + [0] * (n - len(scalars))
    sbytes = b"".join((s % FR_MODULUS).to_bytes(32, "little") for s in sc)
    out = ctypes.create_string_buffer(64)
    inf = ctypes.c_int(0)
    rc = lib.bn254_g1_msm(pts, sbytes, n, out, ctypes.byref(inf))
    if rc != 0:
        return False
    if inf.value:
        return None
    x = int.from_bytes(out.raw[:32], "little")
    y = int.from_bytes(out.raw[32:], "little")
    return (x, y)


def witness_eval_native(witness_bytes: bytes, n_wit: int, term_src,
                        term_coeff: bytes, prog_off, prog_const: bytes,
                        n_extras: int, wire_idx, n_cols: int, n_rows: int):
    """Native witness-plan evaluation + column gather
    (frontend/transpiler.WitnessPlan).  term_src/prog_off/wire_idx are
    int64 numpy arrays; returns the [n_cols * n_rows * 32] canonical LE
    column blob, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "bn254_witness_eval"):
        return None
    import numpy as np
    i64p = ctypes.POINTER(ctypes.c_longlong)
    out = ctypes.create_string_buffer(n_cols * n_rows * 32)
    rc = lib.bn254_witness_eval(
        witness_bytes, ctypes.c_longlong(n_wit),
        np.ascontiguousarray(term_src, dtype=np.int64)
          .ctypes.data_as(i64p),
        term_coeff,
        np.ascontiguousarray(prog_off, dtype=np.int64)
          .ctypes.data_as(i64p),
        prog_const, ctypes.c_longlong(n_extras),
        np.ascontiguousarray(wire_idx, dtype=np.int64)
          .ctypes.data_as(i64p),
        ctypes.c_longlong(n_cols), ctypes.c_longlong(n_rows), out)
    if rc != 0:
        return None
    return out.raw


def keccak256_native(data: bytes):
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.bn254_keccak256(data, len(data), out)
    return out.raw
