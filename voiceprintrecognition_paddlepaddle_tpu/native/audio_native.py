"""ctypes bindings for the C++ audio I/O library (``audioio.cpp``).

The shared library is built lazily with g++ on first use and cached next
to the source; every entry point has a pure-Python fallback in
``ops.audio``, so the package works even without a compiler. Set
``VPR_TPU_NO_NATIVE=1`` to force the Python path.
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

from ..utils.logger import logger

__all__ = ["native_available", "decode_wav_native", "resample_native",
           "rms_db_native", "load_batch_native"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audioio.cpp")
_LIB_PATH = os.path.join(_HERE, "libaudioio.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash():
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build():
    cmd = ["g++", "-O3", "-ffast-math", "-funroll-loops", "-pthread",
           "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception as e:
        logger.warning(f"native audioio build failed ({e}); "
                       f"using the Python decode path")
        return False
    try:
        # the hash only gates rebuilds — a failed write (read-only install
        # dir) must not discard the freshly built, working library
        with open(_HASH_PATH, "w") as f:
            f.write(_src_hash())
    except OSError as e:
        logger.warning(f"could not record native build hash ({e}); "
                       f"the library will be rebuilt next start")
    return True


def _stale():
    """Rebuild when the recorded source hash differs (mtimes are arbitrary
    on fresh checkouts; the library itself is never version-controlled)."""
    if not os.path.exists(_LIB_PATH) or not os.path.exists(_HASH_PATH):
        return True
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() != _src_hash()
    except OSError:
        return True


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VPR_TPU_NO_NATIVE"):
            return None
        if _stale():
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning(f"native audioio load failed: {e}")
            return None
        lib.vpr_decode_wav.restype = ctypes.c_int
        lib.vpr_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        lib.vpr_resample.restype = ctypes.c_int
        lib.vpr_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.vpr_rms_db.restype = ctypes.c_double
        lib.vpr_rms_db.argtypes = [ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
        lib.vpr_free.argtypes = [ctypes.c_void_p]
        lib.vpr_load_batch.restype = ctypes.c_int
        lib.vpr_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32]
        _lib = lib
        return _lib


def native_available():
    return _load() is not None


def _take(ptr, n):
    """Copy a malloc'd float buffer into numpy and free it."""
    lib = _lib
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.vpr_free(ptr)
    return arr


def decode_wav_native(data: bytes):
    """bytes → (float32 mono samples, sample_rate) or None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.vpr_decode_wav(data, len(data), ctypes.byref(out),
                            ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        return None
    return _take(out, n.value), int(sr.value)


def resample_native(samples, sr_in: int, sr_out: int):
    """float32 array → resampled float32 array, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int64()
    rc = lib.vpr_resample(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples.shape[0], sr_in, sr_out, ctypes.byref(out),
        ctypes.byref(n_out))
    if rc != 0:
        return None
    return _take(out, n_out.value)


def rms_db_native(samples):
    lib = _load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float32)
    return float(lib.vpr_rms_db(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        samples.shape[0]))


def load_batch_native(paths, target_sr, target_len, speeds=None,
                      crop_fracs=None, n_threads=None):
    """Batched GIL-free train loader: read + decode + resample (sample
    rate x speed perturb) + crop + int16 quantize for all ``paths`` in a
    C++ thread pool.

    ``speeds``: per-item (num, den) speed fractions ((9, 10) = 0.9x
    playback = longer signal); ``crop_fracs``: per-item crop-start
    fractions in [0, 1). Returns ``(int16 (N, target_len), valid (N,)
    int64, duration_s (N,) float64)`` — ``valid[i] < 0`` marks an
    unreadable item (caller falls back per-item) — or None when the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    num = np.ones(n, np.int32) if speeds is None else \
        np.ascontiguousarray([s[0] for s in speeds], dtype=np.int32)
    den = np.ones(n, np.int32) if speeds is None else \
        np.ascontiguousarray([s[1] for s in speeds], dtype=np.int32)
    fracs = (np.zeros(n, np.float32) if crop_fracs is None
             else np.ascontiguousarray(crop_fracs, dtype=np.float32))
    out = np.empty((n, int(target_len)), np.int16)
    valid = np.empty(n, np.int64)
    dur = np.empty(n, np.float64)
    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    lib.vpr_load_batch(
        c_paths, n, int(target_sr), int(target_len),
        num.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        den.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        fracs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dur.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(n_threads))
    return out, valid, dur
