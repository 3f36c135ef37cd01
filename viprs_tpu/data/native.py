"""ctypes bridge to the native C++ data kernels (native/libviprs_native.so).

The reference's native layer is its C++/Cython e-step (which on TPU became
Pallas/XLA kernels); this framework's native layer instead accelerates the
host-side data path: BED 2-bit decoding, block-LD accumulation, int8
quantization, and banded-LD packing. Every entry point has a NumPy fallback, so
the library is optional (build with `make -C native`).
"""

import ctypes
import logging
import os

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False


class _NativeLib:
    def __init__(self, cdll):
        self._cdll = cdll
        self.u8p = ctypes.POINTER(ctypes.c_uint8)
        self.f32p = ctypes.POINTER(ctypes.c_float)
        self.f64p = ctypes.POINTER(ctypes.c_double)
        self.i8p = ctypes.POINTER(ctypes.c_int8)
        self.i64p = ctypes.POINTER(ctypes.c_int64)

        cdll.bed_decode_variant.argtypes = [self.u8p, ctypes.c_int64,
                                            ctypes.c_int64, self.f64p]
        cdll.bed_decode_variant.restype = None

        cdll.ld_block_accumulate.argtypes = [self.f64p, ctypes.c_int64,
                                             ctypes.c_int64, self.f64p]
        cdll.ld_block_accumulate.restype = None

        cdll.quantize_int8.argtypes = [self.f64p, ctypes.c_int64, self.i8p]
        cdll.quantize_int8.restype = None

    def __getattr__(self, name):
        return getattr(self._cdll, name)


def load_native():
    """Load libviprs_native.so if built; returns None (with a debug log) otherwise."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, 'native', 'libviprs_native.so'),
        os.path.join(os.path.dirname(__file__), 'libviprs_native.so'),
    ]
    for path in candidates:
        if os.path.exists(path):
            try:
                _LIB = _NativeLib(ctypes.CDLL(path))
                logger.debug("Loaded native library from %s", path)
                return _LIB
            except OSError as e:
                logger.debug("Failed loading native library %s: %s", path, e)
    logger.debug("Native library not built; using NumPy fallbacks.")
    return None
