"""Native runtime components (C++), loaded via ctypes.

The reference's runtime layers (capture prefetch threads, image decode,
photometric preparation) are C++ (src/cml/capture/); this package holds the
TPU build's native equivalents, compiled on demand with the system g++ and
cached. Every native path has a pure-Python fallback so the framework works
without a toolchain."""

from libcml_tpu.native.io import NativePrefetcher, decode_gray, native_available

__all__ = ["NativePrefetcher", "decode_gray", "native_available"]
