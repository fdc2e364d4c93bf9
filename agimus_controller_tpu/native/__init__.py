"""Native (C++) components: rigid-body oracle kernels + SPSC ring buffer.

Sources live in `native/*.cpp`; they are compiled on first use with the
system g++ into a cached shared library and bound through ctypes (pybind11
is not available in this environment). See `native/rbd_kernels.cpp` and
`native/ring_buffer.cpp` for the role of each component."""

from .bindings import NativeRBD, RingBuffer, build_native_library

__all__ = ["NativeRBD", "RingBuffer", "build_native_library"]
