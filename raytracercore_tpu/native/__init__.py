"""Native (C++) runtime components, bound via ctypes.

Currently: the binned-SAH BVH builder (`bvh_builder.cpp`), compiled on first
use with g++ and cached next to the source.  All native components have pure
numpy fallbacks — the Python implementations are the specification, the C++
ones are for scale.
"""

from .lib import build_bvh_native, native_available  # noqa: F401
