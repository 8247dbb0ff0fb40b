"""Native host-side components (C, built on demand, graceful fallback).

The reference ships no native code (SURVEY §0); these are TPU-deployment
additions for host-bound stages of the input pipeline. Everything here is
optional: import failure or missing toolchain falls back to the pure-Python
implementations.
"""

from .fast_image import fast_resize_available, resize_bilinear_u8
