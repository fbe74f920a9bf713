"""qoi_tpu — a TPU-native QOI (Quite OK Image) encode/decode engine.

Built from scratch in JAX/XLA/Pallas with C++ host components; bit-exact
against the reference format (see SURVEY.md for the structural analysis and
the parallel reformulation of the reference's sequential codec).
"""

from .format import (  # noqa: F401
    LINEAR,
    SRGB,
    StreamDesc,
    pack_header,
    unpack_header,
)

__version__ = "0.1.0"
