"""File I/O convenience layer (reference L2: qoi.h:592-648) + PNG bridging.

`write`/`read` mirror `qoi_write`/`qoi_read` (reference qoi.h:595-646):
whole-file encode/decode with the engine of choice. PNG load/save (the
reference tools use stb_image/stb_image_write, qoiconv.c:20-26) goes
through PIL here, normalizing to 8-bit RGB/RGBA exactly like the
reference's loaders force non-3-channel sources to 4 (qoiconv.c:51-56).
"""
from __future__ import annotations

import pathlib
from typing import Optional, Tuple

import numpy as np

from . import format as fmt


def _engine(name: str):
    if name == "tpu":
        from .models import decode_v3, pipeline

        return pipeline.encode, decode_v3.decode
    if name == "scan":
        from .models import scan_codec

        return scan_codec.encode, scan_codec.decode
    if name == "oracle":
        from . import oracle

        return oracle.encode, oracle.decode
    raise ValueError(f"unknown engine {name!r} (want tpu, scan or oracle)")


def write(path, pixels: np.ndarray, desc: fmt.StreamDesc,
          engine: str = "tpu") -> int:
    """Encode and write a .qoi file; returns bytes written (reference
    qoi_write, qoi.h:595)."""
    enc, _ = _engine(engine)
    data = enc(pixels, desc)
    pathlib.Path(path).write_bytes(data)
    return len(data)


def read(path, channels: int = 0,
         engine: str = "tpu") -> Tuple[np.ndarray, fmt.StreamDesc]:
    """Read and decode a .qoi file (reference qoi_read, qoi.h:619).
    channels=0 uses the header count."""
    _, dec = _engine(engine)
    return dec(pathlib.Path(path).read_bytes(), channels)


def load_png(path) -> np.ndarray:
    """Load a PNG as (h, w, 3|4) uint8; non-RGB modes are normalized the
    way the reference's stbi loader forces channels (qoiconv.c:51-56)."""
    from PIL import Image

    with Image.open(path) as im:
        if im.mode == "RGB":
            return np.asarray(im, dtype=np.uint8)
        if im.mode != "RGBA":
            im = im.convert("RGBA")
        return np.asarray(im, dtype=np.uint8)


def save_png(path, pixels: np.ndarray) -> None:
    """Save (h, w, 3|4) uint8 pixels as PNG."""
    from PIL import Image

    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    mode = "RGB" if arr.shape[-1] == 3 else "RGBA"
    Image.fromarray(arr, mode).save(path, format="PNG")


def image_desc(pixels: np.ndarray, colorspace: int = fmt.SRGB) -> fmt.StreamDesc:
    h, w, ch = pixels.shape
    return fmt.StreamDesc(w, h, ch, colorspace)
