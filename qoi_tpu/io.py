"""File I/O convenience layer (reference L2: qoi.h:592-648) + PNG bridging.

`write`/`read` mirror `qoi_write`/`qoi_read` (reference qoi.h:595-646):
whole-file encode/decode with the engine of choice. PNG load/save (the
reference tools use stb_image/stb_image_write, qoiconv.c:20-26) goes
through PIL here, normalizing to 8-bit RGB/RGBA exactly like the
reference's loaders force non-3-channel sources to 4 (qoiconv.c:51-56).
"""
from __future__ import annotations

import pathlib
from typing import Optional, Tuple, Union

import numpy as np

from . import config as cfg
from . import format as fmt


def _as_config(engine: Union[str, "cfg.EngineConfig"]) -> "cfg.EngineConfig":
    if isinstance(engine, cfg.EngineConfig):
        engine.validate()
        return engine
    return cfg.EngineConfig(engine=engine)


def _engine(engine: Union[str, "cfg.EngineConfig"]):
    """Resolve (encode, decode) callables for an engine name or a full
    EngineConfig (SURVEY §5.6: one dataclass drives the tunables)."""
    c = _as_config(engine)
    if c.engine == "tpu":
        if c.mesh is not None:
            # sequence-parallel single-stream codec over a (data, seq)
            # device mesh (SURVEY §5.7); io-level calls shard the pixel /
            # byte stream over the seq axis
            from .parallel import sharding, tiled, tiled_decode

            mesh = sharding.make_mesh(data=c.mesh[0], seq=c.mesh[1])
            return (lambda px, desc: tiled.encode_tiled(px, desc, mesh),
                    lambda data, ch=0: tiled_decode.decode_tiled(
                        data, mesh, ch))
        from .models import decode_v3, pipeline

        return (lambda px, desc: pipeline.encode(px, desc, config=c),
                lambda data, ch=0: decode_v3.decode(data, ch, config=c))
    if c.engine == "scan":
        from .models import scan_codec

        return scan_codec.encode, scan_codec.decode
    if c.engine == "oracle":
        from . import oracle

        return oracle.encode, oracle.decode
    raise ValueError(f"unknown engine {c.engine!r} (want tpu, scan or oracle)")


def write(path, pixels: np.ndarray, desc: fmt.StreamDesc,
          engine: Union[str, "cfg.EngineConfig"] = "tpu") -> int:
    """Encode and write a .qoi file; returns bytes written (reference
    qoi_write, qoi.h:595). `engine` is a name or an EngineConfig; with
    config.verify the stream is differentially checked vs the oracle."""
    c = _as_config(engine)
    enc, _ = _engine(c)
    data = enc(pixels, desc)
    if c.verify and c.engine != "oracle":
        from . import oracle

        if oracle.available() and data != oracle.encode(pixels, desc):
            raise AssertionError("encode mismatch vs the C++ oracle")
    pathlib.Path(path).write_bytes(data)
    return len(data)


def read(path, channels: int = 0,
         engine: Union[str, "cfg.EngineConfig"] = "tpu"
         ) -> Tuple[np.ndarray, fmt.StreamDesc]:
    """Read and decode a .qoi file (reference qoi_read, qoi.h:619).
    channels=0 uses the header count. `engine` as in `write`."""
    c = _as_config(engine)
    _, dec = _engine(c)
    data = pathlib.Path(path).read_bytes()
    img, desc = dec(data, channels)
    if c.verify and c.engine != "oracle":
        from . import oracle

        if oracle.available():
            want, _ = oracle.decode(data, channels)
            if not np.array_equal(img, want):
                raise AssertionError("decode mismatch vs the C++ oracle")
    return img, desc


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
