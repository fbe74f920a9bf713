#!/usr/bin/env python3
"""Generate the synthetic PNG conformance corpus (CORPUS_BENCH.md).

The real qoi_benchmark_suite (~2,800 PNGs, linked from the reference
README) is not fetchable in this environment; this corpus mirrors its
content classes (photos/textures/icons/screenshots) with the repo's
generators at a spread of sizes and channel counts, deterministically.

    python tools/make_corpus.py /tmp/qoi_corpus
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from qoi_tpu import io as qio  # noqa: E402
from qoi_tpu.utils import testimages as t  # noqa: E402


def build(root: pathlib.Path) -> int:
    specs = []
    # photo/texture-like (constant alpha — the suite's dominant class)
    for i, (w, h) in enumerate([(640, 480), (800, 600), (1024, 768),
                                (1920, 1080), (333, 777), (64, 64)]):
        specs.append((f"photo/photo_{w}x{h}.png", t.photo(w, h, 3, seed=i)))
        specs.append((f"photo/photo_{w}x{h}_rgba.png",
                      t.photo(w, h, 4, seed=i + 50)))
    # icon-like (small, varying alpha)
    for i, s in enumerate([16, 32, 48, 64, 128]):
        specs.append((f"icons/icon_{s}.png", t.mixed(s, s, 4, seed=i)))
        specs.append((f"icons/alpha_{s}.png", t.alpha_toggle(s, s, seed=i)))
    # screenshot-like (flat regions + palette bands)
    for i, (w, h) in enumerate([(1280, 720), (640, 400)]):
        specs.append((f"screens/flat_{w}x{h}.png", t.flat(w, h, 3)))
        specs.append((f"screens/palette_{w}x{h}.png",
                      t.palette(w, h, 3, colors=12, seed=i)))
        specs.append((f"screens/gradient_{w}x{h}.png", t.gradient(w, h, 3)))
    # pathological
    specs.append(("hard/noise_512.png", t.noise(512, 512, 4, seed=9)))
    specs.append(("hard/wrap_256.png", t.wraparound(256, 64, 4)))
    specs.append(("hard/tall_1xN.png", t.gradient(1, 4096, 3)))
    specs.append(("hard/wide_Nx1.png", t.gradient(4096, 1, 3)))

    for rel, img in specs:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        qio.save_png(p, img)
    return len(specs)


if __name__ == "__main__":
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/qoi_corpus")
    n = build(root)
    print(f"{n} PNGs under {root}")
