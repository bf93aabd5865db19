#!/usr/bin/env python
"""Generate the runnable example assets under data/.

Parity target: the reference's committed `data/` tree —
`data/inpainting_examples/*.png` + `*_mask.png` pairs (consumed by
`scripts/inpaint.py:11-30`), `data/example_conditioning/{superresolution,
text_conditional}` samples (consumed by `notebook_helpers.py:59-106`), and
`data/DejaVuSans.ttf` (`ldm/util.py:25`). The reference ships photographs;
this generator writes small deterministic synthetic scenes so the entry
points run out of the box with nothing to download. Re-run to regenerate:

    python scripts/make_example_data.py [--root data]
"""
from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
from PIL import Image, ImageDraw

# DejaVu fonts carry the free Bitstream Vera / DejaVu license (permissive,
# redistribution allowed); any system copy works.
FONT_CANDIDATES = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/local/share/fonts/DejaVuSans.ttf",
)


def synthetic_scene(seed: int, size: int = 128) -> Image.Image:
    """Deterministic little landscape: sky gradient, sun, hills, texture."""
    rng = np.random.RandomState(seed)
    y = np.linspace(0.0, 1.0, size)[:, None]
    sky = np.stack(
        [
            90 + 120 * (1 - y) + 0 * y,
            140 + 80 * (1 - y),
            200 + 40 * (1 - y),
        ],
        axis=-1,
    )
    img = np.broadcast_to(sky, (size, size, 3)).copy()
    # hills: two overlapping sine ridges
    xs = np.arange(size)
    for amp, base, color in (
        (10, 0.62, (60, 120, 70)),
        (14, 0.78, (40, 90, 50)),
    ):
        ridge = (base * size + amp * np.sin(xs / size * np.pi * (2 + seed % 3))).astype(int)
        for x in xs:
            img[ridge[x]:, x] = color
    img += rng.randn(size, size, 3) * 4.0
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    d = ImageDraw.Draw(pil)
    cx, cy = int(size * (0.25 + 0.1 * seed)) % size, int(size * 0.22)
    r = size // 10
    d.ellipse([cx - r, cy - r, cx + r, cy + r], fill=(255, 230, 150))
    return pil


def rect_mask(size: int, box) -> Image.Image:
    m = Image.new("L", (size, size), 0)
    ImageDraw.Draw(m).rectangle(box, fill=255)
    return m


def main(root: str = "data"):
    inp = os.path.join(root, "inpainting_examples")
    os.makedirs(inp, exist_ok=True)
    size = 128
    for i, box in enumerate(
        [(40, 40, 88, 88), (16, 70, 64, 112)]
    ):
        scene = synthetic_scene(i, size)
        scene.save(os.path.join(inp, f"example{i}.png"))
        rect_mask(size, box).save(os.path.join(inp, f"example{i}_mask.png"))

    sr = os.path.join(root, "example_conditioning", "superresolution")
    os.makedirs(sr, exist_ok=True)
    synthetic_scene(7, 64).save(os.path.join(sr, "sample_0.png"))

    txt = os.path.join(root, "example_conditioning", "text_conditional")
    os.makedirs(txt, exist_ok=True)
    with open(os.path.join(txt, "sample_0.txt"), "w") as f:
        f.write("a virus monster is playing guitar, oil on canvas")

    font_dst = os.path.join(root, "DejaVuSans.ttf")
    if not os.path.exists(font_dst):
        for cand in FONT_CANDIDATES:
            if os.path.exists(cand):
                shutil.copyfile(cand, font_dst)
                break
        else:
            print("warning: no DejaVuSans.ttf found on this system; "
                  "log_txt_as_img will use PIL's default font")
    print(f"example data written under {root}/")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=os.path.join(
        os.path.dirname(__file__), "..", "data"))
    a = p.parse_args()
    main(os.path.normpath(a.root))
