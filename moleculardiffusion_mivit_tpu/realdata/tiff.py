"""TIFF stack IO for real microscopy data.

The reference's real-data notebooks load TIFF stacks (README.md:56-67; the
example assets are absent from the snapshot). We read/write multi-page
grayscale TIFFs via PIL (the only imaging library guaranteed in this
environment), returning float32 ``(frames, H, W)`` arrays.
"""

from __future__ import annotations

import numpy as np


def read_tiff_stack(path: str) -> np.ndarray:
    """Read a (possibly multi-page) grayscale TIFF into (F, H, W) float32."""
    from PIL import Image

    frames = []
    with Image.open(path) as img:
        i = 0
        while True:
            try:
                img.seek(i)
            except EOFError:
                break
            frames.append(np.asarray(img, dtype=np.float32))
            i += 1
    if not frames:
        raise ValueError(f"no frames in {path}")
    return np.stack(frames)


def write_tiff_stack(path: str, stack: np.ndarray) -> None:
    """Write (F, H, W) to a multi-page 32-bit float TIFF."""
    from PIL import Image

    stack = np.asarray(stack, dtype=np.float32)
    pages = [Image.fromarray(frame, mode="F") for frame in stack]
    pages[0].save(path, save_all=True, append_images=pages[1:])
