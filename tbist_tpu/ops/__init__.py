from tbist_tpu.ops import (
    canny,
    colorspace,
    filters,
    losses,
    masks,
    mip,
    mixing,
    palette,
    resize,
)

__all__ = [
    "canny",
    "colorspace",
    "filters",
    "losses",
    "masks",
    "mip",
    "mixing",
    "palette",
    "resize",
]
