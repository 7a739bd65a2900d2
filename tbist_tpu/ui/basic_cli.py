"""Interactive terminal app — parity with the reference's legacy Tkinter UI.

Reference: basic.py exposes 9 text-centric processing modes behind a
desktop widget (options list at basic.py:15-25, dispatch factory at
:210-280); its style-transfer and depth menu items were unimplemented
stubs (:219, :224). This environment is headless, so the same mode list
drives a simple prompt loop over the full pipeline (every mode actually
works here). Run: ``python -m tbist_tpu.ui.basic_cli``.
"""

from __future__ import annotations

import os

from tbist_tpu import api
from tbist_tpu.utils.config import DepthConfig, EffectRequest, TextEffectConfig

MODES = [
    "Text-Based Style Transfer",
    "Location Masking",
    "Style (Emoji) Masking",
    "Transfer + Location Mask",
    "Transfer + Style Mask",
    "Transfer + Location + Style Mask",
    "Location + Style Mask (merged mask)",
    "Style Transfer (Gatys)",
    "Depth-Based Style Transfer",
]


def _request_for(mode: int, prompts: dict) -> EffectRequest:
    t = prompts.get("transfer")
    l = prompts.get("location")
    x = prompts.get("texture")
    table = {
        0: TextEffectConfig(style_prompt=t),
        1: TextEffectConfig(location_prompt=l),
        2: TextEffectConfig(texture_prompt=x),
        3: TextEffectConfig(style_prompt=t, location_prompt=l),
        4: TextEffectConfig(style_prompt=t, texture_prompt=x),
        5: TextEffectConfig(style_prompt=t, location_prompt=l, texture_prompt=x),
        6: TextEffectConfig(location_prompt=l, texture_prompt=x),
    }
    if mode in table:
        return EffectRequest(text=table[mode])
    if mode == 7:
        return EffectRequest(style_transfer=True)
    return EffectRequest(depth=DepthConfig(mode="mip"))


def main() -> int:
    print("tbist_tpu basic app — modes:")
    for i, m in enumerate(MODES):
        print(f"  {i}: {m}")
    mode = int(input("mode> ").strip())
    image = input("input image path> ").strip()
    prompts = {}
    style_path = None
    if mode in (0, 3, 4, 5):
        prompts["transfer"] = input("style prompt> ").strip()
    if mode in (1, 3, 5, 6):
        prompts["location"] = input("location prompt> ").strip()
    if mode in (2, 4, 5, 6):
        prompts["texture"] = input("texture prompt> ").strip()
    if mode in (7, 8):
        style_path = input("style image path> ").strip()
    out_path = input("output path [out.png]> ").strip() or "out.png"

    req = _request_for(mode, prompts)
    result = api.apply_image(image, req, style_image=style_path)
    if result is None:
        print("processing returned nothing (missing inputs?)")
        return 1
    result.save(out_path)
    print(f"saved {os.path.abspath(out_path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
