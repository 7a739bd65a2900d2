"""Emoji texture-mask extractor: T5-emojilm generate → glyph rasterization.

Reference: text/EmojiMaskExtractor.py — prompt prefixed
"translate to a single emoji:", T5-base emojilm ``generate`` (sampled),
first emoji char rendered at size 109 on a 172×172 white canvas with the
Noto Color Emoji font, mask = pixels < 255.

Resolution (zero-egress environment): ``TBIST_T5_EMOJI_DIR`` or
``weights_cache/t5_emojilm/`` must contain a HF model directory
(pytorch_model.bin/model.safetensors + tokenizer files); the emoji font is
``TBIST_EMOJI_FONT`` or ``weights_cache/NotoColorEmoji.ttf`` (the font is a
missing blob even in the reference snapshot, .MISSING_LARGE_BLOBS:4). When
either is absent, effects.masking falls back to prompt-glyph stencils.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import t5
from tbist_tpu.utils.logging import logger

EMOJI_SIZE = 172
FONT_SIZE = 109
PREFIX = "translate to a single emoji:"

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)


def rasterize_char(char: str, font_path: str | None) -> jnp.ndarray:
    """Render one char on a white 172×172 canvas -> bool mask (<255).

    Matches the reference draw position (20, 10) and threshold
    (EmojiMaskExtractor.py:62-70).
    """
    from PIL import Image, ImageDraw, ImageFont

    img = Image.fromarray(np.full((EMOJI_SIZE, EMOJI_SIZE, 3), 255, np.uint8))
    draw = ImageDraw.Draw(img)
    font = ImageFont.truetype(font_path, size=FONT_SIZE)
    draw.text((20, 10), char, (0, 0, 0), font=font)
    arr = np.asarray(img)
    return jnp.asarray(arr[:, :, 0] < 255)


@functools.lru_cache(maxsize=1)
def get_emoji_extractor(
    sample: bool = False, seed: int = 0
) -> Callable[[str], jnp.ndarray]:
    """Build the prompt -> (172, 172) bool stencil callable.

    Raises if weights/font are missing (caller falls back). Deterministic
    greedy decode by default; ``sample=True`` reproduces the reference's
    top-k/top-p sampling with an explicit seed.
    """
    model_dir = os.environ.get(
        "TBIST_T5_EMOJI_DIR", os.path.join(_CACHE_DIR, "t5_emojilm")
    )
    font_path = os.environ.get(
        "TBIST_EMOJI_FONT", os.path.join(_CACHE_DIR, "NotoColorEmoji.ttf")
    )
    if not os.path.isdir(model_dir):
        raise FileNotFoundError(f"no T5-emojilm model dir at {model_dir}")
    if not os.path.exists(font_path):
        raise FileNotFoundError(f"no emoji font at {font_path}")

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model_dir)

    import torch

    sd_path = None
    for name in ("pytorch_model.bin", "model.safetensors"):
        cand = os.path.join(model_dir, name)
        if os.path.exists(cand):
            sd_path = cand
            break
    if sd_path is None:
        raise FileNotFoundError(f"no weights file in {model_dir}")
    if sd_path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(sd_path)
    else:
        sd = torch.load(sd_path, map_location="cpu", weights_only=True)
    params = t5.convert_hf_state_dict({k: v.numpy() for k, v in sd.items()})
    logger.info("T5-emojilm: converted HF checkpoint from %s", model_dir)

    def extractor(prompt: str) -> jnp.ndarray:
        enc = tokenizer(
            [PREFIX + prompt], max_length=64, truncation=True, return_tensors="np"
        )
        ids = jnp.asarray(enc["input_ids"], jnp.int32)
        mask = jnp.asarray(enc["attention_mask"], jnp.float32)
        key = jax.random.key(seed)
        out = t5.generate(
            params, t5.BASE, ids, mask, key, max_len=16, do_sample=sample
        )
        text = tokenizer.batch_decode(np.asarray(out), skip_special_tokens=True)[0]
        if not text:
            return jnp.zeros((EMOJI_SIZE, EMOJI_SIZE), bool)
        return rasterize_char(text[0], font_path)

    return extractor
