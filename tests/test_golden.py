"""Golden-image regression tests (SURVEY §4 proposal).

Small fixed-seed runs on the bundled data images, compared against
committed golden arrays (generated on the CPU backend with seeded VGG
weights). These catch semantic regressions in the loss/optimizer chain;
tolerances absorb backend-level float noise.

Regenerate after an INTENDED semantic change:
    python tests/test_golden.py --regen
"""

import os
import sys

if __name__ == "__main__":  # --regen runs on the CPU backend like pytest
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbist_tpu.effects import basic, pixel_art as pa
from tbist_tpu.models import vgg19
from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig, PixelArtConfig
from tbist_tpu.utils.imageio import load_image, to_device

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def _content():
    return to_device(load_image(os.path.join(DATA, "content_imgs/boat.jpg")),
                     bucket=32, max_side=64)


def _style():
    return to_device(load_image(os.path.join(DATA, "style_imgs/starry_night.jpg")),
                     bucket=32, max_side=64)


def _cases():
    params = vgg19.init_params(jax.random.key(0))
    content, style = _content(), _style()

    def gatys_case():
        cfg = GatysConfig(num_steps=8, w_style=1e4)
        out, _ = gatys.stylize(content, [style], cfg, params)
        return np.asarray(out[0])

    def pixel_case():
        cfg = PixelArtConfig(pixel_size=0.25, use_palette=True, palette_number=5)
        return np.asarray(pa.pixel_art(content, cfg)[0])

    def reinhard_case():
        return np.asarray(basic.color_palette_transfer(content, style)[0])

    return {"gatys_8step": gatys_case, "pixel_art": pixel_case,
            "reinhard": reinhard_case}


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in _cases().items():
        np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), fn())
        print("wrote", name)


class TestGolden:
    def test_against_golden(self):
        import pytest

        cases = _cases()
        missing = [
            n for n in cases if not os.path.exists(os.path.join(GOLDEN_DIR, f"{n}.npy"))
        ]
        if missing:
            pytest.skip(f"golden files missing: {missing} (run --regen)")
        for name, fn in cases.items():
            want = np.load(os.path.join(GOLDEN_DIR, f"{name}.npy"))
            got = fn()
            err = np.abs(got - want)
            assert err.max() < 5e-2 and err.mean() < 5e-3, (
                f"{name}: max={err.max():.4f} mean={err.mean():.5f}"
            )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        regen()
