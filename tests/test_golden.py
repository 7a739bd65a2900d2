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

    # --- round-2 additions: the subtlest reimplementations (VERDICT r1 #5) ---

    def _seg_mask():
        # deterministic non-trivial segmentation mask from the content
        # luminance (same shape class as a DINO+SAM mask)
        luma = jnp.mean(content[0], axis=-1)
        return luma > jnp.mean(luma)

    def _stencil():
        # deterministic checkered stencil (font rasterization is
        # environment-dependent; goldens must not depend on PIL's bitmap font)
        yy, xx = np.mgrid[0:172, 0:172]
        ring = ((yy - 86) ** 2 + (xx - 86) ** 2 < 70**2) & (
            ((yy // 12) + (xx // 12)) % 2 == 0
        )
        return jnp.asarray(ring)

    def merge_k95_case():
        from tbist_tpu.ops import masks

        return np.asarray(
            masks.merge_content_style_masks(_seg_mask(), _stencil(), 95, 0.5)
        )

    def merge_k31_case():
        from tbist_tpu.ops import masks

        return np.asarray(
            masks.merge_content_style_masks(_seg_mask(), _stencil(), 31, 1.0)
        )

    def feathered_composite_case():
        from tbist_tpu.ops import masks

        return np.asarray(
            masks.composite_by_mask(content, style, _seg_mask(), 9)[0]
        )

    def mip_roundtrip_case():
        from tbist_tpu.effects import depth as depth_fx
        from tbist_tpu.ops import mip as mip_ops

        depth = depth_fx._fallback_depth(content)
        layers = mip_ops.generate_layers(content, depth, 3)
        return np.asarray(mip_ops.reconstruct(layers, depth, 3))

    def mixing_case():
        style2 = to_device(
            load_image(os.path.join(DATA, "style_imgs/picasso.jpg")),
            bucket=32, max_side=64,
        )
        cfg = GatysConfig(num_steps=8, w_style=1e4, style_img_weight=0.3)
        out, _ = gatys.stylize(content, [style, style2], cfg, params)
        return np.asarray(out[0])

    def depth_loss_case():
        from tbist_tpu.effects import depth as depth_fx
        from tbist_tpu.optimize import gatys_depth

        cfg = GatysConfig(num_steps=6, w_style=1e4, w_depth=5e4)
        out = gatys_depth.stylize_with_depth(
            content, style, cfg, depth_fx._fallback_depth, params
        )
        return np.asarray(out[0])

    def text_chain_case():
        # FULL text chain: style prompt -> location mask -> fast
        # transfer -> emoji composite (VERDICT r3 #7), on seeded weights
        # through the production pipeline. Deterministic stand-ins for
        # the environment-dependent pieces: the seeded CLIP fallback
        # embedding resolves by default, the checkered stencil replaces
        # the font raster, the border-prior fallback supplies the
        # location mask, and the bit-f32 Ghiasi program pins the golden
        # across regen environments (bf16 default-on is separately
        # bounded at 512px in test_effects.TestGhiasiBf16Stream).
        os.environ["TBIST_GHIASI_BF16"] = "0"
        try:
            from tbist_tpu.compose import pipeline as pl
            from tbist_tpu.effects import masking
            from tbist_tpu.effects import text_transfer as tt
            from tbist_tpu.utils.config import EffectRequest, TextEffectConfig

            reg = pl.ModelRegistry(
                text_transfer=lambda img, p: tt.perform_transfer(
                    img, p, use_mesh=False
                ),
                mask_extractor=masking._fallback_location_mask,
                emoji_extractor=lambda prompt: _stencil(),
            )
            req = EffectRequest(
                text=TextEffectConfig(
                    style_prompt="mosaic", location_prompt="boat",
                    texture_prompt="fire",
                )
            )
            out = pl.apply_image(content, req, registry=reg)
            return np.asarray(out[0])
        finally:
            os.environ.pop("TBIST_GHIASI_BF16", None)

    return {
        "gatys_8step": gatys_case,
        "pixel_art": pixel_case,
        "reinhard": reinhard_case,
        "merge_k95": merge_k95_case,
        "merge_k31": merge_k31_case,
        "feathered_composite": feathered_composite_case,
        "mip_roundtrip": mip_roundtrip_case,
        "mixing_2style": mixing_case,
        "depth_loss_6step": depth_loss_case,
        "text_chain": text_chain_case,
    }


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
