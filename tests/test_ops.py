"""Parity tests for resize / filters / colorspace against cv2, torch, PIL."""

import cv2
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from PIL import Image

from tbist_tpu.ops import colorspace, filters, resize

RNG = np.random.default_rng(1)


class TestResizeNearest:
    def test_matches_cv2_inter_nearest(self):
        img = (RNG.random((37, 53, 3)) * 255).astype(np.uint8)
        for out_wh in [(20, 15), (80, 100), (53, 37)]:
            want = cv2.resize(img, out_wh, interpolation=cv2.INTER_NEAREST)
            got = resize.resize_nearest(
                jnp.asarray(img.astype(np.float32)), (out_wh[1], out_wh[0])
            )
            np.testing.assert_array_equal(np.asarray(got).astype(np.uint8), want)


class TestResizeBilinear:
    def test_align_corners_matches_torch(self):
        x = RNG.random((1, 7, 9, 4)).astype(np.float32)
        got = resize.resize_bilinear(jnp.asarray(x), (13, 5), align_corners=True)
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = F.interpolate(t, size=(13, 5), mode="bilinear", align_corners=True)
        np.testing.assert_allclose(
            np.asarray(got),
            np.transpose(want.numpy(), (0, 2, 3, 1)),
            rtol=1e-4,
            atol=1e-5,
        )

    def test_half_pixel_matches_torch_default(self):
        x = RNG.random((1, 8, 8, 3)).astype(np.float32)
        got = resize.resize_bilinear(jnp.asarray(x), (12, 20), align_corners=False)
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        want = F.interpolate(t, size=(12, 20), mode="bilinear", align_corners=False)
        np.testing.assert_allclose(
            np.asarray(got),
            np.transpose(want.numpy(), (0, 2, 3, 1)),
            rtol=1e-4,
            atol=1e-5,
        )


class TestCenterCrop:
    def test_crops_larger_image_like_reference(self):
        content = jnp.ones((1, 10, 8, 3))
        style = jnp.ones((1, 6, 12, 3))
        mask = jnp.ones((10, 8), bool)
        c, s, m = resize.center_crop_to_match(content, style, mask)
        assert c.shape == (1, 6, 8, 3)
        assert s.shape == (1, 6, 8, 3)
        assert m.shape == (6, 8)


class TestGaussianBlur:
    def test_matches_cv2(self):
        img = RNG.random((32, 40)).astype(np.float32)
        for k in [3, 5, 9, 15]:
            want = cv2.GaussianBlur(img, (k, k), 0)
            got = filters.gaussian_blur(
                jnp.asarray(img)[None, ..., None], k
            )[0, ..., 0]
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_even_kernel_forced_odd(self):
        img = jnp.asarray(RNG.random((1, 16, 16, 3)).astype(np.float32))
        a = filters.gaussian_blur(img, 4)
        b = filters.gaussian_blur(img, 5)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestReinhard:
    def _torch_reference(self, source, target):
        """Inline reimplementation of ColorPaletteTransfer.color_transfer."""
        rgb_to_lms = torch.tensor(colorspace.RGB_TO_LMS)
        lms_to_rud = torch.tensor(colorspace.LMS_TO_RUDERMAN)
        rud_to_lms = lms_to_rud.inverse()
        lms_to_rgb = rgb_to_lms.inverse()

        def to_rud(img):
            lms = img @ rgb_to_lms.T
            return torch.log(lms + 1e-5) @ lms_to_rud.T

        def to_rgb(img):
            lms = torch.exp(img @ rud_to_lms.T)
            return lms @ lms_to_rgb.T

        s = to_rud(torch.from_numpy(source.reshape(-1, 3)))
        t = to_rud(torch.from_numpy(target.reshape(-1, 3)))
        s_std = s.std(dim=0, keepdim=True)
        s_std = torch.where(s_std < 1e-5, torch.ones_like(s_std), s_std)
        out = (s - s.mean(dim=0, keepdim=True)) * (
            t.std(dim=0, keepdim=True) / s_std
        ) + t.mean(dim=0, keepdim=True)
        return torch.clamp(to_rgb(out), 0.0, 1.0).numpy().reshape(source.shape)

    def test_matches_torch_reference(self):
        src = np.clip(RNG.random((12, 10, 3)).astype(np.float32), 1e-6, 1.0)
        tgt = np.clip(RNG.random((12, 10, 3)).astype(np.float32), 1e-6, 1.0)
        got = colorspace.reinhard_color_transfer(
            jnp.asarray(src)[None], jnp.asarray(tgt)[None]
        )[0]
        want = self._torch_reference(src, tgt)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)

    def test_identity_transfer_is_near_noop(self):
        src = np.clip(RNG.random((16, 16, 3)).astype(np.float32), 0.05, 0.95)
        got = colorspace.reinhard_color_transfer(
            jnp.asarray(src)[None], jnp.asarray(src)[None]
        )[0]
        np.testing.assert_allclose(np.asarray(got), src, rtol=1e-2, atol=1e-3)


class TestGrayscale:
    def test_matches_pil_convert_L(self):
        img = (RNG.random((20, 20, 3)) * 255).astype(np.uint8)
        want = np.asarray(Image.fromarray(img).convert("L"))
        got = colorspace.rgb_to_grayscale(
            jnp.asarray(img.astype(np.float32) / 255.0), keep_rgb=False
        )[..., 0]
        got_u8 = np.asarray(got * 255.0)
        # PIL truncates rather than rounds; allow 1 LSB
        assert np.max(np.abs(got_u8.astype(np.int32) - want.astype(np.int32))) <= 1
