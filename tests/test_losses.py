"""Loss parity tests against inline torch implementations of the reference
formulas (multi_style_transfer/style_transfer_losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tbist_tpu.ops import losses

RNG = np.random.default_rng(0)


def _rand_nhwc(b, h, w, c):
    return RNG.standard_normal((b, h, w, c)).astype(np.float32)


def _to_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


class TestNormalize:
    def test_matches_torch(self):
        img = RNG.random((1, 8, 9, 3)).astype(np.float32)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        got = losses.normalize(jnp.asarray(img), mean, std)
        t = (_to_nchw(img) - torch.tensor(mean).view(1, -1, 1, 1)) / torch.tensor(
            std
        ).view(1, -1, 1, 1)
        want = np.transpose(t.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


class TestGram:
    def test_matches_torch_reference(self):
        x = _rand_nhwc(2, 5, 7, 4)
        xt = _to_nchw(x)
        b, c, h, w = xt.shape
        xm = xt.reshape(b, c, h * w)
        want = torch.bmm(xm, xm.transpose(1, 2)) / (b * c * h * w)
        # default matmul precision uses fast bf16 passes (the perf choice
        # for the hot style loss) — loose tolerance here...
        got = losses.gram_matrix(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-2, atol=1e-4)
        # ...and exact agreement under full-precision matmuls
        with jax.default_matmul_precision("highest"):
            got_hp = losses.gram_matrix(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got_hp), want.numpy(), rtol=1e-5)


class TestContentLoss:
    def test_mse_averaged_over_layers(self):
        a = {"l1": jnp.asarray(_rand_nhwc(1, 4, 4, 3)), "l2": jnp.asarray(_rand_nhwc(1, 2, 2, 8))}
        b = {"l1": jnp.asarray(_rand_nhwc(1, 4, 4, 3)), "l2": jnp.asarray(_rand_nhwc(1, 2, 2, 8))}
        got = losses.content_loss(a, b, ["l1", "l2"])
        want = 0.5 * (
            np.mean((np.asarray(a["l1"]) - np.asarray(b["l1"])) ** 2)
            + np.mean((np.asarray(a["l2"]) - np.asarray(b["l2"])) ** 2)
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-6)


class TestStyleLoss:
    def test_single_style(self):
        fin = {"l": jnp.asarray(_rand_nhwc(1, 4, 4, 3))}
        fst = {"l": jnp.asarray(_rand_nhwc(1, 4, 4, 3))}
        got = losses.style_loss(fin, [fst], ["l"])
        g1 = np.asarray(losses.gram_matrix(fin["l"]))
        g2 = np.asarray(losses.gram_matrix(fst["l"]))
        np.testing.assert_allclose(float(got), np.mean((g1 - g2) ** 2), rtol=1e-5)

    def test_two_styles_uses_mixer(self):
        fin = {"l": jnp.asarray(_rand_nhwc(1, 4, 4, 3))}
        fs1 = {"l": jnp.asarray(_rand_nhwc(1, 4, 4, 3))}
        fs2 = {"l": jnp.asarray(_rand_nhwc(1, 6, 6, 3))}
        loss_w0 = losses.style_loss(fin, [fs1, fs2], ["l"], style_img_weight=0.0)
        loss_w1 = losses.style_loss(fin, [fs1, fs2], ["l"], style_img_weight=1.0)
        assert float(loss_w0) != pytest.approx(float(loss_w1))


class TestTV:
    def test_matches_torch_reference(self):
        x = _rand_nhwc(1, 6, 7, 3)
        got = losses.total_variation_loss(jnp.asarray(x))
        y = _to_nchw(x)
        norm = y.shape[1] * y.shape[2] * y.shape[3]
        want = (
            torch.sum(torch.abs(y[:, :, 1:, :] - y[:, :, :-1, :]))
            + torch.sum(torch.abs(y[:, :, :, 1:] - y[:, :, :, :-1]))
        ) / norm
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


class TestGradients:
    def test_central_difference_shapes_and_values(self):
        img = RNG.random((1, 8, 9, 1)).astype(np.float32)
        got = np.asarray(losses.gradient_images(jnp.asarray(img)))
        assert got.shape == (1, 6, 7, 2)
        t = torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        dx = t[:, :, 1:-1, 2:] - t[:, :, 1:-1, :-2]
        dy = t[:, :, 2:, 1:-1] - t[:, :, :-2, 1:-1]
        np.testing.assert_allclose(got[..., 0], dx.numpy()[:, 0], rtol=1e-6)
        np.testing.assert_allclose(got[..., 1], dy.numpy()[:, 0], rtol=1e-6)

    def test_edge_loss(self):
        g1 = jnp.asarray(_rand_nhwc(1, 5, 5, 2))
        g2 = jnp.asarray(_rand_nhwc(1, 5, 5, 2))
        got = losses.edge_loss(g1, g2)
        a, b = np.asarray(g1), np.asarray(g2)
        want = 0.5 * (
            np.mean((a[..., 0] - b[..., 0]) ** 2)
            + np.mean((a[..., 1] - b[..., 1]) ** 2)
        )
        np.testing.assert_allclose(float(got), want, rtol=1e-6)


class TestGrayscale:
    def test_channel_mean(self):
        img = jnp.asarray(_rand_nhwc(1, 4, 4, 3))
        got = losses.to_grayscale(img)
        np.testing.assert_allclose(
            np.asarray(got)[..., 0], np.mean(np.asarray(img), -1), rtol=1e-6
        )


class TestMaxPoolVJP:
    """The 2x2 maxpool (models/vgg19.py) must match the reference
    reshape-max formulation in forward and gradient, splitting tie
    gradients evenly (jax reduce_max semantics)."""

    def _auto_pool(self, x):
        import jax.numpy as jnp

        b, h, w, c = x.shape
        x = x[:, : h - h % 2, : w - w % 2, :]
        return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))

    def test_forward_and_grad_match_auto(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tbist_tpu.models import vgg19

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 8, 10, 3)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(vgg19._max_pool_2x2(x)), np.asarray(self._auto_pool(x))
        )
        g1 = jax.grad(lambda x: jnp.sum(vgg19._max_pool_2x2(x) ** 2))(x)
        g2 = jax.grad(lambda x: jnp.sum(self._auto_pool(x) ** 2))(x)
        # gradients agree wherever there are no exact ties (random floats)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    def test_tie_splitting(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tbist_tpu.models import vgg19

        # all four window elements tied -> gradient split 4 ways
        x = jnp.ones((1, 2, 2, 1), jnp.float32)
        g = jax.grad(lambda x: jnp.sum(vgg19._max_pool_2x2(x)))(x)
        np.testing.assert_allclose(np.asarray(g), 0.25 * np.ones((1, 2, 2, 1)))

    def test_odd_sizes_cropped(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from tbist_tpu.models import vgg19

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 7, 9, 2)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(vgg19._max_pool_2x2(x)), np.asarray(self._auto_pool(x))
        )
        g1 = jax.grad(lambda x: jnp.sum(vgg19._max_pool_2x2(x)))(x)
        g2 = jax.grad(lambda x: jnp.sum(self._auto_pool(x)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
