"""Depth-Anything structural tests (tiny config, random weights)."""

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import depth_anything as da

TINY = da.DAConfig(
    patch=7, width=32, layers=2, heads=2, mlp_ratio=2,
    out_layers=(1, 1, 2, 2), neck_dims=(8, 8, 16, 16),
    fusion=8, head_hidden=8, pos_grid=6, input_size=42,
)
PARAMS = da.init_params(jax.random.key(0), TINY)


class TestDepthAnything:
    def test_encode_shapes(self):
        img = jax.random.uniform(jax.random.key(1), (1, 42, 42, 3))
        outs = da.encode(PARAMS, TINY, img)
        assert len(outs) == 4
        # grid 6x6 + CLS
        assert outs[0].shape == (1, 37, 32)

    def test_predict_depth_shape_and_grad(self):
        img = jax.random.uniform(jax.random.key(2), (1, 50, 70, 3))
        depth = da.predict_depth(PARAMS, TINY, img)
        assert depth.shape == (50, 70)
        assert np.isfinite(np.asarray(depth)).all()

        # differentiability: the depth-loss path needs gradients through it
        def f(x):
            return jnp.mean(da.predict_depth(PARAMS, TINY, x))

        g = jax.grad(f)(img)
        assert np.isfinite(np.asarray(g)).all()

    def test_pos_embed_interpolation(self):
        img = jax.random.uniform(jax.random.key(3), (1, 84, 42, 3))
        outs = da.encode(PARAMS, TINY, img)  # 12x6 grid
        assert outs[0].shape == (1, 1 + 12 * 6, 32)
