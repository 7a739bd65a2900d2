"""End-to-end Gatys optimization smoke/behavior tests (tiny shapes, CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tbist_tpu.models import vgg19
from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig

KEY = jax.random.key(0)
PARAMS = vgg19.init_params(KEY)


def _img(key, h=64, w=64):
    return jax.random.uniform(key, (1, h, w, 3), jnp.float32)


CONTENT = _img(jax.random.key(1))
STYLE1 = _img(jax.random.key(2), 64, 64)
STYLE2 = _img(jax.random.key(3), 96, 64)

SMALL = GatysConfig(num_steps=10, w_style=1e3, optimizer="lbfgs")


class TestVgg:
    def test_feature_shapes_and_pre_relu_semantics(self):
        feats = vgg19.extract_features(
            PARAMS, CONTENT, ("conv1_1", "conv2_1", "conv4_2", "conv5_1")
        )
        assert feats["conv1_1"].shape == (1, 64, 64, 64)
        assert feats["conv2_1"].shape == (1, 32, 32, 128)
        assert feats["conv4_2"].shape == (1, 8, 8, 512)
        assert feats["conv5_1"].shape == (1, 4, 4, 512)
        # pre-ReLU capture: negative values must be present
        assert float(jnp.min(feats["conv1_1"])) < 0

    def test_unknown_layer_raises(self):
        with pytest.raises(ValueError):
            vgg19.extract_features(PARAMS, CONTENT, ("conv9_9",))


class TestStylize:
    def test_loss_decreases_lbfgs(self):
        out, hist = gatys.stylize(CONTENT, [STYLE1], SMALL, PARAMS)
        out.block_until_ready()
        assert out.shape == CONTENT.shape
        assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1
        assert hist[-1] < hist[0]

    def test_loss_decreases_adam(self):
        cfg = dataclasses.replace(SMALL, optimizer="adam")
        out, hist = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        assert hist[-1] < hist[0]

    def test_two_style_mixing_runs(self):
        out, hist = gatys.stylize(CONTENT, [STYLE1, STYLE2], SMALL, PARAMS)
        assert out.shape == CONTENT.shape
        assert np.isfinite(np.asarray(hist)).all()

    def test_mixing_weight_changes_result(self):
        cfg0 = dataclasses.replace(SMALL, style_img_weight=0.0)
        cfg1 = dataclasses.replace(SMALL, style_img_weight=1.0)
        out0, _ = gatys.stylize(CONTENT, [STYLE1, STYLE2], cfg0, PARAMS)
        out1, _ = gatys.stylize(CONTENT, [STYLE1, STYLE2], cfg1, PARAMS)
        assert float(jnp.max(jnp.abs(out0 - out1))) > 1e-4

    def test_channel_attention_runs(self):
        cfg = dataclasses.replace(SMALL, channel_attention=True)
        out, hist = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        assert np.isfinite(np.asarray(hist)).all()

    def test_deterministic(self):
        a, _ = gatys.stylize(CONTENT, [STYLE1], SMALL, PARAMS)
        b, _ = gatys.stylize(CONTENT, [STYLE1], SMALL, PARAMS)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_random_init(self):
        cfg = dataclasses.replace(SMALL, random_init=True, num_steps=3)
        out, _ = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        assert out.shape == CONTENT.shape

    def test_strength_mapping(self):
        assert gatys.style_weight_from_strength(-1) == 5e5
        assert gatys.style_weight_from_strength(1.0) == pytest.approx(5e5)
        assert gatys.style_weight_from_strength(2.0) > 5e5


class TestAotCache:
    """utils/aot.py: serialized-executable cache for one-shot cold starts."""

    def test_roundtrip_and_cache_hit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TBIST_AOT_CACHE", "1")
        monkeypatch.setenv("TBIST_AOT_DIR", str(tmp_path))
        from tbist_tpu.utils import aot

        aot._LOADED.clear()
        cfg = dataclasses.replace(SMALL, num_steps=3)
        ref, ref_hist = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        # first AOT call: compiles + persists
        aot._LOADED.clear()
        out, hist = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        files = list(tmp_path.glob("gatys_stylize-*.jaxexec"))
        assert len(files) == 1 and files[0].stat().st_size > 0
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        # fresh-process shape: drop the in-memory handle, load from disk,
        # and prove no compile happens by poisoning .lower
        aot._LOADED.clear()
        monkeypatch.setattr(
            gatys._stylize_jit, "lower",
            lambda *a, **k: (_ for _ in ()).throw(AssertionError("compiled")),
        )
        out2, hist2 = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(hist2), np.asarray(ref_hist))

    def test_failure_falls_back_to_jit(self, tmp_path, monkeypatch):
        monkeypatch.setenv("TBIST_AOT_CACHE", "1")
        monkeypatch.setenv("TBIST_AOT_DIR", str(tmp_path))
        from tbist_tpu.utils import aot

        aot._LOADED.clear()
        monkeypatch.setattr(
            "jax.experimental.serialize_executable.serialize",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("backend says no")),
        )
        cfg = dataclasses.replace(SMALL, num_steps=3)
        out, hist = gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        assert out.shape == CONTENT.shape
        assert not list(tmp_path.glob("*.jaxexec"))

    def test_disabled_by_default(self, tmp_path, monkeypatch):
        monkeypatch.delenv("TBIST_AOT_CACHE", raising=False)
        monkeypatch.setenv("TBIST_AOT_DIR", str(tmp_path))
        cfg = dataclasses.replace(SMALL, num_steps=3)
        gatys.stylize(CONTENT, [STYLE1], cfg, PARAMS)
        assert not list(tmp_path.glob("*.jaxexec"))
