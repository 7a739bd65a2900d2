"""Aux subsystems: checkpoint/resume, Pallas gram parity, weight converters."""

import json
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tbist_tpu.models import vgg19
from tbist_tpu.optimize import checkpoint as ckpt
from tbist_tpu.optimize import gatys
from tbist_tpu.utils.config import GatysConfig

PARAMS = vgg19.init_params(jax.random.key(0))
CONTENT = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3), jnp.float32)
STYLE = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), jnp.float32)


class TestCheckpointResume:
    def test_segments_resume_and_complete(self):
        cfg = GatysConfig(num_steps=6, w_style=1e3)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "run")
            out1, hist1 = ckpt.stylize_resumable(
                CONTENT, [STYLE], cfg, PARAMS, path, segment_steps=3
            )
            assert len(hist1) == 6
            assert ckpt.latest_step(path) == 6
            # re-invoking a finished run restores and does no extra work
            out2, hist2 = ckpt.stylize_resumable(
                CONTENT, [STYLE], cfg, PARAMS, path, segment_steps=3
            )
            assert hist2 == []
            np.testing.assert_allclose(
                np.asarray(out1), np.asarray(out2), atol=1e-6
            )

    def test_partial_then_resume(self):
        cfg_full = GatysConfig(num_steps=4, w_style=1e3)
        cfg_half = GatysConfig(num_steps=2, w_style=1e3)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "run")
            ckpt.stylize_resumable(CONTENT, [STYLE], cfg_half, PARAMS, path, 2)
            assert ckpt.latest_step(path) == 2
            out, hist = ckpt.stylize_resumable(
                CONTENT, [STYLE], cfg_full, PARAMS, path, 2
            )
            assert len(hist) == 2  # only the remaining segment ran
            assert ckpt.latest_step(path) == 4

    def test_no_overshoot_on_uneven_segments(self):
        """num_steps not a multiple of segment_steps must run exactly
        num_steps iterations (ADVICE r1: 250/100 used to run 300)."""
        cfg = GatysConfig(num_steps=5, w_style=1e3)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "run")
            _, hist = ckpt.stylize_resumable(
                CONTENT, [STYLE], cfg, PARAMS, path, segment_steps=3
            )
            assert len(hist) == 5
            assert ckpt.latest_step(path) == 5

    def test_random_init_honored_on_fresh_start(self):
        """cfg.random_init must seed the first segment from noise, matching
        a single unsegmented run (ADVICE r1: it was silently ignored)."""
        cfg = GatysConfig(num_steps=2, w_style=1e3, random_init=True)
        direct, _ = gatys.stylize(CONTENT, [STYLE], cfg, PARAMS)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "run")
            seg, _ = ckpt.stylize_resumable(
                CONTENT, [STYLE], cfg, PARAMS, path, segment_steps=2
            )
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(seg), atol=1e-6
        )
        # and it is genuinely different from a content-seeded run
        plain = gatys.stylize(
            CONTENT, [STYLE], GatysConfig(num_steps=2, w_style=1e3), PARAMS
        )[0]
        assert not np.allclose(np.asarray(direct), np.asarray(plain), atol=1e-3)


class TestPallasGramParity:
    def test_matches_xla_in_interpret_mode(self):
        """The Pallas kernel math must equal the einsum (CPU interpret)."""
        from jax.experimental.pallas import tpu as pltpu

        from tbist_tpu.ops import pallas_gram

        x = jax.random.uniform(jax.random.key(3), (1, 16, 16, 128), jnp.float32)
        norm = 1.0 / (1 * 128 * 16 * 16)
        want = np.asarray(
            jnp.einsum(
                "bnc,bnd->bcd",
                x.reshape(1, -1, 128),
                x.reshape(1, -1, 128),
                preferred_element_type=jnp.float32,
            )
            * norm
        )
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(pallas_gram.gram_matrix(x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


class TestPallasSamAttnParity:
    def test_matches_einsum_formulation(self):
        """Kernel == the decomposed-rel-pos einsum attention (interpret)."""
        from tbist_tpu.ops import pallas_sam_attn

        rng = np.random.default_rng(7)
        n, h, w, d = 3, 8, 16, 16  # non-square grid: h and w paths differ
        t = h * w
        q, k, v = (
            jnp.asarray(rng.standard_normal((n, t, d)), jnp.float32)
            for _ in range(3)
        )
        bh = jnp.asarray(rng.standard_normal((n, t, h)), jnp.float32)
        bw = jnp.asarray(rng.standard_normal((n, t, w)), jnp.float32)

        j = np.arange(t)
        bias = np.asarray(bh)[:, :, j // w] + np.asarray(bw)[:, :, j % w]
        logits = (
            np.einsum(
                "nqd,nkd->nqk", np.asarray(q, np.float64),
                np.asarray(k, np.float64),
            )
            + bias
        )
        attn = np.exp(logits - logits.max(-1, keepdims=True))
        attn /= attn.sum(-1, keepdims=True)
        want = np.einsum("nqk,nkd->nqd", attn, np.asarray(v, np.float64))

        got = np.asarray(
            pallas_sam_attn.attention_with_rel_bias(
                q, k, v, bh, bw, h, w, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_sam_encoder_routes_consistently(self):
        """Forced-on kernel == einsum path through the real _attn_rel."""
        import os

        from tbist_tpu.models import sam as sam_lib

        cfg = sam_lib.SamConfig(
            img_size=32, patch=4, width=16, layers=2, heads=2,
            global_layers=(1,), window=4, embed_dim=8,
        )
        params = sam_lib.init_params(jax.random.key(0), cfg)
        x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3), jnp.float32)
        os.environ["TBIST_PALLAS_SAM_ATTN"] = "0"
        try:
            want = np.asarray(sam_lib.encode_image(params, cfg, x))
            os.environ["TBIST_PALLAS_SAM_ATTN"] = "1"
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(sam_lib.encode_image(params, cfg, x))
        finally:
            del os.environ["TBIST_PALLAS_SAM_ATTN"]
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestConverters:
    def test_ghiasi_converter_roundtrip(self):
        """Torch-layout state dict -> pytree -> forward runs."""
        import torch

        from tbist_tpu.models import ghiasi
        from tbist_tpu.weights import ghiasi_convert

        sd = {}
        specs = [
            ("layers.0.conv", (32, 3, 9, 9)), ("layers.1.conv", (64, 32, 3, 3)),
            ("layers.2.conv", (128, 64, 3, 3)),
        ]
        for i in range(3, 8):
            specs += [
                (f"layers.{i}.conv1", (128, 128, 3, 3)),
                (f"layers.{i}.conv2", (128, 128, 3, 3)),
            ]
            for fc in ("fc_gamma1", "fc_beta1", "fc_gamma2", "fc_beta2"):
                specs.append((f"layers.{i}.{fc}", (128, 100)))
        for i, (cin, cout) in zip((8, 9, 10), ((128, 64), (64, 32), (32, 3))):
            specs.append((f"layers.{i}.conv", (cout, cin, 3 if i < 10 else 9, 3 if i < 10 else 9)))
            specs.append((f"layers.{i}.fc_gamma", (cout, 100)))
            specs.append((f"layers.{i}.fc_beta", (cout, 100)))
        g = torch.Generator().manual_seed(0)
        for name, shape in specs:
            sd[f"{name}.weight"] = torch.randn(shape, generator=g)
            sd[f"{name}.bias"] = torch.randn(shape[0], generator=g)
        params = ghiasi_convert.convert_ghiasi({k: v.numpy() for k, v in sd.items()})
        out = ghiasi.apply(
            params,
            jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1, 100)),
        )
        assert out.shape == (1, 32, 32, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_clip_mlp_converter_matches_torch(self):
        import torch
        import torch.nn as nn

        from tbist_tpu.models import clip_mlp
        from tbist_tpu.weights import ghiasi_convert

        torch.manual_seed(0)
        model = nn.Sequential(
            nn.Linear(512, 256), nn.LeakyReLU(0.2), nn.Linear(256, 256),
            nn.LeakyReLU(0.2), nn.Linear(256, 150), nn.LeakyReLU(0.2),
            nn.Linear(150, 150), nn.LeakyReLU(0.2), nn.Linear(150, 100),
            nn.Tanh(),
        )
        sd = {f"model.{k}": v for k, v in model.state_dict().items()}
        params = ghiasi_convert.convert_clip_mlp(
            {k: v.numpy() for k, v in sd.items()}
        )
        x = torch.randn(2, 512)
        want = model(x).detach().numpy()
        got = np.asarray(clip_mlp.apply(params, jnp.asarray(x.numpy())))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_vgg_converter_matches_torch(self):
        import torch
        import torch.nn as nn

        from tbist_tpu.weights import vgg as vgg_weights

        torch.manual_seed(1)
        conv = nn.Conv2d(3, 64, 3, padding=1)
        sd = {"features.0.weight": conv.weight, "features.0.bias": conv.bias}
        # fill remaining convs with small randoms
        idx_ch = [(2, 64, 64), (5, 64, 128), (7, 128, 128), (10, 128, 256),
                  (12, 256, 256), (14, 256, 256), (16, 256, 256), (19, 256, 512),
                  (21, 512, 512), (23, 512, 512), (25, 512, 512), (28, 512, 512),
                  (30, 512, 512), (32, 512, 512), (34, 512, 512)]
        for i, cin, cout in idx_ch:
            sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.01
            sd[f"features.{i}.bias"] = torch.zeros(cout)
        params = vgg_weights.convert_torch_state_dict(
            {k: v.detach().numpy() for k, v in sd.items()}
        )
        x = torch.randn(1, 3, 8, 8)
        want = conv(x).detach().numpy()  # conv1_1 pre-ReLU
        feats = vgg19.extract_features(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            ("conv1_1",),
        )
        got = np.asarray(feats["conv1_1"]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_vgg_env_pth_beats_stale_npz_cache(self, tmp_path, monkeypatch):
        """ADVICE r1: an explicit TBIST_VGG19_PTH must win over a stale
        converted-cache npz."""
        import torch

        from tbist_tpu.weights import vgg as vgg_weights

        torch.manual_seed(2)
        idx_ch = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
                  (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
                  (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
                  (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512)]
        sd = {}
        for i, cin, cout in idx_ch:
            sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.01
            sd[f"features.{i}.bias"] = torch.zeros(cout)
        pth = tmp_path / "vgg19.pth"
        torch.save(sd, pth)

        # a stale npz cache holding DIFFERENT (zero) weights, older than pth
        fake = vgg_weights.convert_torch_state_dict(
            {k: np.zeros_like(v.numpy()) for k, v in sd.items()}
        )
        flat = {}
        for name, p in fake.items():
            flat[f"{name}.kernel"] = p["kernel"]
            flat[f"{name}.bias"] = p["bias"]
        npz = tmp_path / "vgg19.npz"
        np.savez(npz, **flat)
        os.utime(npz, (0, 0))  # stale

        monkeypatch.setattr(vgg_weights, "_CACHE_DIR", str(tmp_path))
        monkeypatch.setenv("TBIST_VGG19_PTH", str(pth))
        vgg_weights.get_params.cache_clear()
        try:
            params = vgg_weights.get_params()
            want = np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0))
            np.testing.assert_allclose(
                np.asarray(params["conv1_1"]["kernel"]), want, atol=1e-6
            )
        finally:
            vgg_weights.get_params.cache_clear()


class TestVerifyAllRunbook:
    def test_all_missing_is_ok_but_strict_fails(self, tmp_path, monkeypatch):
        from tbist_tpu.weights import verify_all

        for var in ("TBIST_VGG19_PTH", "TBIST_CLIP_PTH", "TBIST_CLIP_BPE",
                    "TBIST_T5_EMOJI_DIR", "TBIST_DEPTH_PTH"):
            monkeypatch.delenv(var, raising=False)
        monkeypatch.setattr(verify_all, "CACHE", str(tmp_path))
        assert verify_all.main([]) == 0
        assert verify_all.main(["--strict"]) == 1
        manifest = json.loads((tmp_path / "MANIFEST.json").read_text())
        assert all("MISSING" in v for v in manifest["results"].values())

    def test_vgg_family_converts_and_passes(self, tmp_path, monkeypatch):
        """End-to-end: a synthetic torchvision-layout .pth goes through the
        real loader + behavioral battery."""
        import torch

        from tbist_tpu.weights import vgg as vgg_weights
        from tbist_tpu.weights import verify_all

        torch.manual_seed(0)
        idx_ch = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
                  (10, 128, 256), (12, 256, 256), (14, 256, 256), (16, 256, 256),
                  (19, 256, 512), (21, 512, 512), (23, 512, 512), (25, 512, 512),
                  (28, 512, 512), (30, 512, 512), (32, 512, 512), (34, 512, 512)]
        sd = {}
        for i, cin, cout in idx_ch:
            sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
            sd[f"features.{i}.bias"] = torch.zeros(cout)
        pth = tmp_path / "vgg19.pth"
        torch.save(sd, pth)

        monkeypatch.setattr(verify_all, "CACHE", str(tmp_path))
        monkeypatch.setattr(vgg_weights, "_CACHE_DIR", str(tmp_path))
        # verify_all sets TBIST_VGG19_PTH via os.environ directly; register
        # the key with monkeypatch so the teardown removes it (otherwise it
        # leaks into later tests and converts the synthetic pth for them)
        monkeypatch.setenv("TBIST_VGG19_PTH", str(pth))
        vgg_weights.get_params.cache_clear()
        try:
            rep = verify_all.Report()
            assert verify_all.verify_vgg(rep, str(pth))
            assert rep.results["vgg"].startswith("PASS")
            assert "vgg19.pth" in rep.manifest["vgg"]
            assert len(rep.manifest["vgg"]["vgg19.pth"]["sha256"]) == 64
        finally:
            vgg_weights.get_params.cache_clear()


class TestSeedCache:
    """weights/seed_cache.py — disk cache for seeded-init pytrees (the
    load-from-disk startup shape the reference has via .pth files,
    README.md:28-46)."""

    @staticmethod
    def _init():
        key = jax.random.key(3)
        return {
            "a": jax.random.normal(key, (4, 5), jnp.float32),
            "b": {"c": jnp.zeros((2,), jnp.float32)},
        }

    def test_miss_builds_then_hit_loads_from_disk(self, tmp_path, monkeypatch):
        from tbist_tpu.weights import seed_cache

        monkeypatch.setattr(seed_cache, "_CACHE_DIR", str(tmp_path))
        first = seed_cache.cached_seeded_init("t1", self._init)
        path = tmp_path / "t1.npz"
        assert path.exists()
        np.testing.assert_array_equal(
            np.asarray(first["a"]), np.asarray(self._init()["a"])
        )
        # overwrite the stored leaves: a second call must return the
        # DISK values (proof it loads rather than re-inits)
        data = dict(np.load(path))
        data["0"] = data["0"] + 7.0
        np.savez(path, **data)
        second = seed_cache.cached_seeded_init("t1", self._init)
        np.testing.assert_array_equal(
            np.asarray(second["a"]), np.asarray(first["a"]) + 7.0
        )

    def test_shape_drift_rebuilds(self, tmp_path, monkeypatch):
        from tbist_tpu.weights import seed_cache

        monkeypatch.setattr(seed_cache, "_CACHE_DIR", str(tmp_path))
        path = tmp_path / "t2.npz"
        np.savez(
            path,
            **{"0": np.zeros((9, 9), np.float32), "1": np.zeros((2,), np.float32)},
        )
        out = seed_cache.cached_seeded_init("t2", self._init)
        np.testing.assert_array_equal(
            np.asarray(out["a"]), np.asarray(self._init()["a"])
        )
        rebuilt = np.load(path)
        assert rebuilt["0"].shape == (4, 5)

    def test_env_kill_switch_skips_disk(self, tmp_path, monkeypatch):
        from tbist_tpu.weights import seed_cache

        monkeypatch.setattr(seed_cache, "_CACHE_DIR", str(tmp_path))
        monkeypatch.setenv("TBIST_SEED_CACHE", "0")
        out = seed_cache.cached_seeded_init("t3", self._init)
        np.testing.assert_array_equal(
            np.asarray(out["a"]), np.asarray(self._init()["a"])
        )
        assert not (tmp_path / "t3.npz").exists()


class TestPallasPoolParity:
    def test_matches_auto_vjp_in_interpret_mode(self):
        """Pallas pool backward == XLA automatic VJP, incl. tie splitting."""
        from jax.experimental.pallas import tpu as pltpu

        from tbist_tpu.ops import pallas_pool

        def auto_pool(x):
            b, h, w, c = x.shape
            return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))

        x = jax.random.uniform(jax.random.key(5), (1, 16, 12, 8), jnp.float32)
        x = jnp.round(x * 4) / 4  # force exact ties
        with pltpu.force_tpu_interpret_mode():
            f1 = np.asarray(pallas_pool.max_pool_2x2_even(x))
            g1 = np.asarray(
                jax.grad(lambda x: jnp.sum(pallas_pool.max_pool_2x2_even(x) ** 2))(x)
            )
        f2 = np.asarray(auto_pool(x))
        g2 = np.asarray(jax.grad(lambda x: jnp.sum(auto_pool(x) ** 2))(x))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_allclose(g1, g2, atol=1e-6)


class TestPallasReluPoolParity:
    def test_fused_relu_pool_backward_matches_auto_vjp(self):
        """Fused relu->pool Pallas backward == XLA automatic VJP of
        maxpool2x2(relu(pre)), incl. tie splitting and relu'(0)=0."""
        from jax.experimental.pallas import tpu as pltpu

        from tbist_tpu.ops import pallas_relu_pool

        def auto(pre):
            x = jax.nn.relu(pre)
            b, h, w, c = x.shape
            return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))

        pre = jax.random.uniform(
            jax.random.key(6), (1, 16, 12, 8), jnp.float32, -0.5, 0.5
        )
        pre = jnp.round(pre * 4) / 4  # exact ties AND exact zeros
        with pltpu.force_tpu_interpret_mode():
            f1 = np.asarray(pallas_relu_pool.relu_max_pool_2x2_even(pre))
            g1 = np.asarray(
                jax.grad(
                    lambda p: jnp.sum(
                        pallas_relu_pool.relu_max_pool_2x2_even(p) ** 2
                    )
                )(pre)
            )
        f2 = np.asarray(auto(pre))
        g2 = np.asarray(jax.grad(lambda p: jnp.sum(auto(p) ** 2))(pre))
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_allclose(g1, g2, atol=1e-6)

    def test_negative_pre_blocks_gradient(self):
        from jax.experimental.pallas import tpu as pltpu

        from tbist_tpu.ops import pallas_relu_pool

        pre = -jnp.ones((1, 4, 4, 8), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(pallas_relu_pool.relu_max_pool_2x2_even(pre))
            g = np.asarray(
                jax.grad(
                    lambda p: jnp.sum(pallas_relu_pool.relu_max_pool_2x2_even(p))
                )(pre)
            )
        np.testing.assert_array_equal(out, 0.0)
        np.testing.assert_array_equal(g, 0.0)
