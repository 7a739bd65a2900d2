"""Cross-request micro-batching: equality with the sequential path,
coalescing behavior, and the serve wiring (api/batching.py).

The reference has no serving/batching layer (every request runs alone,
app.py:116-740); these tests pin the TPU-native addition's contract:
batching changes scheduling, never outputs.
"""

import base64
import io
import json
import threading
import time
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tbist_tpu.api import batching
from tbist_tpu.effects import text_transfer as tt
from tbist_tpu.utils.request_schema import request_from_dict


def _rand_images(n, h=24, w=24, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, h, w, 3)).astype(np.float32)


class TestPerformTransferBatch:
    def test_matches_sequential(self):
        imgs = _rand_images(3)
        prompts = ["fire", "water colors", "fire"]
        batched = np.asarray(tt.perform_transfer_batch(jnp.asarray(imgs), prompts))
        for i, p in enumerate(prompts):
            single = np.asarray(tt.perform_transfer(jnp.asarray(imgs[i : i + 1]), p))
            np.testing.assert_allclose(batched[i], single[0], atol=1e-4)

    def test_padding_is_invisible(self):
        imgs = jnp.asarray(_rand_images(3, seed=1))
        prompts = ["a", "b", "c"]
        padded = np.asarray(tt.perform_transfer_batch(imgs, prompts))
        unpadded = np.asarray(
            tt.perform_transfer_batch(imgs, prompts, pad_to_bucket=False)
        )
        assert padded.shape == (3, 24, 24, 3)
        np.testing.assert_allclose(padded, unpadded, atol=1e-5)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            tt.perform_transfer_batch(jnp.zeros((2, 8, 8, 3)), ["one"])

    def test_batch_shards_over_production_mesh(self, monkeypatch):
        """On >1 device the batch shards over the production dp mesh
        (conftest provides 8 virtual CPU devices), padded to a dp
        multiple, and outputs match the mesh-disabled run."""
        captured = {}
        real = tt._transfer_jit

        def spy(g, m, images, emb):
            captured["sharding"] = images.sharding
            captured["n_shards"] = len(images.addressable_shards)
            captured["batch"] = images.shape[0]
            return real(g, m, images, emb)

        monkeypatch.setattr(tt, "_transfer_jit", spy)
        imgs = jnp.asarray(_rand_images(3, seed=8))
        prompts = ["x", "y", "z"]
        sharded = np.asarray(tt.perform_transfer_batch(imgs, prompts))
        assert captured["n_shards"] == 8
        assert not captured["sharding"].is_fully_replicated
        assert captured["batch"] == 8  # 3 -> 4 (pow2 bucket) -> 8 (dp mult)
        assert sharded.shape == (3, 24, 24, 3)

        monkeypatch.setenv("TBIST_DISABLE_MESH", "1")
        unsharded = np.asarray(tt.perform_transfer_batch(imgs, prompts))
        assert captured["n_shards"] == 1
        np.testing.assert_allclose(sharded, unsharded, atol=1e-5)


class TestEligibility:
    def test_fast_text_only_is_eligible(self):
        req = request_from_dict({"text": {"style_prompt": "fire"}})
        assert batching.eligible(req)

    @pytest.mark.parametrize(
        "extra",
        [
            {"grayscale": True},
            {"text": {"style_prompt": "fire", "location_prompt": "dog"}},
            {"text": {"style_prompt": "fire", "texture_prompt": "fire"}},
            {"style_transfer": True},
            {"pixel_art": {}},
            {"color_palette": True},
        ],
    )
    def test_anything_else_routes_to_pipeline(self, extra):
        base = {"text": {"style_prompt": "fire"}}
        d = dict(base)
        for k, v in extra.items():
            if k == "text":
                d["text"] = v
            else:
                d[k] = v
        assert not batching.eligible(request_from_dict(d))

    def test_no_text_not_eligible(self):
        assert not batching.eligible(request_from_dict({}))


class TestBatcher:
    def test_coalesces_concurrent_requests(self):
        b = batching.FastTextBatcher(max_batch=4, window_ms=400.0)
        imgs = _rand_images(4, seed=2)
        results = [None] * 4

        def worker(i):
            results[i] = b.submit(imgs[i], "fire")

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        # all four shared one device program
        assert b.batches_run == 1
        assert b.requests_served == 4
        assert b.last_batch_sizes == [4]
        expected = np.asarray(
            tt.perform_transfer_batch(jnp.asarray(imgs), ["fire"] * 4)
        )
        for i in range(4):
            np.testing.assert_allclose(results[i], expected[i], atol=1e-4)

    def test_mixed_shapes_split_into_groups(self):
        b = batching.FastTextBatcher(max_batch=4, window_ms=400.0)
        small = _rand_images(1, 16, 16, seed=3)[0]
        big = _rand_images(1, 24, 24, seed=4)[0]
        out = {}

        def worker(key, img):
            out[key] = b.submit(img, "water")

        threads = [
            threading.Thread(target=worker, args=("s", small)),
            threading.Thread(target=worker, args=("b", big)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert out["s"].shape == (16, 16, 3)
        assert out["b"].shape == (24, 24, 3)
        assert b.batches_run == 2  # one program per shape group

    def test_error_propagates_to_every_waiter(self, monkeypatch):
        def boom(*a, **k):
            raise RuntimeError("synthetic failure")

        monkeypatch.setattr(tt, "perform_transfer_batch", boom)
        b = batching.FastTextBatcher(max_batch=2, window_ms=100.0)
        errs = []

        def worker():
            try:
                b.submit(_rand_images(1, seed=5)[0], "x")
            except RuntimeError as e:
                errs.append(str(e))

        threads = [threading.Thread(target=worker) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert errs == ["synthetic failure"] * 2
        # the worker survives a failed batch and serves later requests
        monkeypatch.undo()
        ok = b.submit(_rand_images(1, seed=6)[0], "fire")
        assert ok.shape == (24, 24, 3)

    def test_bad_image_shape_rejected(self):
        b = batching.FastTextBatcher()
        with pytest.raises(ValueError):
            b.submit(np.zeros((8, 8), np.float32), "x")

    def test_uint8_submit_matches_float(self):
        """uint8 images upload as-is (4x fewer bytes) and cast on device;
        the result equals submitting the same pixels as f32 [0, 1]."""
        b = batching.FastTextBatcher(max_batch=1)
        u8 = (_rand_images(1, seed=7)[0] * 255).astype(np.uint8)
        out_u8 = b.submit(u8, "fire")
        out_f = b.submit(u8.astype(np.float32) / 255.0, "fire")
        np.testing.assert_allclose(out_u8, out_f, atol=1e-6)

    def test_mixed_dtypes_split_into_groups(self):
        """A uint8 and a f32 request of the same shape must NOT share a
        np.stack (promotion would mis-scale the uint8 rows)."""
        b = batching.FastTextBatcher(max_batch=4, window_ms=400.0)
        img = _rand_images(1, seed=9)[0]
        out = {}

        def worker(key, arr):
            out[key] = b.submit(arr, "water")

        threads = [
            threading.Thread(target=worker, args=("f", img)),
            threading.Thread(
                target=worker, args=("u", (img * 255).astype(np.uint8))
            ),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert b.batches_run == 2  # one program per dtype group
        np.testing.assert_allclose(out["f"], out["u"], atol=1e-2)

    def test_quantize_uint8_result(self):
        """quantize_uint8 fetches device-quantized uint8 equal to host
        to_uint8 of the float result."""
        from tbist_tpu.utils.imageio import to_uint8

        img = _rand_images(1, seed=10)[0]
        bq = batching.FastTextBatcher(max_batch=1, quantize_uint8=True)
        bf = batching.FastTextBatcher(max_batch=1)
        out_q = bq.submit(img, "fire")
        assert out_q.dtype == np.uint8
        np.testing.assert_array_equal(out_q, to_uint8(bf.submit(img, "fire")))


def _b64(img: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


class TestServeBatching:
    @pytest.fixture(scope="class")
    def server_url(self):
        from tbist_tpu import serve

        srv = serve.make_server(port=0, batch_max=4, batch_window_ms=150.0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}", srv
        srv.shutdown()

    def test_concurrent_fast_text_requests_batch(self, server_url):
        url, srv = server_url
        rng = np.random.default_rng(7)
        img = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        payload = {
            "image": _b64(img),
            "request": {"text": {"style_prompt": "fire"}},
        }
        replies = [None, None]

        def worker(i):
            replies[i] = _post(url + "/v1/image", payload)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
            time.sleep(0.01)  # inside the 150 ms window
        for t in threads:
            t.join(timeout=120)
        for status, data in replies:
            assert status == 200
            assert "batch" in data and data["batch"] >= 1
            out = np.asarray(
                Image.open(io.BytesIO(base64.b64decode(data["image"])))
            )
            assert out.shape == (24, 24, 3)
        assert srv.batcher.requests_served >= 2
        # both replies carry identical pixels (same image, same prompt)
        assert replies[0][1]["image"] == replies[1][1]["image"]

    def test_healthz_reports_batcher_stats(self, server_url):
        url, srv = server_url
        with urllib.request.urlopen(url + "/healthz") as r:
            data = json.loads(r.read())
        b = data["batching"]
        assert b["max_batch"] == 4
        assert b["requests_served"] == srv.batcher.requests_served
        assert b["batches_run"] == srv.batcher.batches_run

    def test_ineligible_request_uses_pipeline(self, server_url):
        url, srv = server_url
        served_before = srv.batcher.requests_served
        img = np.zeros((16, 16, 3), np.uint8)
        status, data = _post(
            url + "/v1/image",
            {"image": _b64(img), "request": {"grayscale": True}},
        )
        assert status == 200
        assert "batch" not in data
        assert srv.batcher.requests_served == served_before
