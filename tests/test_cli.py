"""End-to-end CLI driver tests (tbist_tpu.cli.main on the CPU backend).

The CLI is the headless parity surface for the reference's UIs
(basic.py modes / app.py effects); these run the real main() against tiny
images so argument plumbing, effect dispatch, output writing, the error
contract, and the resumable branch are all exercised as a user would.
"""

import numpy as np
import pytest
from PIL import Image

from tbist_tpu import cli


@pytest.fixture()
def tiny_image(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "in.png"
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


@pytest.fixture()
def tiny_style(tmp_path):
    rng = np.random.default_rng(1)
    p = tmp_path / "style.png"
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


class TestCliMain:
    def test_grayscale_pixel_art_chain(self, tiny_image, tmp_path):
        out = tmp_path / "out.png"
        rc = cli.main(
            ["--image", tiny_image, "--grayscale", "--pixel-art",
             "--pixel-size", "0.5", "--out", str(out)]
        )
        assert rc == 0 and out.exists()
        arr = np.asarray(Image.open(out))
        assert arr.shape == (32, 32, 3)

    def test_missing_style_exits_1(self, tiny_image, tmp_path):
        rc = cli.main(
            ["--image", tiny_image, "--style-transfer",
             "--out", str(tmp_path / "out.png")]
        )
        assert rc == 1

    def test_resumable_branch(self, tiny_image, tiny_style, tmp_path):
        out = tmp_path / "out.png"
        rc = cli.main(
            ["--image", tiny_image, "--style", tiny_style, "--style-transfer",
             "--steps", "4", "--segment-steps", "2",
             "--resume-dir", str(tmp_path / "ckpt"), "--out", str(out)]
        )
        assert rc == 0 and out.exists()
        # resuming a finished run does zero new work but still writes output
        out2 = tmp_path / "out2.png"
        rc = cli.main(
            ["--image", tiny_image, "--style", tiny_style, "--style-transfer",
             "--steps", "4", "--segment-steps", "2",
             "--resume-dir", str(tmp_path / "ckpt"), "--out", str(out2)]
        )
        assert rc == 0 and out2.exists()

    def test_aot_cache_flag(self, tiny_image, tiny_style, tmp_path,
                            monkeypatch):
        """--aot-cache persists a serialized executable and a second cold
        process-shape run loads it (utils/aot.py; mechanism covered in
        depth by tests/test_gatys.py TestAotCache)."""
        from tbist_tpu.utils import aot

        monkeypatch.setenv("TBIST_AOT_DIR", str(tmp_path / "aot"))
        monkeypatch.delenv("TBIST_AOT_CACHE", raising=False)
        aot._LOADED.clear()
        out = tmp_path / "out.png"
        rc = cli.main(
            ["--image", tiny_image, "--style", tiny_style, "--style-transfer",
             "--steps", "2", "--aot-cache", "--out", str(out)]
        )
        assert rc == 0 and out.exists()
        blobs = list((tmp_path / "aot").glob("gatys_stylize-*.jaxexec"))
        assert len(blobs) == 1 and blobs[0].stat().st_size > 0
        aot._LOADED.clear()  # fresh-process shape: must load from disk
        out2 = tmp_path / "out2.png"
        rc = cli.main(
            ["--image", tiny_image, "--style", tiny_style, "--style-transfer",
             "--steps", "2", "--aot-cache", "--out", str(out2)]
        )
        assert rc == 0 and out2.exists()
        np.testing.assert_array_equal(
            np.asarray(Image.open(out)), np.asarray(Image.open(out2))
        )
