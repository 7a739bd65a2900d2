"""UI request-building logic (pure functions — no gradio needed)."""

import pytest

from tbist_tpu.ui import basic_cli, gradio_app


class TestGradioRequestBuilder:
    def _build(self, effects, text_effects=(), **over):
        args = dict(
            effects=list(effects),
            text_effects=list(text_effects),
            text_style="night", text_location="boat", text_texture="fire",
            edge_smoothing=5.0, emoji_blur=95, emoji_step=0.5,
            emoji_strength=1.5, pixel_effects=[], pixel_size=0.4,
            palette_idx=0, palette_interp=False, edge_threshold=50,
            palette_from_image=False, palette_n_colors=10, style_weight=0.5,
            channel_attention=False, depth_mode=gradio_app.DEPTH_EFFECTS[1],
            mip_n=2, interp_frames=0, slowmo=0.0,
        )
        args.update(over)
        return gradio_app._build_request(**args)

    def test_no_effects(self):
        req = self._build([])
        assert not req.grayscale and req.text is None and req.pixel_art is None

    def test_text_prompts_follow_checkboxes(self):
        req = self._build(
            [gradio_app.MAIN_EFFECTS[1]],
            [gradio_app.TEXT_EFFECTS[0], gradio_app.TEXT_EFFECTS[2]],
        )
        assert req.text.style_prompt == "night"
        assert req.text.location_prompt is None  # checkbox off
        assert req.text.texture_prompt == "fire"

    def test_depth_mode_mapping(self):
        req = self._build(
            [gradio_app.MAIN_EFFECTS[6]], depth_mode=gradio_app.DEPTH_EFFECTS[0]
        )
        assert req.depth.mode == "depth_loss"
        req = self._build(
            [gradio_app.MAIN_EFFECTS[6]], depth_mode=gradio_app.DEPTH_EFFECTS[1]
        )
        assert req.depth.mode == "mip"

    def test_mixing_weight_reaches_gatys(self):
        req = self._build([gradio_app.MAIN_EFFECTS[4]], style_weight=0.8)
        assert req.style_mixing
        assert req.gatys.style_img_weight == 0.8


class TestBasicCliModes:
    def test_mode_table_covers_nine(self):
        assert len(basic_cli.MODES) == 9

    @pytest.mark.parametrize("mode,fields", [
        (0, ("style_prompt",)),
        (1, ("location_prompt",)),
        (2, ("texture_prompt",)),
        (5, ("style_prompt", "location_prompt", "texture_prompt")),
        (6, ("location_prompt", "texture_prompt")),
    ])
    def test_text_modes(self, mode, fields):
        prompts = {"transfer": "t", "location": "l", "texture": "x"}
        req = basic_cli._request_for(mode, prompts)
        for f in fields:
            assert getattr(req.text, f) is not None

    def test_style_and_depth_modes(self):
        assert basic_cli._request_for(7, {}).style_transfer
        assert basic_cli._request_for(8, {}).depth is not None
