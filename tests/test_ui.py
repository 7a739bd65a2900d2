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


class TestReferenceWidgetCoverage:
    """Every input the reference wires into apply_image_process
    (app.py:1196-1201, 25 widgets) must map to a _build_request argument
    or an image input of the api layer — proving UI surface parity without
    gradio installed (it is absent in this environment)."""

    # reference widget -> (kind, our name); kind "builder" = _build_request
    # parameter, "image" = api.apply_image input wired in gradio_app.run
    MAPPING = {
        "image_input": ("image", "image_path"),
        "checkbox_input": ("builder", "effects"),
        "input_style": ("image", "style_image"),
        "text_specific_style_checkbox": ("builder", "text_effects"),
        "text_style_transfer_text_box": ("builder", "text_style"),
        "location_masking_text_box": ("builder", "text_location"),
        "style_masking_text_box": ("builder", "text_texture"),
        "text_masked_transfer_edge_smoothing": ("builder", "edge_smoothing"),
        "text_emoji_blur_strength": ("builder", "emoji_blur"),
        "text_emoji_step_size": ("builder", "emoji_step"),
        "text_masked_style_strength": ("builder", "emoji_strength"),
        "p_size_slider": ("builder", "pixel_size"),
        "p_checkbox": ("builder", "pixel_effects"),
        "p_colour_dropbox": ("builder", "palette_idx"),
        "p_colour_interpolate": ("builder", "palette_interp"),
        "p_edge_slider": ("builder", "edge_threshold"),
        "p_select_im": ("builder", "palette_from_image"),
        "p_in": ("image", "pixel_palette_image"),
        "p_in_slid": ("builder", "palette_n_colors"),
        "style_image_weight": ("builder", "style_weight"),
        "style_image1": ("image", "style_image1"),
        "style_image2": ("image", "style_image2"),
        "color_palette_style": ("image", "color_palette_image"),
        "d_checkbox": ("builder", "depth_mode"),
        "depth_mip_n": ("builder", "mip_n"),
    }

    def test_all_25_reference_widgets_covered(self):
        import inspect

        from tbist_tpu import api

        assert len(self.MAPPING) == 25
        builder_params = set(
            inspect.signature(gradio_app._build_request).parameters
        )
        api_params = set(inspect.signature(api.apply_image).parameters)
        for ref_widget, (kind, ours) in self.MAPPING.items():
            if kind == "builder":
                assert ours in builder_params, (ref_widget, ours)
            else:
                # image inputs flow through api.apply_image keyword args
                # (image_path is the positional image)
                assert ours == "image_path" or ours in api_params, (
                    ref_widget, ours,
                )

    def test_video_extras_also_covered(self):
        # apply_video_process additionally takes interpolation/slowmo
        # sliders (reference app.py:1223-1231 video panel)
        import inspect

        builder_params = set(
            inspect.signature(gradio_app._build_request).parameters
        )
        assert {"interp_frames", "slowmo"} <= builder_params


class TestPalettePreview:
    def test_list_display_covers_all_palettes(self):
        from tbist_tpu.effects import pixel_art as pa

        plain = gradio_app.palette_list_display(size=(8, 64))
        interp = gradio_app.palette_list_display(size=(8, 64), interpolate=True)
        n = len(pa.load_palette_list())
        assert len(plain) == len(interp) == n == 70
        assert all(p.shape == (8, 64, 3) for p in plain)
        # interpolated differs from plain for multi-color palettes
        assert any(
            not (p == q).all() for p, q in zip(plain, interp)
        )

    def test_preview_selected_palette(self):
        import numpy as np

        from tbist_tpu.effects import pixel_art as pa
        from tbist_tpu.ops import palette as palette_ops

        got = gradio_app.palette_preview(3, False, False, None, 10, size=(8, 64))
        want = palette_ops.render_palette_strip(pa.get_palette(3), (8, 64))
        np.testing.assert_array_equal(got, want)

    def test_preview_none_is_blank(self):
        got = gradio_app.palette_preview(None, False, False, None, 10)
        assert got.shape == (100, 100, 3) and not got.any()

    def test_preview_from_image_extracts_palette(self):
        import numpy as np

        # two-color image -> 2-color palette rendered as a strip
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, 8:] = (200, 40, 40)
        got = gradio_app.palette_preview(0, False, True, img, 2, size=(8, 64))
        colors = np.unique(got.reshape(-1, 3), axis=0)
        # strip shows (about) the two source colors (plus possible black pad)
        assert got.shape == (8, 64, 3)
        assert len(colors) <= 3
        assert any(c[0] > 150 for c in colors)  # the red cluster survived


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


class TestCliMaskPreprocessFlags:
    def test_flags_flow_into_request(self):
        from tbist_tpu.cli import build_parser, request_from_args

        args = build_parser().parse_args(
            ["--image", "x.jpg", "--text-location", "boat",
             "--mask-crop", "1", "2", "3", "4", "--mask-square",
             "--mask-resize", "64", "48", "--out", "/tmp/o.png"]
        )
        req = request_from_args(args)
        assert req.text.mask_crop == (1, 2, 3, 4)
        assert req.text.mask_square
        assert req.text.mask_resize == (64, 48)

    def test_defaults_disabled(self):
        from tbist_tpu.cli import build_parser, request_from_args

        args = build_parser().parse_args(
            ["--image", "x.jpg", "--text-location", "boat", "--out", "/tmp/o.png"]
        )
        req = request_from_args(args)
        assert req.text.mask_crop == (0, 0, 0, 0)
        assert not req.text.mask_square
        assert req.text.mask_resize == ()
