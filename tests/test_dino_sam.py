"""Host-side logic of the DINO+SAM mask extractor (no weights needed)."""

import numpy as np
import pytest

from tbist_tpu.models import dino_sam


class TestDetectionSize:
    def test_short_side_800(self):
        nh, nw = dino_sam._detection_size(480, 640)
        # scale = 800/480 -> (800, 1066) -> bucketed to multiples of 32
        assert nh % 32 == 0 and nw % 32 == 0
        assert abs(nh - 800) <= 16 and abs(nw - 1067) <= 16

    def test_max_size_cap(self):
        nh, nw = dino_sam._detection_size(100, 1000)
        assert max(nh, nw) <= 1333 + 16  # bucket rounding tolerance

    def test_square(self):
        nh, nw = dino_sam._detection_size(512, 512)
        assert nh == nw == 800


class TestWordpiece:
    VOCAB = {
        "[CLS]": 0, "[SEP]": 1, "[UNK]": 2, "boat": 3, ".": 4,
        "sail": 5, "##ing": 6, "a": 7,
    }

    def test_simple_words(self):
        ids = dino_sam._simple_bert_tokenize("a boat .", self.VOCAB)
        assert ids == [0, 7, 3, 4, 1]

    def test_wordpiece_split(self):
        ids = dino_sam._simple_bert_tokenize("sailing", self.VOCAB)
        assert ids == [0, 5, 6, 1]

    def test_unknown_token(self):
        ids = dino_sam._simple_bert_tokenize("xylophone", self.VOCAB)
        assert ids == [0, 2, 1]

    def test_lowercasing(self):
        ids = dino_sam._simple_bert_tokenize("BOAT", self.VOCAB)
        assert ids == [0, 3, 1]


class TestExtractorFallback:
    def test_missing_weights_raise(self):
        with pytest.raises(Exception):
            dino_sam.get_mask_extractor.__wrapped__()
