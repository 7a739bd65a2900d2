"""Text → binary mask: GroundingDINO detection + SAM segmentation.

Capability parity with text/TextMaskExtractor.py:25-68:
* detect boxes for the prompt (appended '.'), filter by
  box_threshold=0.3 on sigmoid logits then text_threshold=0.5 on
  token-level matches;
* cxcywh[0-1] → xyxy pixels;
* zero detections → all-False (H, W) mask;
* SAM masks for all boxes, summed and thresholded to one bool mask.

Requires converted checkpoints (weights_cache/groundingdino_swint_ogc.pth,
sam_vit_b_01ec64.pth) and a BERT vocab (weights_cache/bert_vocab.txt or an
explicit path via TBIST_BERT_VOCAB); effects.masking falls back to a
deterministic extractor when any are missing.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import dino as dino_lib
from tbist_tpu.models import sam as sam_lib
from tbist_tpu.utils.logging import logger

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "weights_cache"
)

# GroundingDINO preprocess (groundingdino_text_object_detector.py:43-49):
# RandomResize([800], max_size=1333) + ImageNet normalize. We bucket the
# resized shape to multiples of 32 to bound XLA compiles.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
BOX_THRESHOLD = 0.3
TEXT_THRESHOLD = 0.5


def _detection_size(h: int, w: int, size=800, max_size=1333) -> Tuple[int, int]:
    short, long = min(h, w), max(h, w)
    scale = size / short
    if long * scale > max_size:
        scale = max_size / long
    nh, nw = int(round(h * scale)), int(round(w * scale))
    # bucket to multiples of 32 (XLA compile cache)
    return max(32, round(nh / 32) * 32), max(32, round(nw / 32) * 32)


@functools.partial(jax.jit, static_argnames=("cfg", "swin_cfg", "bert_cfg"))
def _dino_jit(
    params, cfg, image, input_ids, text_mask, text_feats,
    swin_cfg=None, bert_cfg=None,
):
    kw = {}
    if swin_cfg is not None:
        kw["swin_cfg"] = swin_cfg
    if bert_cfg is not None:
        kw["bert_cfg"] = bert_cfg
    return dino_lib.forward(
        params, cfg, image, input_ids, text_mask, text_feats=text_feats, **kw
    )


@functools.partial(jax.jit, static_argnames=("cfg", "bert_cfg"))
def _dino_text_jit(params, cfg, input_ids, text_mask, bert_cfg=None):
    kw = {} if bert_cfg is None else {"bert_cfg": bert_cfg}
    return dino_lib.encode_text(params, cfg, input_ids, text_mask, **kw)


# prompt -> (ids, device text features). A video run calls detect() once
# per frame with the SAME prompt; the BERT prefix is image-independent
# (dino.encode_text), so it computes once and the per-frame program skips
# it. Bounded: repeated single-image prompts benefit too.
#
# Entries hold strong refs to their params pytree (id-recycling safety),
# which PINS that tree's device buffers. In production there is exactly
# one params object for the process lifetime (get_mask_extractor is
# lru_cached), so that is free — but code that swaps params (benchmarks,
# tests) must call clear_text_feature_cache() after dropping a tree or
# its HBM stays allocated until the 64-entry clear.
_TEXT_FEAT_CACHE: dict = {}


def clear_text_feature_cache() -> None:
    """Drop cached text features (releases pinned params device buffers)."""
    _TEXT_FEAT_CACHE.clear()


def _text_features(dino_params, prompt: str, vocab: dict, cfg=None, bert_cfg=None):
    cfg = cfg or dino_lib.BASE
    # id()-keyed on params AND vocab; the cache value keeps strong refs to
    # both so neither id can be recycled by the allocator while the entry
    # lives (a GC'd params dict could otherwise alias a fresh one).
    key = (id(dino_params), id(vocab), prompt, cfg, bert_cfg)
    hit = _TEXT_FEAT_CACHE.get(key)
    if hit is not None:
        return hit[0]
    ids = _simple_bert_tokenize(prompt, vocab)
    input_ids = jnp.asarray([ids], jnp.int32)
    text_mask = jnp.ones_like(input_ids)
    feats = _dino_text_jit(dino_params, cfg, input_ids, text_mask, bert_cfg=bert_cfg)
    entry = (ids, input_ids, text_mask, feats)
    if len(_TEXT_FEAT_CACHE) > 64:
        _TEXT_FEAT_CACHE.clear()
    _TEXT_FEAT_CACHE[key] = (entry, dino_params, vocab)
    return entry


def _is_punctuation(ch: str) -> bool:
    """HF BertTokenizer punctuation test: ASCII symbol ranges + Unicode P*."""
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    import unicodedata

    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


def _basic_tokenize(text: str) -> List[str]:
    """HF BasicTokenizer (uncased): clean, isolate CJK chars, lowercase,
    strip accents (NFD, drop Mn), split on punctuation.

    This is what GroundingDINO's BertTokenizer applies before WordPiece
    (text/subnetworks/groundingdino_text_object_detector.py:69-70 always
    appends '.', so punctuation splitting is on every real prompt's path).
    """
    import unicodedata

    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or unicodedata.category(ch) in ("Cc", "Cf"):
            if ch not in ("\t", "\n", "\r"):
                continue
        if ch.isspace() or ch in ("\t", "\n", "\r"):
            cleaned.append(" ")
        elif _is_cjk(cp):
            cleaned.extend((" ", ch, " "))
        else:
            cleaned.append(ch)
    out: List[str] = []
    for token in "".join(cleaned).split():
        token = token.lower()
        token = "".join(
            c for c in unicodedata.normalize("NFD", token)
            if unicodedata.category(c) != "Mn"
        )
        # split on punctuation, keeping each punctuation char as its own token
        word: List[str] = []
        for ch in token:
            if _is_punctuation(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
    return out


def _wordpiece(word: str, vocab: dict) -> List[str]:
    """HF WordpieceTokenizer: greedy longest-match; any unmatched remainder
    turns the WHOLE word into [UNK] (not just the tail)."""
    if len(word) > 100:
        return ["[UNK]"]
    pieces: List[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        piece = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                piece = sub
                break
            end -= 1
        if piece is None:
            return ["[UNK]"]
        pieces.append(piece)
        start = end
    return pieces


def _simple_bert_tokenize(prompt: str, vocab: dict) -> List[int]:
    """HF-faithful uncased BERT tokenization: [CLS] BasicTokenizer→WordPiece [SEP].

    Parity target: transformers.BertTokenizer('bert-base-uncased'), which
    GroundingDINO uses for every prompt. E.g. 'boat.' → [CLS] boat . [SEP].
    """
    unk = vocab.get("[UNK]", 100)
    ids = [vocab["[CLS]"]]
    for word in _basic_tokenize(prompt):
        for piece in _wordpiece(word, vocab):
            ids.append(vocab.get(piece, unk))
    ids.append(vocab["[SEP]"])
    return ids


def _decode_phrase(token_ids: List[int], inv_vocab: dict) -> str:
    """HF ``tokenizer.decode`` semantics for wordpiece ids: '##' pieces
    merge into the previous token, others join with spaces, then the
    standard clean_up_tokenization space fixes are applied. This is what
    the official ``get_phrases_from_posmap`` returns per box
    (text/subnetworks/groundingdino_text_object_detector.py:94)."""
    words: List[str] = []
    for tid in token_ids:
        tok = inv_vocab.get(tid, "[UNK]")
        if tok.startswith("##") and words:
            words[-1] += tok[2:]
        else:
            words.append(tok)
    out = " ".join(words)
    for a, b in (
        (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","), (" ' ", "'"),
        (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"), (" 've", "'ve"),
        (" 're", "'re"),
    ):
        out = out.replace(a, b)
    return out


@functools.lru_cache(maxsize=1)
def _load_vocab():
    path = os.environ.get(
        "TBIST_BERT_VOCAB", os.path.join(_CACHE_DIR, "bert_vocab.txt")
    )
    if not os.path.exists(path):
        raise FileNotFoundError(f"no BERT vocab at {path}")
    with open(path) as f:
        return {tok.rstrip("\n"): i for i, tok in enumerate(f)}


def preprocess_image(
    image,
    resize: bool = False,
    square: bool = False,
    height: int = 512,
    width: int = 512,
    left: int = 0,
    right: int = 0,
    top: int = 0,
    bottom: int = 0,
    return_offsets: bool = False,
):
    """Crop / square / resize preprocessing, host-side.

    Capability parity with TextMaskExtractor._preprocess_image
    (text/TextMaskExtractor.py:70-131): crop `left/right/top/bottom` pixels,
    optionally center-crop to square, optionally resize to (height, width).
    Returns (H, W, 3) uint8 RGB — with ``return_offsets`` also
    ``(oy, ox, ph, pw)``: the crop's top-left corner in the original frame
    and the pre-resize crop shape, so a mask computed on the preprocessed
    image can be placed back into original coordinates
    (effects.masking.extract_location_mask). Two intended divergences (see
    PARITY.md): the reference clamps `top` by `h-left-1` (typo) and passes
    PIL.resize the swapped (height, width) tuple; we clamp top by h-1 and
    resize to an actual height×width result.
    """
    if isinstance(image, str):
        from PIL import Image

        image = np.array(Image.open(image).convert("RGB"))
    else:
        image = np.asarray(image)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    image = image[:, :, :3]
    h, w = image.shape[:2]
    left = min(left, w - 1)
    right = min(right, w - left - 1)
    top = min(top, h - 1)
    bottom = min(bottom, h - top - 1)
    image = image[top : h - bottom, left : w - right]
    oy, ox = top, left
    h, w = image.shape[:2]
    if square:
        if h < w:
            off = (w - h) // 2
            image = image[:, off : off + h]
            ox += off
        elif w < h:
            off = (h - w) // 2
            image = image[off : off + w]
            oy += off
    ph, pw = image.shape[:2]
    if resize:
        import jax

        x = jnp.asarray(image, jnp.float32)
        x = jax.image.resize(x, (height, width, x.shape[-1]), "bilinear")
        image = np.asarray(jnp.clip(jnp.round(x), 0, 255), np.uint8)
    image = np.ascontiguousarray(image)
    if return_offsets:
        return image, (oy, ox, ph, pw)
    return image


def filter_phrases(
    logits: np.ndarray, ids: List[int], inv_vocab: dict
) -> Tuple[np.ndarray, List[str]]:
    """get_phrases_from_posmap filtering over box-level sigmoid logits.

    ``logits`` is (N, T) sigmoid scores for N boxes that already passed
    BOX_THRESHOLD. Per box: tokens above TEXT_THRESHOLD form the phrase,
    except position 0 ([CLS]) and positions >= 255 — a [SEP] or '.' above
    text_threshold IS part of the decoded phrase, and an empty decode
    drops the box (groundingdino_text_object_detector.py:92-100). Returns
    (keep bool (N,), phrases for kept boxes with '(score)' suffixes).
    """
    logits = np.asarray(logits)
    phrases, keep = [], np.zeros(logits.shape[0], bool)
    for i, row in enumerate(logits):
        token_keep = row > TEXT_THRESHOLD
        token_keep[0] = False
        token_keep[255:] = False
        phrase = _decode_phrase(
            [ids[j] for j in np.where(token_keep)[0]], inv_vocab
        )
        if phrase:
            # reference formats the score as str(x)[:4] -> e.g. "(0.53)",
            # "(0.5)" (groundingdino_text_object_detector.py:97)
            phrases.append(phrase + f"({str(float(row.max()))[:4]})")
            keep[i] = True
    return keep, phrases


def _device_uint8(image) -> jnp.ndarray:
    """(H, W, 3) uint8 -> on-device uint8 array (no-op if already there)."""
    if isinstance(image, jnp.ndarray):
        return image
    return jnp.asarray(np.ascontiguousarray(image))


def _detect_dispatch(
    dino_params, img_dev: jnp.ndarray, prompt: str, vocab: dict,
    cfg=None, swin_cfg=None, bert_cfg=None, det_hw=None,
):
    """Queue the GroundingDINO forward; return (ids, async outputs).

    Does NOT block on the device — the caller may queue further programs
    (the SAM image encoder, which is image-only) before fetching. The
    optional cfg/det_hw overrides let tiny weights-free tests drive the
    exact production chain.
    """
    cfg = cfg or dino_lib.BASE
    if not prompt.endswith("."):
        prompt = prompt + "."
    ids, input_ids, text_mask, text_feats = _text_features(
        dino_params, prompt, vocab, cfg=cfg, bert_cfg=bert_cfg
    )
    h, w = img_dev.shape[:2]
    nh, nw = det_hw or _detection_size(h, w)
    # uint8 upload + device-side cast (axon tunnel: 4x fewer bytes than f32)
    x = img_dev[None].astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (1, nh, nw, 3), "bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    out = _dino_jit(
        dino_params, cfg, x, input_ids, text_mask, text_feats,
        swin_cfg=swin_cfg, bert_cfg=bert_cfg,
    )
    return ids, out


_INV_VOCAB_CACHE: list = []  # [(vocab, inverse)] — identity-keyed, tiny


def _inv_vocab(vocab: dict) -> dict:
    """Inverse id→token map, cached per vocab object (inverting the
    30k-entry BERT vocab per detect() call is host work inside the
    DINO-fetch window the chain overlap works to hide)."""
    for v, inv in _INV_VOCAB_CACHE:
        if v is vocab:
            return inv
    inv = {i: tok for tok, i in vocab.items()}
    if len(_INV_VOCAB_CACHE) >= 4:
        _INV_VOCAB_CACHE.clear()
    _INV_VOCAB_CACHE.append((vocab, inv))
    return inv


def _detect_collect(ids, out, vocab) -> Tuple[np.ndarray, List[str]]:
    """Block on the DINO outputs, threshold, and decode phrases."""
    logits = np.asarray(jax.nn.sigmoid(out["pred_logits"]))[0]  # (900, T)
    boxes = np.asarray(out["pred_boxes"])[0]  # (900, 4)
    keep = logits.max(axis=1) > BOX_THRESHOLD
    logits, boxes = logits[keep], boxes[keep]
    keep2, phrases = filter_phrases(logits, ids, _inv_vocab(vocab))
    return boxes[keep2], phrases


def detect(
    dino_params, image: np.ndarray, prompt: str, **cfg_kw
) -> Tuple[np.ndarray, List[str]]:
    """(H, W, 3) uint8 RGB + prompt -> (boxes cxcywh in [0,1], phrases)."""
    vocab = cfg_kw.pop("vocab", None) or _load_vocab()
    ids, out = _detect_dispatch(
        dino_params, _device_uint8(image), prompt, vocab, **cfg_kw
    )
    return _detect_collect(ids, out, vocab)


def _detect_dispatch_batch(
    dino_params, frames_dev: jnp.ndarray, prompt: str, vocab: dict,
    cfg=None, swin_cfg=None, bert_cfg=None, det_hw=None,
):
    """Queue ONE GroundingDINO forward over a (B, H, W, 3) uint8 frame
    chunk. The prompt's BERT text features compute once (prompt cache)
    and tile over the batch — per-frame outputs are bit-exact vs the
    single-image program. Returns (ids, async outputs) without blocking,
    like _detect_dispatch."""
    cfg = cfg or dino_lib.BASE
    if not prompt.endswith("."):
        prompt = prompt + "."
    ids, input_ids, text_mask, text_feats = _text_features(
        dino_params, prompt, vocab, cfg=cfg, bert_cfg=bert_cfg
    )
    b, h, w = frames_dev.shape[:3]
    nh, nw = det_hw or _detection_size(h, w)
    x = frames_dev.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (b, nh, nw, 3), "bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    out = _dino_jit(
        dino_params, cfg, x,
        jnp.tile(input_ids, (b, 1)), jnp.tile(text_mask, (b, 1)),
        jnp.tile(text_feats, (b, 1, 1)),
        swin_cfg=swin_cfg, bert_cfg=bert_cfg,
    )
    return ids, out


def extract_masks_batch(
    dino_params, sam_params, frames, prompt: str,
    sam_cfg=None, vocab=None, det_size: int = 800, det_max: int = 1333,
    seg_size: int = 0,
    **cfg_kw,
) -> jnp.ndarray:
    """Batched TextMaskExtractor: (B, H, W, 3) uint8 frames + ONE prompt
    -> DEVICE (B, H, W) bool masks.

    The masked-text VIDEO chain (reference: text/TextMaskExtractor.py:25-68
    executed per frame inside app.py:784-815) as three device programs per
    chunk instead of 3·B serial dispatches: one DINO forward over the
    chunk, one SAM image-encoder over the chunk (queued before the host
    blocks on DINO, same overlap as extract_mask), and one vmapped SAM
    decode where each frame's variable box count is padded to a shared K
    (bucketed to a power of two to bound compiles; padded boxes masked
    out). Host work per chunk is thresholding the small (B, 900, T)
    logits. Per-frame semantics match extract_mask: zero detections ->
    all-False mask."""
    sam_cfg = sam_cfg or sam_lib.BASE
    if seg_size:
        sam_params, sam_cfg = sam_lib.params_for_size(
            sam_params, sam_cfg, seg_size
        )
    vocab = vocab or _load_vocab()
    frames_dev = _device_uint8(frames)
    b, h, w = frames_dev.shape[:3]
    cfg_kw.setdefault("det_hw", _detection_size(h, w, det_size, det_max))
    ids, pending = _detect_dispatch_batch(
        dino_params, frames_dev, prompt, vocab, **cfg_kw
    )
    embs, scale, nh, nw = sam_lib.encode_uint8_batch(
        sam_params, sam_cfg, frames_dev
    )
    logits = np.asarray(jax.nn.sigmoid(pending["pred_logits"]))  # (B, 900, T)
    pboxes = np.asarray(pending["pred_boxes"])
    inv = _inv_vocab(vocab)
    per_frame = []
    nmax = 0
    for i in range(b):
        keep = logits[i].max(axis=1) > BOX_THRESHOLD
        keep2, _ = filter_phrases(logits[i][keep], ids, inv)
        bx = _boxes_to_xyxy(pboxes[i][keep][keep2], h, w)
        per_frame.append(bx)
        nmax = max(nmax, bx.shape[0])
    if nmax == 0:
        return jnp.zeros((b, h, w), bool)
    k = 1 << (nmax - 1).bit_length()
    boxes = np.zeros((b, k, 4), np.float32)
    valid = np.zeros((b, k), bool)
    for i, bx in enumerate(per_frame):
        boxes[i, : bx.shape[0]] = bx
        valid[i, : bx.shape[0]] = True
    return sam_lib.masks_from_embedding_batch(
        sam_params, sam_cfg, embs, scale, nh, nw, h, w, boxes, valid
    )


@functools.lru_cache(maxsize=1)
def get_batch_mask_extractor() -> Callable:
    """Batch variant of get_mask_extractor: (B, H, W, 3) uint8 frames +
    prompt -> DEVICE (B, H, W) bool masks. Raises like get_mask_extractor
    when checkpoints are missing (effects.masking falls back)."""
    dino_params, sam_params = get_loaded_params()

    def extractor(
        frames, prompt: str, det_size: int = 800, det_max: int = 1333,
        seg_size: int = 0,
    ) -> jnp.ndarray:
        return extract_masks_batch(
            dino_params, sam_params, frames, prompt,
            det_size=det_size, det_max=det_max, seg_size=seg_size,
        )

    return extractor


def _boxes_to_xyxy(boxes: np.ndarray, h: int, w: int) -> np.ndarray:
    """cxcywh [0,1] -> xyxy pixels (TextMaskExtractor.py:55-59)."""
    scale = np.array([w, h, w, h], np.float32)
    b = boxes * scale
    return np.stack(
        [b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
         b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], axis=1,
    )


def extract_mask(
    dino_params, sam_params, image: np.ndarray, prompt: str,
    sam_cfg=None, vocab=None, det_size: int = 800, det_max: int = 1333,
    seg_size: int = 0,
    **cfg_kw,
) -> jnp.ndarray:
    """Full TextMaskExtractor pipeline -> (H, W) bool mask.

    TPU-first chain layout (vs the strictly serial reference
    TextMaskExtractor.py:25-68): the frame is uploaded ONCE as uint8 and
    shared by both models, and the SAM image encoder (image-only, no box
    dependency) is queued on-device BEFORE the host blocks on DINO's
    logits — the device runs DINO then SAM back-to-back while the host
    does its thresholding/phrase work, instead of idling between stages.

    Intended tradeoff: when DINO detects NOTHING the SAM encoder ran for
    naught (the strictly serial reference skips it,
    TextMaskExtractor.py:52-53) — the encoder cannot wait for the box
    count without forfeiting the overlap, and the boxes-found case is
    the product's common path (PROFILE.md round-3d: −24% chain latency).
    """
    sam_cfg = sam_cfg or sam_lib.BASE
    if seg_size:  # TextEffectConfig.segmentation_size (0/default = 1024)
        sam_params, sam_cfg = sam_lib.params_for_size(
            sam_params, sam_cfg, seg_size
        )
    h, w = image.shape[:2]
    vocab = vocab or _load_vocab()
    img_dev = _device_uint8(image)
    # detection resolution knob (TextEffectConfig.detection_size): defaults
    # reproduce the reference RandomResize([800], max 1333) preprocess
    cfg_kw.setdefault("det_hw", _detection_size(h, w, det_size, det_max))
    ids, pending = _detect_dispatch(dino_params, img_dev, prompt, vocab, **cfg_kw)
    emb, scale, nh, nw = sam_lib.encode_uint8(sam_params, sam_cfg, img_dev)
    boxes, _ = _detect_collect(ids, pending, vocab)
    if boxes.shape[0] == 0:
        return jnp.zeros((h, w), bool)
    xyxy = _boxes_to_xyxy(boxes, h, w)
    masks = sam_lib.masks_from_embedding(
        sam_params, sam_cfg, emb, scale, nh, nw, h, w, xyxy
    )
    return jnp.asarray(masks.sum(0) > 0)


@functools.lru_cache(maxsize=1)
def get_loaded_params() -> Tuple:
    """(dino_params, sam_params) from the checkpoint cache; raises if
    either checkpoint (or the BERT vocab) is missing. One process-wide
    params pair shared by the single and batch extractors."""
    dino_path = os.environ.get(
        "TBIST_DINO_PTH", os.path.join(_CACHE_DIR, "groundingdino_swint_ogc.pth")
    )
    if not os.path.exists(dino_path):
        raise FileNotFoundError(f"no GroundingDINO checkpoint at {dino_path}")
    _load_vocab()  # raise early if vocab missing
    import torch

    from tbist_tpu.weights import dino_convert

    ckpt = torch.load(dino_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    dino_params = dino_convert.convert({k: v.numpy() for k, v in sd.items()})
    logger.info("GroundingDINO: converted checkpoint from %s", dino_path)
    sam_params = sam_lib.get_loaded_params()  # raises if SAM missing
    return dino_params, sam_params


@functools.lru_cache(maxsize=1)
def get_mask_extractor() -> Callable:
    dino_params, sam_params = get_loaded_params()

    def extractor(
        image, prompt: str, det_size: int = 800, det_max: int = 1333,
        seg_size: int = 0,
    ) -> jnp.ndarray:
        arr = np.asarray(image)
        if arr.ndim == 4:
            arr = arr[0]
        if arr.dtype.kind == "f":
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        # same single-upload + overlapped-dispatch chain as extract_mask
        return extract_mask(
            dino_params, sam_params, arr, prompt,
            det_size=det_size, det_max=det_max, seg_size=seg_size,
        )

    return extractor
