"""Official groundingdino_swint_ogc.pth -> JAX pytree converter.

Checkpoint naming follows the official IDEA-Research repo (the reference
loads it at text/subnetworks/groundingdino_text_object_detector.py:35 via
``clean_state_dict`` which strips a ``module.`` prefix).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from tbist_tpu.models import bert as bert_lib
from tbist_tpu.models import dino as dino_lib
from tbist_tpu.models import swin as swin_lib


def _clean(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = np.asarray(v, dtype=np.float32) if hasattr(v, "__array__") else v
    return out


def convert(
    sd_raw,
    cfg: dino_lib.DinoConfig = dino_lib.BASE,
    swin_cfg: swin_lib.SwinConfig = swin_lib.TINY,
    bert_cfg: bert_lib.BertConfig = bert_lib.BASE,
) -> Dict:
    sd = _clean(sd_raw)

    def arr(k):
        return jnp.asarray(sd[k])

    def lin_w(k):
        return jnp.asarray(sd[k]).T

    def ln(k):
        return {"scale": arr(f"{k}.weight"), "bias": arr(f"{k}.bias")}

    def conv_w(k):
        return jnp.asarray(np.transpose(sd[k], (2, 3, 1, 0)))

    def mha(prefix):
        return {
            "in_proj_w": lin_w(f"{prefix}.in_proj_weight"),
            "in_proj_b": arr(f"{prefix}.in_proj_bias"),
            "out_proj_w": lin_w(f"{prefix}.out_proj.weight"),
            "out_proj_b": arr(f"{prefix}.out_proj.bias"),
        }

    def deform(prefix):
        return {
            "value_proj_w": lin_w(f"{prefix}.value_proj.weight"),
            "value_proj_b": arr(f"{prefix}.value_proj.bias"),
            "sampling_offsets_w": lin_w(f"{prefix}.sampling_offsets.weight"),
            "sampling_offsets_b": arr(f"{prefix}.sampling_offsets.bias"),
            "attention_weights_w": lin_w(f"{prefix}.attention_weights.weight"),
            "attention_weights_b": arr(f"{prefix}.attention_weights.bias"),
            "output_proj_w": lin_w(f"{prefix}.output_proj.weight"),
            "output_proj_b": arr(f"{prefix}.output_proj.bias"),
        }

    def mlp(prefix, n):
        return [
            {"w": lin_w(f"{prefix}.layers.{i}.weight"), "b": arr(f"{prefix}.layers.{i}.bias")}
            for i in range(n)
        ]

    input_proj = []
    for i in range(4):
        input_proj.append(
            {
                "w": conv_w(f"input_proj.{i}.0.weight"),
                "b": arr(f"input_proj.{i}.0.bias"),
                "gn": ln(f"input_proj.{i}.1"),
            }
        )

    fusion_layers, text_layers, enc_layers = [], [], []
    for i in range(cfg.enc_layers):
        f = f"transformer.encoder.fusion_layers.{i}"
        fusion_layers.append(
            {
                "ln_v": ln(f"{f}.layer_norm_v"),
                "ln_l": ln(f"{f}.layer_norm_l"),
                "v_proj_w": lin_w(f"{f}.attn.v_proj.weight"),
                "v_proj_b": arr(f"{f}.attn.v_proj.bias"),
                "l_proj_w": lin_w(f"{f}.attn.l_proj.weight"),
                "l_proj_b": arr(f"{f}.attn.l_proj.bias"),
                "values_v_w": lin_w(f"{f}.attn.values_v_proj.weight"),
                "values_v_b": arr(f"{f}.attn.values_v_proj.bias"),
                "values_l_w": lin_w(f"{f}.attn.values_l_proj.weight"),
                "values_l_b": arr(f"{f}.attn.values_l_proj.bias"),
                "out_v_w": lin_w(f"{f}.attn.out_v_proj.weight"),
                "out_v_b": arr(f"{f}.attn.out_v_proj.bias"),
                "out_l_w": lin_w(f"{f}.attn.out_l_proj.weight"),
                "out_l_b": arr(f"{f}.attn.out_l_proj.bias"),
                "gamma_v": arr(f"{f}.gamma_v"),
                "gamma_l": arr(f"{f}.gamma_l"),
            }
        )
        tl = f"transformer.encoder.text_layers.{i}"
        text_layers.append(
            {
                "self_attn": mha(f"{tl}.self_attn"),
                "ln1": ln(f"{tl}.norm1"),
                "ln2": ln(f"{tl}.norm2"),
                "fc1_w": lin_w(f"{tl}.linear1.weight"),
                "fc1_b": arr(f"{tl}.linear1.bias"),
                "fc2_w": lin_w(f"{tl}.linear2.weight"),
                "fc2_b": arr(f"{tl}.linear2.bias"),
            }
        )
        el = f"transformer.encoder.layers.{i}"
        enc_layers.append(
            {
                "deform": deform(f"{el}.self_attn"),
                "ln1": ln(f"{el}.norm1"),
                "ln2": ln(f"{el}.norm2"),
                "fc1_w": lin_w(f"{el}.linear1.weight"),
                "fc1_b": arr(f"{el}.linear1.bias"),
                "fc2_w": lin_w(f"{el}.linear2.weight"),
                "fc2_b": arr(f"{el}.linear2.bias"),
            }
        )

    dec_layers = []
    for i in range(cfg.dec_layers):
        dl = f"transformer.decoder.layers.{i}"
        dec_layers.append(
            {
                "self_attn": mha(f"{dl}.self_attn"),
                "text_cross": mha(f"{dl}.ca_text"),
                "deform": deform(f"{dl}.cross_attn"),
                "ln_self": ln(f"{dl}.norm2"),
                "ln_text": ln(f"{dl}.catext_norm"),
                "ln_cross": ln(f"{dl}.norm1"),
                "ln_ffn": ln(f"{dl}.norm3"),
                "fc1_w": lin_w(f"{dl}.linear1.weight"),
                "fc1_b": arr(f"{dl}.linear1.bias"),
                "fc2_w": lin_w(f"{dl}.linear2.weight"),
                "fc2_b": arr(f"{dl}.linear2.bias"),
            }
        )

    return {
        "swin": swin_lib.convert_torch_state_dict(sd, "backbone.0.", swin_cfg),
        "bert": bert_lib.convert_hf_state_dict(sd, "bert.", bert_cfg),
        "feat_map_w": lin_w("feat_map.weight"),
        "feat_map_b": arr("feat_map.bias"),
        "input_proj": input_proj,
        "level_embed": arr("transformer.level_embed"),
        "fusion_layers": fusion_layers,
        "text_layers": text_layers,
        "enc_layers": enc_layers,
        "dec_layers": dec_layers,
        "enc_output_w": lin_w("transformer.enc_output.weight"),
        "enc_output_b": arr("transformer.enc_output.bias"),
        "enc_output_ln": ln("transformer.enc_output_norm"),
        "enc_bbox_mlp": mlp("transformer.enc_out_bbox_embed", 3),
        "bbox_mlp": mlp("bbox_embed.0", 3),
        "ref_point_head": mlp("transformer.decoder.ref_point_head", 2),
        "dec_norm": ln("transformer.decoder.norm"),
        "tgt_embed": arr("transformer.tgt_embed.weight"),
    }
