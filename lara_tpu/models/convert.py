"""Torch→flax checkpoint conversion for the full LaRa network.

Maps the reference Lightning checkpoint (`epoch=29.ckpt`,
/root/reference/README.md:14) onto `LaRaNet`'s parameter tree so the
released weights can be evaluated / fine-tuned on TPU and the two
implementations can be compared layer by layer (SURVEY.md §7 step 3).

Reference module naming (lightning/system.py:19 `self.net = Network(cfg)`;
lightning/network.py:286-340):
  net.img_encoder.model.*      timm vit_base_patch16_224.dino
  net.dir_norm.{norm,mlp.1}    ModLN (mlp = Sequential(SiLU, Linear))
  net.view_embed               [1, 4, C, 1, 1, 1]
  net.vol_decoder.pos_embed    [1, C, R, R, R]
  net.vol_decoder.layers.{i}.{norm1,cross_attn,mlp.0,mlp.3,norm2,norm3,cnn}
  net.vol_decoder.{norm,deconv}
  net.decoder.mlp_coarse.{0,2,4}
  net.decoder.{norm,cross_att,mlp_fine.0,mlp_fine.2}

Torch nn.MultiheadAttention with kdim/vdim != embed_dim stores separate
q_proj_weight/k_proj_weight/v_proj_weight (+ out_proj.weight); all Linear
weights are [out, in] → flax kernels are the transpose. Conv3d weights are
[out, in, kd, kh, kw] → flax [kd, kh, kw, in, out]. ConvTranspose3d weights
are [in, out, kd, kh, kw] → flax ConvTranspose [kd, kh, kw, in, out], with
the spatial taps FLIPPED (flax/lax `conv_transpose(transpose_kernel=False)`
correlates the kernel with the output grid in mirrored tap order relative to
torch's transposed convolution; verified against torch in
tests/test_convert.py).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from lara_tpu.models.vit import convert_timm_state_dict, stack_layers


def _a(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd, key):
    out = {"kernel": _a(sd[key + ".weight"]).T}
    if key + ".bias" in sd:
        out["bias"] = _a(sd[key + ".bias"])
    return out


def _layernorm(sd, key):
    return {"scale": _a(sd[key + ".weight"]), "bias": _a(sd[key + ".bias"])}


def _mha(sd, key):
    """nn.MultiheadAttention with separate kdim/vdim projections, bias=False."""
    return {
        "q_proj": {"kernel": _a(sd[key + ".q_proj_weight"]).T},
        "k_proj": {"kernel": _a(sd[key + ".k_proj_weight"]).T},
        "v_proj": {"kernel": _a(sd[key + ".v_proj_weight"]).T},
        "out_proj": {"kernel": _a(sd[key + ".out_proj.weight"]).T},
    }


def _modln(sd, key):
    return {
        "norm": _layernorm(sd, key + ".norm"),
        "mlp": _linear(sd, key + ".mlp.1"),  # Sequential(SiLU, Linear)
    }


def _conv3d(sd, key):
    out = {"kernel": _a(sd[key + ".weight"]).transpose(2, 3, 4, 1, 0)}
    if key + ".bias" in sd:
        out["bias"] = _a(sd[key + ".bias"])
    return out


def _deconv3d(sd, key):
    # torch [in, out, kd, kh, kw] → flax [kd, kh, kw, in, out], taps flipped
    w = _a(sd[key + ".weight"]).transpose(2, 3, 4, 0, 1)
    w = w[::-1, ::-1, ::-1].copy()
    out = {"kernel": w}
    if key + ".bias" in sd:
        out["bias"] = _a(sd[key + ".bias"])
    return out


def convert_network_state_dict(sd: Dict[str, Any], num_layers: int = 12,
                               encoder_depth: int = 12) -> Dict[str, Any]:
    """Reference `Network` state_dict (keys WITHOUT the leading 'net.') →
    LaRaNet params['params'] tree."""
    p: Dict[str, Any] = {}

    vit_sd = {k[len("img_encoder.model."):]: v for k, v in sd.items()
              if k.startswith("img_encoder.model.")}
    p["img_encoder"] = convert_timm_state_dict(vit_sd, depth=encoder_depth)

    p["dir_norm"] = _modln(sd, "dir_norm")

    if "view_embed" in sd:
        p["view_embed"] = _a(sd["view_embed"]).reshape(
            *_a(sd["view_embed"]).shape[:3])

    vol: Dict[str, Any] = {}
    vol["pos_embed"] = _a(sd["vol_decoder.pos_embed"]).transpose(0, 2, 3, 4, 1)
    layers = []
    for i in range(num_layers):
        k = f"vol_decoder.layers.{i}"
        layers.append({
            "norm1": _layernorm(sd, k + ".norm1"),
            "norm2": _layernorm(sd, k + ".norm2"),
            "norm3": _layernorm(sd, k + ".norm3"),
            "cross_attn": _mha(sd, k + ".cross_attn"),
            "mlp": {"fc1": _linear(sd, k + ".mlp.0"),
                    "fc2": _linear(sd, k + ".mlp.3")},
            "cnn": _conv3d(sd, k + ".cnn"),
        })
    vol["layers"] = {"block": stack_layers(layers)}
    vol["norm"] = _layernorm(sd, "vol_decoder.norm")
    vol["deconv"] = _deconv3d(sd, "vol_decoder.deconv")
    p["vol_decoder"] = vol

    p["decoder_coarse"] = {
        "fc0": _linear(sd, "decoder.mlp_coarse.0"),
        "fc1": _linear(sd, "decoder.mlp_coarse.2"),
        "out": _linear(sd, "decoder.mlp_coarse.4"),
    }
    p["decoder_fine"] = {
        "norm": _layernorm(sd, "decoder.norm"),
        "cross_att": _mha(sd, "decoder.cross_att"),
        "fc0": _linear(sd, "decoder.mlp_fine.0"),
        "fc1": _linear(sd, "decoder.mlp_fine.2"),
    }
    return p


def load_lightning_checkpoint(path: str, num_layers: int = 12,
                              encoder_depth: int = 12) -> Dict[str, Any]:
    """Load a reference Lightning .ckpt (or a bare torch state-dict file) and
    return {'params': <flax tree>} ready for LaRaNet.apply."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = {(k[4:] if k.startswith("net.") else k): v for k, v in sd.items()}
    return {"params": convert_network_state_dict(
        sd, num_layers=num_layers, encoder_depth=encoder_depth)}
