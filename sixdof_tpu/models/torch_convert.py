"""Convert reference PyTorch checkpoints -> flax params for our networks.

Maps the state-dict layout of the reference's RefineNet / ScoreNetMultiPair
(weights/<run>/model_best.pth, loaded at predict_pose_refine.py:138-143 and
predict_score.py:151-156) onto models/networks.py:

- Conv2d weight (O,I,kh,kw) -> flax kernel (kh,kw,I,O)
- Linear weight (out,in) -> flax kernel (in,out)
- MultiheadAttention in_proj_weight/bias -> packed-QKV Dense
- TransformerEncoderLayer norm1/norm2 -> LayerNorm scale/bias

No torch import is required unless a .pth file is actually loaded.
"""
from __future__ import annotations

import numpy as np


def _conv(sd, key):
    return {
        "kernel": np.ascontiguousarray(np.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))),
        "bias": sd[f"{key}.bias"],
    }


def _dense(sd, key):
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T), "bias": sd[f"{key}.bias"]}


def _mha(sd, key):
    return {
        "in_proj": {
            "kernel": np.ascontiguousarray(sd[f"{key}.in_proj_weight"].T),
            "bias": sd[f"{key}.in_proj_bias"],
        },
        "out_proj": _dense(sd, f"{key}.out_proj"),
    }


def _layernorm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _encoder_layer(sd, key):
    return {
        "self_attn": _mha(sd, f"{key}.self_attn"),
        "linear1": _dense(sd, f"{key}.linear1"),
        "linear2": _dense(sd, f"{key}.linear2"),
        "norm1": _layernorm(sd, f"{key}.norm1"),
        "norm2": _layernorm(sd, f"{key}.norm2"),
    }


def _trunk(sd, a_name, ab_name):
    """encodeA/encodeAB stacks. Sequential index layout:
    [0]=ConvBNReLU(net.0=conv), [1]=ConvBNReLU, [2],[3]=ResBlock(conv1/conv2)
    for A;  [0],[1]=ResBlock, [2]=ConvBNReLU, [3],[4]=ResBlock for AB."""
    out = {}
    out["encodeA_0"] = {"conv": _conv(sd, f"{a_name}.0.net.0")}
    out["encodeA_1"] = {"conv": _conv(sd, f"{a_name}.1.net.0")}
    for i, j in [(2, 2), (3, 3)]:
        out[f"encodeA_{j}"] = {
            "conv1": _conv(sd, f"{a_name}.{i}.conv1"),
            "conv2": _conv(sd, f"{a_name}.{i}.conv2"),
        }
    out["encodeAB_0"] = {
        "conv1": _conv(sd, f"{ab_name}.0.conv1"), "conv2": _conv(sd, f"{ab_name}.0.conv2")
    }
    out["encodeAB_1"] = {
        "conv1": _conv(sd, f"{ab_name}.1.conv1"), "conv2": _conv(sd, f"{ab_name}.1.conv2")
    }
    out["encodeAB_2"] = {"conv": _conv(sd, f"{ab_name}.2.net.0")}
    out["encodeAB_3"] = {
        "conv1": _conv(sd, f"{ab_name}.3.conv1"), "conv2": _conv(sd, f"{ab_name}.3.conv2")
    }
    out["encodeAB_4"] = {
        "conv1": _conv(sd, f"{ab_name}.4.conv1"), "conv2": _conv(sd, f"{ab_name}.4.conv2")
    }
    return out


def state_dict_to_numpy(ckpt):
    """torch state dict (possibly under a 'model' key) -> {str: np.ndarray}."""
    if "model" in ckpt and not hasattr(ckpt["model"], "shape"):
        ckpt = ckpt["model"]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def convert_refine_net(sd):
    """Reference RefineNet state dict -> flax params for models.RefineNet."""
    sd = state_dict_to_numpy(sd)
    return {
        "trunk": _trunk(sd, "encodeA", "encodeAB"),
        "trans_encoder": _encoder_layer(sd, "trans_head.0"),
        "trans_linear": _dense(sd, "trans_head.1"),
        "rot_encoder": _encoder_layer(sd, "rot_head.0"),
        "rot_linear": _dense(sd, "rot_head.1"),
    }


def convert_score_net(sd):
    """Reference ScoreNetMultiPair state dict -> flax params."""
    sd = state_dict_to_numpy(sd)
    return {
        "trunk": _trunk(sd, "encoderA", "encoderAB"),
        "att": _mha(sd, "att"),
        "att_cross": _mha(sd, "att_cross"),
        "linear": _dense(sd, "linear"),
    }


def load_torch_checkpoint(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
