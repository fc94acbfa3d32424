"""Torch checkpoint -> Flax variables converter.

Maps the reference ``UmeTrackModel`` state-dict layout (module tree built in
/root/reference/lib/models/model_loader.py:53-83) onto our NHWC Flax tree:
conv kernels OIHW -> HWIO, linear (out,in) -> (in,out), BatchNorm
weight/bias/running stats -> scale/bias/mean/var.  Works from a plain
``{name: np.ndarray}`` dict, so torch is only needed by the caller that
loads the pickle.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .config import ModelConfig


def _conv(sd, name):
    out = {"kernel": np.transpose(np.asarray(sd[f"{name}.weight"]), (2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _linear(sd, name):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{name}.weight"])),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _bn_params(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _bn_stats(sd, name):
    return {
        "mean": np.asarray(sd[f"{name}.running_mean"]),
        "var": np.asarray(sd[f"{name}.running_var"]),
    }


def _basic_block(sd, prefix, has_downsample):
    params = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "bn1": _bn_params(sd, f"{prefix}.bn1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "bn2": _bn_params(sd, f"{prefix}.bn2"),
    }
    stats = {
        "bn1": _bn_stats(sd, f"{prefix}.bn1"),
        "bn2": _bn_stats(sd, f"{prefix}.bn2"),
    }
    if has_downsample:
        params["downsample_conv"] = _conv(sd, f"{prefix}.downsample.0")
        params["downsample_bn"] = _bn_params(sd, f"{prefix}.downsample.1")
        stats["downsample_bn"] = _bn_stats(sd, f"{prefix}.downsample.1")
    return params, stats


def convert_state_dict(
    sd: Mapping[str, Any], config: ModelConfig | None = None
) -> Dict[str, Dict]:
    """Convert a reference state dict to ``{"params": ..., "batch_stats": ...}``."""
    cfg = config or ModelConfig()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # --- backbone: _feature_extractor._image_backbone = Sequential(resnet, proj)
    bb = "_feature_extractor._image_backbone"
    b_params: Dict[str, Any] = {
        "stem_conv": _conv(sd, f"{bb}.0._layers.0.0"),
        "stem_bn": _bn_params(sd, f"{bb}.0._layers.0.1"),
        "proj_conv": _conv(sd, f"{bb}.1"),
    }
    b_stats: Dict[str, Any] = {"stem_bn": _bn_stats(sd, f"{bb}.0._layers.0.1")}
    in_planes = cfg.stage_in_planes
    out_planes = cfg.stage_out_planes
    for si, (n_blocks, stride) in enumerate(
        zip(cfg.backbone_blocks, cfg.backbone_strides)
    ):
        for bi in range(n_blocks):
            has_ds = bi == 0 and (stride != 1 or in_planes[si] != out_planes[si])
            p, s = _basic_block(sd, f"{bb}.0._layers.{si + 1}.{bi}", has_ds)
            b_params[f"stage{si}_block{bi}"] = p
            b_stats[f"stage{si}_block{bi}"] = s
    params["backbone"] = b_params
    stats["backbone"] = b_stats

    # --- fusion ladder: Sequential [Conv, BN, ReLU] * n + final Conv
    fu = "_feature_extractor._multi_view_fusion"
    f_params: Dict[str, Any] = {}
    f_stats: Dict[str, Any] = {}
    for i in range(cfg.n_fusion_blocks):
        f_params[f"conv{i}"] = _conv(sd, f"{fu}.{3 * i}")
        f_params[f"bn{i}"] = _bn_params(sd, f"{fu}.{3 * i + 1}")
        f_stats[f"bn{i}"] = _bn_stats(sd, f"{fu}.{3 * i + 1}")
    f_params["conv_out"] = _conv(sd, f"{fu}.{3 * cfg.n_fusion_blocks}")
    params["fusion"] = f_params
    stats["fusion"] = f_stats

    # --- temporal: Sequential [Conv, ReLU] * (n-1) + Conv
    tm = "_temporal._temporal_module"
    params["temporal"] = {
        f"conv{i}": _conv(sd, f"{tm}.{2 * i}") for i in range(cfg.n_temporal_blocks)
    }

    # --- skeleton encoder: Sequential [Linear, View, BN, ReLU]
    se = "_skeleton_enc._layers"
    params["skeleton_encoder"] = {
        "linear": _linear(sd, f"{se}.0"),
        "bn": _bn_params(sd, f"{se}.2"),
    }
    stats["skeleton_encoder"] = {"bn": _bn_stats(sd, f"{se}.2")}

    # --- regressors: Sequential [BasicBlock * n, Conv, AdaptiveAvgPool]
    for reg_name, torch_name in (
        ("regressor_k", "_regressor_k"),
        ("regressor_u", "_regressor_u"),
    ):
        rp: Dict[str, Any] = {}
        rs: Dict[str, Any] = {}
        pr = f"{torch_name}._pose_regression_layers"
        for i in range(cfg.n_regression_blocks):
            p, s = _basic_block(sd, f"{pr}.{i}", has_downsample=False)
            rp[f"block{i}"] = p
            rs[f"block{i}"] = s
        rp["conv_out"] = _conv(sd, f"{pr}.{cfg.n_regression_blocks}")
        params[reg_name] = rp
        stats[reg_name] = rs

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str, config: ModelConfig | None = None):
    """Load a reference ``pretrained_weights.torch`` file and convert it."""
    import torch

    with open(path, "rb") as fp:
        sd = torch.load(fp, map_location="cpu")
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_state_dict(sd_np, config)
