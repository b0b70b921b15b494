"""Torch-checkpoint import: layout conversion + name mapping.

Enables loading the reference's released checkpoints
(LRW_CKPT_epoch_167_step_213864.ckpt, Vox+LRS2+LRS3.ckpt — SURVEY.md §6) into
the Flax models for parity evaluation. Covers SURVEY hard part (d):
torch/timm layouts (OIHW convs, [out,in] linears, BN running stats) ->
flax (HWIO, [in,out], batch_stats collections).

Usage: ``state_dict = torch.load(...)["state_dict"]`` then
``params, batch_stats = convert_resnet_trunk(state_dict, "resnet.")`` etc.,
merged into a fresh model tree via utils.checkpoint.partial_load.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_conv(w) -> np.ndarray:
    """torch conv weight OI(T)HW -> flax (T)HWIO."""
    w = _np(w)
    if w.ndim == 5:   # conv3d [O, I, T, H, W] -> [T, H, W, I, O]
        return w.transpose(2, 3, 4, 1, 0)
    if w.ndim == 4:   # conv2d [O, I, H, W] -> [H, W, I, O]
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 3:   # conv1d [O, I, K] -> [K, I, O]
        return w.transpose(2, 1, 0)
    raise ValueError(f"not a conv weight: shape {w.shape}")


def convert_linear(w) -> np.ndarray:
    """torch linear [out, in] -> flax kernel [in, out]."""
    return _np(w).transpose(1, 0)


def convert_bn(sd: Dict[str, Any], prefix: str) -> Tuple[Dict, Dict]:
    """BatchNorm params + running stats."""
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_resnet_trunk(sd: Dict[str, Any], prefix: str = "resnet."
                         ) -> Tuple[Dict, Dict]:
    """timm/torchvision resnet18 layer1..layer4 -> models.resnet.ResNetTrunk.

    torch names: {prefix}layer{L}.{B}.conv1/bn1/conv2/bn2[/downsample.0|1]
    flax names:  layer{L}_{B}/{conv1,bn1,conv2,bn2,downsample_conv,downsample_bn}
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for layer in range(1, 5):
        block = 0
        while f"{prefix}layer{layer}.{block}.conv1.weight" in sd:
            tname = f"{prefix}layer{layer}.{block}"
            fname = f"layer{layer}_{block}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = {"kernel": convert_conv(sd[f"{tname}.conv1.weight"])}
            p["bn1"], s["bn1"] = convert_bn(sd, f"{tname}.bn1")
            p["conv2"] = {"kernel": convert_conv(sd[f"{tname}.conv2.weight"])}
            p["bn2"], s["bn2"] = convert_bn(sd, f"{tname}.bn2")
            if f"{tname}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": convert_conv(sd[f"{tname}.downsample.0.weight"])}
                p["downsample_bn"], s["downsample_bn"] = convert_bn(
                    sd, f"{tname}.downsample.1")
            params[fname] = p
            stats[fname] = s
            block += 1
    return params, stats


def convert_stem3d(sd: Dict[str, Any], prefix: str = "stem3d."
                   ) -> Tuple[Dict, Dict]:
    """Reference stem (Conv3d + BatchNorm3d, lightning.py:49-53) ->
    Conv3DResNetFrontend's {stem_conv_kernel, stem_bn}."""
    params = {"stem_conv_kernel": convert_conv(sd[f"{prefix}0.weight"])}
    bn_p, bn_s = convert_bn(sd, f"{prefix}1")
    params["stem_bn"] = bn_p
    return params, {"stem_bn": bn_s}


def convert_frontend(sd: Dict[str, Any], stem_prefix: str = "stem3d.",
                     resnet_prefix: str = "resnet.") -> Tuple[Dict, Dict]:
    """Full Conv3DResNetFrontend tree (params, batch_stats)."""
    params, stats = convert_stem3d(sd, stem_prefix)
    r_params, r_stats = convert_resnet_trunk(sd, resnet_prefix)
    params["resnet"] = r_params
    stats["resnet"] = r_stats
    return params, stats


def convert_sync_head(sd: Dict[str, Any], prefix: str = "audio_projection."
                      ) -> Dict:
    """audio_projection -> audio_classifier (the reference's own surgery
    rename, LRS/video/lightning.py:60-66)."""
    return {"kernel": convert_linear(sd[f"{prefix}weight"]),
            "bias": _np(sd[f"{prefix}bias"])}


def convert_word_classifier(sd: Dict[str, Any],
                            prefix: str = "category_classifier.") -> Dict:
    return {"kernel": convert_linear(sd[f"{prefix}weight"]),
            "bias": _np(sd[f"{prefix}bias"])}
