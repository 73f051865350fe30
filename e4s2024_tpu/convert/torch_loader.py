"""PyTorch checkpoint -> JAX/Flax pytree converters.

The reference ships torch checkpoints (E4S `iteration_300000.pt`,
`stylegan2-ffhq-config-f.pt`, ir_se50, BiSeNet `79999_iter.pth`, ...; see
reference README.md:55-68 and training/coach.py:88-173 for their layouts). These
converters map torch `state_dict` names/layouts onto the Flax module trees in
e4s2024_tpu.models so that outputs match the reference at near-pixel fidelity.

Layout rules:
  torch Linear  (out, in)          -> flax kernel (in, out)         [transpose]
  torch Conv2d  OIHW               -> flax kernel HWIO              [perm 2,3,1,0]
  ModulatedConv (1, O, I, kh, kw)  -> (kh, kw, I, O)
  ToRGB bias    (1, 3, 1, 1)       -> (1, 1, 1, 3)
  ConstantInput (1, C, 4, 4)       -> (1, 4, 4, C)

All functions take a flat {torch_name: np.ndarray} dict and return nested flax
param dicts; they are torch-free (use `load_torch_checkpoint` to produce the
numpy dict from a .pt file).
"""

from __future__ import annotations

import math
from typing import Any, Mapping

import numpy as np


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Load a .pt/.pth file into a flat numpy dict (requires torch, CPU-only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        extras = {k: v for k, v in obj.items() if k != "state_dict"}
        sd = obj["state_dict"]
    else:
        extras, sd = {}, obj
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    for k, v in extras.items():
        if hasattr(v, "detach"):
            out[f"__extra__.{k}"] = v.detach().cpu().numpy()
    return out


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Strip DDP's 'module.' prefix (reference utils/torch_utils.py:216)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _linear(sd, name):
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv(sd, name, flax_key="kernel"):
    out = {flax_key: np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _modconv(sd, name):
    w = sd[f"{name}.weight"]
    if w.ndim == 5:  # (1, O, I, kh, kw)
        w = w[0]
    return {
        "weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "modulation": _linear(sd, f"{name}.modulation"),
    }


def _styled_conv(sd, name):
    return {
        "conv": _modconv(sd, f"{name}.conv"),
        "noise_weight": sd[f"{name}.noise.weight"],
        "act_bias": sd[f"{name}.activate.bias"],
    }


def _to_rgb(sd, name):
    return {
        "conv": _modconv(sd, f"{name}.conv"),
        "bias": np.ascontiguousarray(sd[f"{name}.bias"].transpose(0, 2, 3, 1)),
    }


def convert_generator(sd: Mapping[str, np.ndarray], prefix: str = "") -> dict:
    """Map a rosinality-format StyleGAN2 generator state_dict (the layout of
    `stylegan2-ffhq-config-f.pt` / the reference's G, model.py:482) onto
    e4s2024_tpu.models.Generator params."""
    p = prefix
    params: dict[str, Any] = {}
    params["input"] = np.ascontiguousarray(
        sd[f"{p}input.input"].transpose(0, 2, 3, 1)
    )
    n_mlp = 0
    while f"{p}style.{n_mlp + 1}.weight" in sd:
        n_mlp += 1
    for i in range(1, n_mlp + 1):
        params[f"style_{i}"] = _linear(sd, f"{p}style.{i}")
    params["conv1"] = _styled_conv(sd, f"{p}conv1")
    params["to_rgb1"] = _to_rgb(sd, f"{p}to_rgb1")
    n_convs = 0
    while f"{p}convs.{n_convs}.conv.weight" in sd:
        n_convs += 1
    for i in range(n_convs):
        params[f"convs_{i}"] = _styled_conv(sd, f"{p}convs.{i}")
    for i in range(n_convs // 2):
        params[f"to_rgbs_{i}"] = _to_rgb(sd, f"{p}to_rgbs.{i}")
    return params


def convert_discriminator(sd: Mapping[str, np.ndarray], prefix: str = "") -> dict:
    """Map the reference Discriminator (model.py:771) state_dict onto
    e4s2024_tpu.models.Discriminator params."""
    p = prefix
    params: dict[str, Any] = {}
    # convs.0 = ConvLayer(3, ch, 1): [0]=EqualConv2d(no bias), [1]=FusedLeakyReLU
    params["conv_in"] = {
        "conv": _conv(sd, f"{p}convs.0.0", "weight"),
        "act_bias": sd[f"{p}convs.0.1.bias"],
    }
    n_res = 0
    while f"{p}convs.{n_res + 1}.conv1.0.weight" in sd:
        n_res += 1
    for i in range(n_res):
        t = f"{p}convs.{i + 1}"
        params[f"res_{i}"] = {
            "conv1": {
                "conv": _conv(sd, f"{t}.conv1.0", "weight"),
                "act_bias": sd[f"{t}.conv1.1.bias"],
            },
            # downsample ConvLayer: [0]=Blur, [1]=EqualConv2d, [2]=FusedLeakyReLU
            "conv2": {
                "conv": _conv(sd, f"{t}.conv2.1", "weight"),
                "act_bias": sd[f"{t}.conv2.2.bias"],
            },
            "skip": {"conv": _conv(sd, f"{t}.skip.1", "weight")},
        }
    params["final_conv"] = {
        "conv": _conv(sd, f"{p}final_conv.0", "weight"),
        "act_bias": sd[f"{p}final_conv.1.bias"],
    }
    params["final_linear_0"] = _linear(sd, f"{p}final_linear.0")
    params["final_linear_1"] = _linear(sd, f"{p}final_linear.1")
    return params


def _ir_se_block(sd, name):
    out = {
        "conv1": _conv(sd, f"{name}.res_layer.1"),
        "prelu": {"alpha": sd[f"{name}.res_layer.2.weight"]},
        "conv2": _conv(sd, f"{name}.res_layer.3"),
        "se": {
            "fc1": _conv(sd, f"{name}.res_layer.5.fc1"),
            "fc2": _conv(sd, f"{name}.res_layer.5.fc2"),
        },
    }
    if f"{name}.shortcut_layer.0.weight" in sd:
        out["shortcut_conv"] = _conv(sd, f"{name}.shortcut_layer.0")
    return out


def convert_encoder(sd: Mapping[str, np.ndarray], prefix: str = "") -> dict:
    """Map FSEncoder_PSP (reference psp_encoders.py:319) onto FSEncoderPSP params."""
    p = prefix
    params: dict[str, Any] = {
        "input_conv": _conv(sd, f"{p}input_layer.0"),
        "input_prelu": {"alpha": sd[f"{p}input_layer.2.weight"]},
    }
    i = 0
    while f"{p}body.{i}.res_layer.1.weight" in sd:
        params[f"body_{i}"] = _ir_se_block(sd, f"{p}body.{i}")
        i += 1
    return params


def convert_rgi(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a full E4S Net3 checkpoint (reference networks.py:51; saved as
    {state_dict, latent_avg, ...}, coach.py:544-568) onto RGINet variables."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {
        "encoder": convert_encoder(sd, "encoder."),
        "generator": convert_generator(sd, "G."),
    }
    i = 0
    while f"MLPs.{i}.mlp.0.weight" in sd:
        params[f"mlp_{i}"] = {
            "fc1": _linear(sd, f"MLPs.{i}.mlp.0"),
            "fc2": _linear(sd, f"MLPs.{i}.mlp.2"),
        }
        i += 1
    out = {"params": params}
    if "__extra__.latent_avg" in sd:
        out["buffers"] = {"latent_avg": sd["__extra__.latent_avg"]}
    elif "latent_avg" in sd:
        out["buffers"] = {"latent_avg": sd["latent_avg"]}
    return out
