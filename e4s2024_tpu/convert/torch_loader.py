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

    def flatten(prefix, node):
        # basicsr/FOMM-style checkpoints nest state dicts ({'params_ema':
        # {...}}, {'generator': {...}, 'kp_detector': {...}}); flatten with
        # dotted prefixes so converters can unwrap by name instead of the
        # nested dicts being silently dropped
        for k, v in node.items():
            if hasattr(v, "detach"):
                out[f"{prefix}{k}"] = v.detach().cpu().numpy()
            elif isinstance(v, dict):
                flatten(f"{prefix}{k}.", v)

    flatten("", sd)
    for k, v in extras.items():
        if hasattr(v, "detach"):
            out[f"__extra__.{k}"] = v.detach().cpu().numpy()
        elif isinstance(v, dict):
            flatten(f"__extra__.{k}.", v)
    return out


def unwrap_envelope(sd: Mapping[str, np.ndarray],
                    *names: str) -> dict[str, np.ndarray]:
    """Strip a checkpoint envelope prefix ('params_ema.', 'params.',
    'generator.', ...) if present — the flattened form of basicsr/FOMM-style
    nested checkpoints (see load_torch_checkpoint). First matching name wins;
    no-op when none match."""
    for name in names:
        p = name + "."
        if any(k.startswith(p) for k in sd):
            return {k[len(p):]: v for k, v in sd.items() if k.startswith(p)}
    return dict(sd)


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


def convert_encoder_sean(sd: Mapping[str, np.ndarray],
                         prefix: str = "") -> dict:
    """Map FSEncoder_SEAN (reference psp_encoders.py:238, the alternative
    `fsencoder_type`; in_size=256 flavor per networks.py:62) onto
    FSEncoderSEAN params. InstanceNorms are affine=False (no params)."""
    p = prefix
    return {
        # model = [ReflPad, Conv(1), IN, LReLU, Conv(4), IN, LReLU, Conv(7),
        #          IN, LReLU, ConvT(10), IN, LReLU]
        "head": _conv(sd, f"{p}model.1"),
        "down_0": _conv(sd, f"{p}model.4"),
        "down_1": _conv(sd, f"{p}model.7"),
        "up": _convt(sd, f"{p}model.10"),
        "style_conv": _conv(sd, f"{p}style_module.1"),
        "structure_0": _conv(sd, f"{p}structure_module.0"),
        "structure_1": _conv(sd, f"{p}structure_module.3"),
        "structure_2": _conv(sd, f"{p}structure_module.6"),
    }


def convert_rgi(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a full E4S Net3 checkpoint (reference networks.py:51; saved as
    {state_dict, latent_avg, ...}, coach.py:544-568) onto RGINet variables."""
    sd = strip_module_prefix(sd)
    sean = "encoder.model.1.weight" in sd  # SEAN layout (networks.py:62)
    params: dict[str, Any] = {
        "encoder": (convert_encoder_sean(sd, "encoder.") if sean
                    else convert_encoder(sd, "encoder.")),
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


# ---------------------------------------------------------------------------
# Frozen loss-net converters (ArcFace ir_se50, LPIPS alex, face-parsing unet)
# ---------------------------------------------------------------------------

def _bn(sd, name):
    out = {
        "mean": sd[f"{name}.running_mean"],
        "var": sd[f"{name}.running_var"],
    }
    if f"{name}.weight" in sd:
        out["scale"] = sd[f"{name}.weight"]
        out["bias"] = sd[f"{name}.bias"]
    return out


def _ir_se_bn_block(sd, name):
    out = {
        "bn0": _bn(sd, f"{name}.res_layer.0"),
        "conv1": _conv(sd, f"{name}.res_layer.1"),
        "prelu": {"alpha": sd[f"{name}.res_layer.2.weight"]},
        "conv2": _conv(sd, f"{name}.res_layer.3"),
        "bn2": _bn(sd, f"{name}.res_layer.4"),
        "se": {
            "fc1": _conv(sd, f"{name}.res_layer.5.fc1"),
            "fc2": _conv(sd, f"{name}.res_layer.5.fc2"),
        },
    }
    if f"{name}.shortcut_layer.0.weight" in sd:
        out["shortcut_conv"] = _conv(sd, f"{name}.shortcut_layer.0")
        out["shortcut_bn"] = _bn(sd, f"{name}.shortcut_layer.1")
    return out


def convert_arcface(sd: Mapping[str, np.ndarray]) -> dict:
    """Map the ir_se50 checkpoint (reference models/encoders/model_irse.py:9,
    `model_ir_se50.pth`) onto ArcFaceBackbone params."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {
        "input_conv": _conv(sd, "input_layer.0"),
        "input_bn": _bn(sd, "input_layer.1"),
        "input_prelu": {"alpha": sd["input_layer.2.weight"]},
        "output_bn": _bn(sd, "output_layer.0"),
        "output_fc_kernel": np.ascontiguousarray(sd["output_layer.3.weight"].T),
        "output_fc_bias": sd["output_layer.3.bias"],
        "output_bn1d": _bn(sd, "output_layer.4"),
    }
    i = 0
    while f"body.{i}.res_layer.1.weight" in sd:
        params[f"body_{i}"] = _ir_se_bn_block(sd, f"body.{i}")
        i += 1
    return params


def convert_lpips(alex_sd: Mapping[str, np.ndarray],
                  lin_sd: Mapping[str, np.ndarray]) -> dict:
    """Map torchvision alexnet.features + LPIPS v0.1 lin weights onto the
    LPIPS flax module (reference criteria/lpips/networks.py:77, lpips.py:16).

    `alex_sd` keys: features.{0,3,6,8,10}.{weight,bias} (or without the
    'features.' prefix). `lin_sd` keys: '{i}.1.weight' (LPIPS repo layout after
    the rename in lpips/utils.py:23-30) or 'lin{i}.model.1.weight'.
    """
    def a(idx):
        for k in (f"features.{idx}", f"{idx}"):
            if f"{k}.weight" in alex_sd:
                return _conv(alex_sd, k)
        raise KeyError(f"alexnet conv {idx} not found")

    params: dict[str, Any] = {
        "net": {
            "conv0": a(0), "conv3": a(3), "conv6": a(6),
            "conv8": a(8), "conv10": a(10),
        }
    }
    for i in range(5):
        for k in (f"{i}.1.weight", f"lin{i}.model.1.weight"):
            if k in lin_sd:
                params[f"lin_{i}"] = lin_sd[k].reshape(-1)
                break
        else:
            raise KeyError(f"lin weight {i} not found")
    return params


def _unet_conv2(sd, name):
    return {
        "conv1": _conv(sd, f"{name}.conv1.0"),
        "bn1": _bn(sd, f"{name}.conv1.1"),
        "conv2": _conv(sd, f"{name}.conv2.0"),
        "bn2": _bn(sd, f"{name}.conv2.1"),
    }


def convert_parsing_unet(sd: Mapping[str, np.ndarray]) -> dict:
    """Map the face-parsing unet checkpoint (reference criteria/face_parsing/
    unet.py:6, `model.pth`) onto ParsingUNet params."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {}
    for blk in ("conv1", "conv2", "conv3", "conv4", "center"):
        params[blk] = _unet_conv2(sd, blk)
    for blk in ("up_concat4", "up_concat3", "up_concat2", "up_concat1"):
        params[blk] = {
            # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out);
            # flax ConvTranspose cross-correlates where torch convolves, so the
            # kernel must also be flipped spatially.
            "up": {
                "kernel": np.ascontiguousarray(
                    sd[f"{blk}.up.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]
                ),
                "bias": sd[f"{blk}.up.bias"],
            },
            "conv": _unet_conv2(sd, f"{blk}.conv"),
        }
    params["final"] = _conv(sd, "final")
    return params


def _convbnrelu(sd, name):
    return {"conv": _conv(sd, f"{name}.conv"), "bn": _bn(sd, f"{name}.bn")}


def _basic_block(sd, name):
    out = {
        "conv1": _conv(sd, f"{name}.conv1"),
        "bn1": _bn(sd, f"{name}.bn1"),
        "conv2": _conv(sd, f"{name}.conv2"),
        "bn2": _bn(sd, f"{name}.bn2"),
    }
    if f"{name}.downsample.0.weight" in sd:
        out["down_conv"] = _conv(sd, f"{name}.downsample.0")
        out["down_bn"] = _bn(sd, f"{name}.downsample.1")
    return out


def _arm(sd, name):
    return {
        "conv": _convbnrelu(sd, f"{name}.conv"),
        "conv_atten": _conv(sd, f"{name}.conv_atten"),
        "bn_atten": _bn(sd, f"{name}.bn_atten"),
    }


def _bisenet_out(sd, name):
    return {
        "conv": _convbnrelu(sd, f"{name}.conv"),
        "conv_out": _conv(sd, f"{name}.conv_out"),
    }


def convert_bisenet(sd: Mapping[str, np.ndarray]) -> dict:
    """Map the BiSeNet face-parser checkpoint (`79999_iter.pth`; reference
    swap_face_fine/face_parsing/model.py:234) onto e4s2024_tpu BiSeNet params."""
    sd = strip_module_prefix(sd)
    resnet = {
        "conv1": _conv(sd, "cp.resnet.conv1"),
        "bn1": _bn(sd, "cp.resnet.bn1"),
    }
    for layer in range(1, 5):
        for blk in range(2):
            resnet[f"layer{layer}_{blk}"] = _basic_block(
                sd, f"cp.resnet.layer{layer}.{blk}")
    return {
        "resnet": resnet,
        "arm16": _arm(sd, "cp.arm16"),
        "arm32": _arm(sd, "cp.arm32"),
        "conv_head32": _convbnrelu(sd, "cp.conv_head32"),
        "conv_head16": _convbnrelu(sd, "cp.conv_head16"),
        "conv_avg": _convbnrelu(sd, "cp.conv_avg"),
        "ffm": {
            "convblk": _convbnrelu(sd, "ffm.convblk"),
            "conv1": _conv(sd, "ffm.conv1"),
            "conv2": _conv(sd, "ffm.conv2"),
        },
        "conv_out": _bisenet_out(sd, "conv_out"),
        "conv_out16": _bisenet_out(sd, "conv_out16"),
        "conv_out32": _bisenet_out(sd, "conv_out32"),
    }


def convert_gpen(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a GPEN FullGenerator checkpoint (reference swap_face_fine/gpen/
    face_model/gpen_model.py:637, e.g. GPEN-BFR-512.pth) onto
    GPENFullGenerator params. The decoder shares the rosinality layout, so
    convert_generator handles it."""
    sd = strip_module_prefix(sd)
    params: dict[str, Any] = {
        "generator": convert_generator(sd, "generator."),
        "final_linear": _linear(sd, "final_linear.0"),
        # ecd0 = ConvLayer(1x1): [0]=EqualConv2d(no bias), [1]=FusedLeakyReLU
        "ecd_0": {
            "conv": _conv(sd, "ecd0.0.0", "weight"),
            "act_bias": sd["ecd0.0.1.bias"],
        },
    }
    i = 1
    while f"ecd{i}.0.1.weight" in sd:
        # downsample ConvLayer: [0]=Blur, [1]=EqualConv2d, [2]=FusedLeakyReLU
        params[f"ecd_{i}"] = {
            "conv": _conv(sd, f"ecd{i}.0.1", "weight"),
            "act_bias": sd[f"ecd{i}.0.2.bias"],
        }
        i += 1
    return params


def convert_rrdbnet(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a RealESRGAN RRDBNet checkpoint (reference realesr/image_infer.py:39)
    onto e4s2024_tpu RRDBNet params. Unwraps the 'params_ema'/'params'
    envelope of basicsr checkpoints."""
    sd = strip_module_prefix(unwrap_envelope(sd, "params_ema", "params"))
    params: dict[str, Any] = {}
    for k in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr",
              "conv_last"):
        params[k] = _conv(sd, k)
    i = 0
    while f"body.{i}.rdb1.conv1.weight" in sd:
        blk = {}
        for r in (1, 2, 3):
            blk[f"rdb{r}"] = {
                f"conv{c}": _conv(sd, f"body.{i}.rdb{r}.conv{c}")
                for c in range(1, 6)
            }
        params[f"body_{i}"] = blk
        i += 1
    return params


def _spectral_conv(sd, name):
    """Effective conv weight of a torch spectral_norm'd conv at eval time:
    W / sigma with sigma = u^T W_mat v (stored power-iteration vectors)."""
    if f"{name}.weight_orig" in sd:
        w = sd[f"{name}.weight_orig"]
        u = sd[f"{name}.weight_u"]
        v = sd[f"{name}.weight_v"]
        sigma = float(u @ (w.reshape(w.shape[0], -1) @ v))
        w = w / sigma
    else:
        w = sd[f"{name}.weight"]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _spade(sd, name):
    return {
        "mlp_shared": _conv(sd, f"{name}.mlp_shared.1"),
        "mlp_gamma": _conv(sd, f"{name}.mlp_gamma"),
        "mlp_beta": _conv(sd, f"{name}.mlp_beta"),
    }


def _spade_resblock(sd, name, learned_shortcut):
    out = {
        "norm_0": _spade(sd, f"{name}.norm_0"),
        "norm_1": _spade(sd, f"{name}.norm_1"),
        "conv_0": _spectral_conv(sd, f"{name}.conv_0"),
        "conv_1": _spectral_conv(sd, f"{name}.conv_1"),
    }
    if learned_shortcut:
        out["norm_s"] = _spade(sd, f"{name}.norm_s")
        out["conv_s"] = _spectral_conv(sd, f"{name}.conv_s")
    return out


def _unet_res(sd, name, has_sqz):
    out = {
        "bn1": _bn(sd, f"{name}.bn1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "bn2": _bn(sd, f"{name}.bn2"),
        "conv2": _conv(sd, f"{name}.conv2"),
    }
    if has_sqz:
        out["sqz"] = _conv(sd, f"{name}.sqz_layer")
    return out


def convert_blender(sd: Mapping[str, np.ndarray]) -> dict:
    """Map the Blender recolor checkpoint (reference swap_face_fine/Blender/
    model_center/blener.py:7, latest_netG.pth) onto e4s2024_tpu Blender params,
    pre-normalizing spectral-norm weights."""
    sd = strip_module_prefix(sd)
    fpn = {}
    for i in range(1, 6):
        fpn[f"layer{i}"] = _spectral_conv(sd, f"referencer.FPN.layer{i}.0")
    fpn["head_0"] = _spade_resblock(sd, "referencer.FPN.head_0", False)
    fpn["G_middle_0"] = _spade_resblock(sd, "referencer.FPN.G_middle_0", False)
    fpn["G_middle_1"] = _spade_resblock(sd, "referencer.FPN.G_middle_1", True)

    unet = {
        "input_encoder_layer": {
            "conv1": _conv(sd, "unet.input_encoder_layer.conv1"),
            "bn1": _bn(sd, "unet.input_encoder_layer.bn1"),
            "conv2": _conv(sd, "unet.input_encoder_layer.conv2"),
            "sqz": _conv(sd, "unet.input_encoder_layer.sqz_layer"),
        },
        "res_en_layer2": _unet_res(sd, "unet.res_en_layer2", True),
        "res_en_layer3": _unet_res(sd, "unet.res_en_layer3", True),
        "res_bridge_layer": _unet_res(sd, "unet.res_bridge_layer", True),
        "res_de_layer3": _unet_res(sd, "unet.res_de_layer3", True),
        "res_de_layer2": _unet_res(sd, "unet.res_de_layer2", True),
        "res_de_layer1": _unet_res(sd, "unet.res_de_layer1", True),
        "output_decoder_layer": _conv(sd, "unet.output_decoder_layer.0"),
    }
    return {
        "FPN": fpn,
        "unet": unet,
        "trainable_tao": sd["referencer.trainable_tao"].reshape(()),
    }


def _groupnorm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _vq_block(sd, tname, kind, fname):
    if kind in ("conv", "conv_out"):
        return {fname: _conv(sd, tname)}
    if kind == "res":
        out = {
            "norm1": _groupnorm(sd, f"{tname}.norm1"),
            "conv1": _conv(sd, f"{tname}.conv1"),
            "norm2": _groupnorm(sd, f"{tname}.norm2"),
            "conv2": _conv(sd, f"{tname}.conv2"),
        }
        if f"{tname}.conv_out.weight" in sd:
            out["conv_out"] = _conv(sd, f"{tname}.conv_out")
        return {fname: out}
    if kind == "attn":
        return {fname: {
            "norm": _groupnorm(sd, f"{tname}.norm"),
            "q": _conv(sd, f"{tname}.q"), "k": _conv(sd, f"{tname}.k"),
            "v": _conv(sd, f"{tname}.v"),
            "proj_out": _conv(sd, f"{tname}.proj_out"),
        }}
    if kind in ("down", "up"):
        return {fname: {"conv": _conv(sd, f"{tname}.conv")}}
    if kind == "norm":
        return {fname: _groupnorm(sd, tname)}
    raise ValueError(kind)


def convert_codeformer(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a CodeFormer checkpoint (reference archs/codeformer_arch.py:161)
    onto e4s2024_tpu CodeFormer params. Unwraps the 'params_ema' envelope
    of the released codeformer.pth."""
    from e4s2024_tpu.models.codeformer import (
        encoder_plan, generator_plan, FUSE_ENCODER_BLOCK,
    )

    sd = strip_module_prefix(unwrap_envelope(sd, "params_ema", "params"))
    params: dict[str, Any] = {"encoder": {}, "generator": {}}
    for i, (kind, _) in enumerate(encoder_plan()):
        params["encoder"].update(
            _vq_block(sd, f"encoder.blocks.{i}", kind, f"blocks_{i}"))
    for i, (kind, _) in enumerate(generator_plan()):
        params["generator"].update(
            _vq_block(sd, f"generator.blocks.{i}", kind, f"blocks_{i}"))

    params["codebook"] = sd["quantize.embedding.weight"]
    params["position_emb"] = sd["position_emb"]
    params["feat_emb"] = _linear(sd, "feat_emb")
    n = 0
    while f"ft_layers.{n}.self_attn.in_proj_weight" in sd:
        t = f"ft_layers.{n}"
        params[f"ft_layers_{n}"] = {
            "norm1": {"scale": sd[f"{t}.norm1.weight"],
                      "bias": sd[f"{t}.norm1.bias"]},
            "norm2": {"scale": sd[f"{t}.norm2.weight"],
                      "bias": sd[f"{t}.norm2.bias"]},
            "qkv_kernel": np.ascontiguousarray(
                sd[f"{t}.self_attn.in_proj_weight"].T),
            "qkv_bias": sd[f"{t}.self_attn.in_proj_bias"],
            "out_proj": _linear(sd, f"{t}.self_attn.out_proj"),
            "linear1": _linear(sd, f"{t}.linear1"),
            "linear2": _linear(sd, f"{t}.linear2"),
        }
        n += 1
    params["idx_norm"] = {"scale": sd["idx_pred_layer.0.weight"],
                          "bias": sd["idx_pred_layer.0.bias"]}
    params["idx_pred"] = _linear(sd, "idx_pred_layer.1")
    for size in (32, 64, 128, 256):
        if f"fuse_convs_dict.{size}.encode_enc.conv1.weight" in sd:
            t = f"fuse_convs_dict.{size}"
            enc = {
                "norm1": _groupnorm(sd, f"{t}.encode_enc.norm1"),
                "conv1": _conv(sd, f"{t}.encode_enc.conv1"),
                "norm2": _groupnorm(sd, f"{t}.encode_enc.norm2"),
                "conv2": _conv(sd, f"{t}.encode_enc.conv2"),
            }
            if f"{t}.encode_enc.conv_out.weight" in sd:
                enc["conv_out"] = _conv(sd, f"{t}.encode_enc.conv_out")
            params[f"fuse_{size}"] = {
                "encode_enc": enc,
                "scale_0": _conv(sd, f"{t}.scale.0"),
                "scale_2": _conv(sd, f"{t}.scale.2"),
                "shift_0": _conv(sd, f"{t}.shift.0"),
                "shift_2": _conv(sd, f"{t}.shift.2"),
            }
    return params


def _layernorm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def convert_swinir(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a SwinIR real_sr checkpoint (reference SwinIR/models/
    network_swinir.py:618, 003_realSR_..._GAN.pth) onto e4s2024_tpu SwinIR
    params. Unwraps the 'params_ema'/'params' envelope."""
    sd = strip_module_prefix(unwrap_envelope(sd, "params_ema", "params"))
    params: dict[str, Any] = {
        "conv_first": _conv(sd, "conv_first"),
        "patch_norm": _layernorm(sd, "patch_embed.norm"),
        "norm": _layernorm(sd, "norm"),
        "conv_after_body": _conv(sd, "conv_after_body"),
        "conv_before_upsample": _conv(sd, "conv_before_upsample.0"),
        "conv_up1": _conv(sd, "conv_up1"),
        "conv_up2": _conv(sd, "conv_up2"),
        "conv_hr": _conv(sd, "conv_hr"),
        "conv_last": _conv(sd, "conv_last"),
    }
    li = 0
    while f"layers.{li}.conv.weight" in sd:
        t = f"layers.{li}"
        layer = {"conv": _conv(sd, f"{t}.conv")}
        bi = 0
        while f"{t}.residual_group.blocks.{bi}.norm1.weight" in sd:
            bt = f"{t}.residual_group.blocks.{bi}"
            layer[f"blocks_{bi}"] = {
                "norm1": _layernorm(sd, f"{bt}.norm1"),
                "norm2": _layernorm(sd, f"{bt}.norm2"),
                "attn": {
                    "rel_bias_table": sd[f"{bt}.attn.relative_position_bias_table"],
                    "qkv": _linear(sd, f"{bt}.attn.qkv"),
                    "proj": _linear(sd, f"{bt}.attn.proj"),
                },
                "fc1": _linear(sd, f"{bt}.mlp.fc1"),
                "fc2": _linear(sd, f"{bt}.mlp.fc2"),
            }
            bi += 1
        params[f"layers_{li}"] = layer
        li += 1
    return params


def _convt(sd, name):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped (flax cross-correlates, torch convolves)
    return {
        "kernel": np.ascontiguousarray(
            sd[f"{name}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]),
        "bias": sd[f"{name}.bias"],
    }


def _kpn_basic(sd, name):
    # KPN Basic.conv1 = Sequential(conv, relu, conv, relu, conv)
    return {f"conv{i}": _conv(sd, f"{name}.conv1.{2 * i}") for i in range(3)}


def convert_misf(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a MISF InpaintGenerator checkpoint (reference MISF/src/
    networks.py:35, data['generator']) onto MISFGenerator params.

    InstanceNorms are affine=False (no params); kernel_pred has none;
    kpn_model.conv_final exists in the torch module but is unused by its
    forward, so it is dropped. Unwraps the {'generator': ...} envelope of
    the released MISF checkpoint."""
    sd = strip_module_prefix(unwrap_envelope(sd, "generator"))
    params: dict[str, Any] = {
        "encoder0": _conv(sd, "encoder0.1"),
        "encoder1": _conv(sd, "encoder1.0"),
        "encoder2": _conv(sd, "encoder2.0"),
        "decoder0": _convt(sd, "decoder.0"),
        "decoder1": _convt(sd, "decoder.3"),
        "decoder2": _conv(sd, "decoder.7"),
        "kpn_model": {
            **{f"conv{i}": _kpn_basic(sd, f"kpn_model.conv{i}")
               for i in (1, 2, 3, 4, 7, 8, 9)},
            "kernels": _conv(sd, "kpn_model.kernels"),
            "core_img": _conv(sd, "kpn_model.core_img"),
        },
    }
    i = 0
    while f"middle.{i}.conv_block.1.weight" in sd:
        params[f"middle{i}"] = {
            "conv1": _conv(sd, f"middle.{i}.conv_block.1"),
            "conv2": _conv(sd, f"middle.{i}.conv_block.5"),
        }
        i += 1
    return params


def _tps_cn(sd, name):
    # conv + InstanceNorm(affine) block (TPSMM util.py Same/Down/Up blocks)
    return {"conv": _conv(sd, f"{name}.conv"),
            "norm": {"scale": sd[f"{name}.norm.weight"],
                     "bias": sd[f"{name}.norm.bias"]}}


def _tps_res(sd, name):
    return {
        "conv1": _conv(sd, f"{name}.conv1"),
        "conv2": _conv(sd, f"{name}.conv2"),
        "norm1": {"scale": sd[f"{name}.norm1.weight"],
                  "bias": sd[f"{name}.norm1.bias"]},
        "norm2": {"scale": sd[f"{name}.norm2.weight"],
                  "bias": sd[f"{name}.norm2.bias"]},
    }


def _tps_hourglass(sd, name, num_blocks):
    params: dict[str, Any] = {}
    for i in range(num_blocks):
        params[f"down{i}"] = _tps_cn(sd, f"{name}.encoder.down_blocks.{i}")
        params[f"up{i}"] = _tps_cn(sd, f"{name}.decoder.up_blocks.{i}")
    return params


def _nest_flat_ckpt(ckpt):
    """Accept either {'net': {param: arr}} nested checkpoints or the
    flattened {'net.param': arr} form produced by load_torch_checkpoint."""
    if any(isinstance(v, Mapping) for v in ckpt.values()):
        return ckpt
    nested: dict[str, dict] = {}
    for k, v in ckpt.items():
        head, _, rest = k.partition(".")
        nested.setdefault(head, {})[rest] = v
    return nested


def convert_tpsmm(ckpt: Mapping[str, Mapping[str, np.ndarray]],
                  num_blocks: int = 5, num_down_blocks: int = 3,
                  up_nums: int = 2, occlusion_num: int = 4) -> dict:
    """Map a TPSMM checkpoint (reference TPSMM/demo.py:35 load_checkpoints:
    dict of per-net state dicts) onto TPSMMDriver params.

    The torch module registers inpainting up_blocks/resblocks already
    reversed (inpainting_network.py:33-34), so indices map 1:1. The
    anti-alias kernel is a fixed buffer (rebuilt, not loaded); avd_network
    is only used in 'avd' animate mode and is skipped. Accepts the nested
    or load_torch_checkpoint-flattened form."""
    ckpt = _nest_flat_ckpt(ckpt)
    kp_sd = strip_module_prefix(ckpt["kp_detector"])
    dm_sd = strip_module_prefix(ckpt["dense_motion_network"])
    in_sd = strip_module_prefix(ckpt["inpainting_network"])

    kp: dict[str, Any] = {
        "conv1": _conv(kp_sd, "fg_encoder.conv1"),
        "bn1": _bn(kp_sd, "fg_encoder.bn1"),
        "fc": _linear(kp_sd, "fg_encoder.fc"),
    }
    for li in range(1, 5):
        for bi in range(2):
            t = f"fg_encoder.layer{li}.{bi}"
            blk = {
                "conv1": _conv(kp_sd, f"{t}.conv1"),
                "bn1": _bn(kp_sd, f"{t}.bn1"),
                "conv2": _conv(kp_sd, f"{t}.conv2"),
                "bn2": _bn(kp_sd, f"{t}.bn2"),
            }
            if f"{t}.downsample.0.weight" in kp_sd:
                blk["down_conv"] = _conv(kp_sd, f"{t}.downsample.0")
                blk["down_bn"] = _bn(kp_sd, f"{t}.downsample.1")
            kp[f"layer{li}_{bi}"] = blk

    dm: dict[str, Any] = {
        "hourglass": _tps_hourglass(dm_sd, "hourglass", num_blocks),
        "maps": _conv(dm_sd, "maps"),
    }
    for i in range(occlusion_num):
        dm[f"occlusion{i}"] = _conv(dm_sd, f"occlusion.{i}")
    for i in range(up_nums):
        dm[f"up{i}"] = _tps_cn(dm_sd, f"up.{i}")

    inp: dict[str, Any] = {
        "first": _tps_cn(in_sd, "first"),
        "final": _conv(in_sd, "final"),
    }
    for i in range(num_down_blocks):
        inp[f"down{i}"] = _tps_cn(in_sd, f"down_blocks.{i}")
        inp[f"up{i}"] = _tps_cn(in_sd, f"up_blocks.{i}")
    for i in range(2 * num_down_blocks):
        inp[f"res{i}"] = _tps_res(in_sd, f"resblock.{i}")

    return {"kp_detector": kp, "dense_motion": dm, "inpainting": inp}


def _fomm_cn(sd, name):
    # conv + (frozen, affine) BatchNorm block (DaGAN util.py Same/Down/Up)
    return {"conv": _conv(sd, f"{name}.conv"),
            "norm": _bn(sd, f"{name}.norm")}


def _fomm_res(sd, name):
    return {"conv1": _conv(sd, f"{name}.conv1"),
            "conv2": _conv(sd, f"{name}.conv2"),
            "norm1": _bn(sd, f"{name}.norm1"),
            "norm2": _bn(sd, f"{name}.norm2")}


def _fomm_hourglass(sd, name, num_blocks):
    params: dict[str, Any] = {}
    for i in range(num_blocks):
        params[f"down{i}"] = _fomm_cn(sd, f"{name}.encoder.down_blocks.{i}")
        params[f"up{i}"] = _fomm_cn(sd, f"{name}.decoder.up_blocks.{i}")
    return params


def _resnet_bottleneck(sd, name):
    blk = {}
    for j in (1, 2, 3):
        blk[f"conv{j}"] = _conv(sd, f"{name}.conv{j}")
        blk[f"bn{j}"] = _bn(sd, f"{name}.bn{j}")
    if f"{name}.downsample.0.weight" in sd:
        blk["down_conv"] = _conv(sd, f"{name}.downsample.0")
        blk["down_bn"] = _bn(sd, f"{name}.downsample.1")
    return blk


def convert_dagan(generator_sd: Mapping[str, np.ndarray],
                  kp_sd: Mapping[str, np.ndarray],
                  depth_enc_sd: Mapping[str, np.ndarray],
                  depth_dec_sd: Mapping[str, np.ndarray],
                  num_kp: int = 15, num_blocks: int = 5,
                  num_down_blocks: int = 2, num_bottleneck: int = 6,
                  resnet_layers: tuple = (3, 4, 6, 3)) -> dict:
    """Map DaGAN checkpoints (reference drive_demo.py:25/140: the main
    ckpt's 'generator'/'kp_detector' plus monodepth2 encoder.pth/depth.pth)
    onto DaGANDriver params. Anti-alias kernels are fixed buffers (rebuilt)."""
    # the released vox ckpt holds both nets; passing its flattened form for
    # either arg auto-unwraps (no-op for already-split state dicts)
    generator_sd = strip_module_prefix(
        unwrap_envelope(generator_sd, "generator"))
    kp_sd = strip_module_prefix(unwrap_envelope(kp_sd, "kp_detector"))
    depth_enc_sd = strip_module_prefix(depth_enc_sd)
    depth_dec_sd = strip_module_prefix(depth_dec_sd)

    gen: dict[str, Any] = {
        "first": _fomm_cn(generator_sd, "first"),
        "src_first": _fomm_cn(generator_sd, "src_first"),
        "final": _conv(generator_sd, "final"),
        "AttnModule": {
            "query_conv": _conv(generator_sd, "AttnModule.query_conv"),
            "key_conv": _conv(generator_sd, "AttnModule.key_conv"),
            "value_conv": _conv(generator_sd, "AttnModule.value_conv"),
            "gamma": generator_sd["AttnModule.gamma"],
        },
    }
    for i in range(num_down_blocks):
        gen[f"down{i}"] = _fomm_cn(generator_sd, f"down_blocks.{i}")
        gen[f"src_down{i}"] = _fomm_cn(generator_sd, f"src_down_blocks.{i}")
        gen[f"up{i}"] = _fomm_cn(generator_sd, f"up_blocks.{i}")
    for i in range(num_bottleneck):
        gen[f"bottleneck_r{i}"] = _fomm_res(generator_sd,
                                            f"bottleneck.r{i}")
    gen["dense_motion_network"] = {
        "hourglass": _fomm_hourglass(generator_sd,
                                     "dense_motion_network.hourglass",
                                     num_blocks),
        "mask": _conv(generator_sd, "dense_motion_network.mask"),
        "occlusion": _conv(generator_sd, "dense_motion_network.occlusion"),
    }

    kp: dict[str, Any] = {
        "predictor": _fomm_hourglass(kp_sd, "predictor", num_blocks),
        "kp": _conv(kp_sd, "kp"),
    }
    if "jacobian.weight" in kp_sd:
        kp["jacobian"] = _conv(kp_sd, "jacobian")

    enc: dict[str, Any] = {
        "conv1": _conv(depth_enc_sd, "encoder.conv1"),
        "bn1": _bn(depth_enc_sd, "encoder.bn1"),
    }
    for li, n in enumerate(resnet_layers):
        for bi in range(n):
            enc[f"layer{li + 1}_{bi}"] = _resnet_bottleneck(
                depth_enc_sd, f"encoder.layer{li + 1}.{bi}")

    # decoder ModuleList order (depth_decoder.py:30-47): upconv (4..0, j=0,1)
    # then dispconv scales 0..3
    dec: dict[str, Any] = {}
    for i in range(4, -1, -1):
        for j in (0, 1):
            n = 2 * (4 - i) + j
            dec[f"upconv_{i}_{j}"] = _conv(depth_dec_sd,
                                           f"decoder.{n}.conv.conv")
    dec["dispconv_0"] = _conv(depth_dec_sd, "decoder.10.conv")

    return {"generator": gen, "kp_detector": kp,
            "depth_encoder": enc, "depth_decoder": dec}


def _convlayer(sd, name, downsample=False):
    # reference ConvLayer Sequential: [Blur,] EqualConv2d, FusedLeakyReLU
    i = 1 if downsample else 0
    return {"conv": _conv(sd, f"{name}.{i}", "weight"),
            "act_bias": sd[f"{name}.{i + 1}.bias"]}


def _sg2_resblock(sd, name):
    return {
        "conv1": _convlayer(sd, f"{name}.conv1"),
        "conv2": _convlayer(sd, f"{name}.conv2", downsample=True),
        "skip": {"conv": _conv(sd, f"{name}.skip.1", "weight")},
    }


def convert_lia(sd: Mapping[str, np.ndarray], size: int = 256) -> dict:
    """Map a LIA checkpoint's 'gen' state dict (reference LIA/run_demo.py:64)
    onto LIAGenerator params. dec.to_rgb1 exists in torch but is unused by
    Synthesis.forward and is dropped."""
    import math

    # released vox.pt wraps the generator under 'gen' (run_demo.py:64)
    sd = strip_module_prefix(unwrap_envelope(sd, "gen"))
    # LIA's own FusedLeakyReLU stores bias as (1, C, 1, 1)
    # (networks/encoder.py:14, styledecoder.py:15) where the rosinality op
    # uses (C,); flatten those so the shared helpers apply. The standalone
    # ToRGB/ToFlow biases keep their raw 4-d form (handled explicitly below).
    raw = sd
    sd = {k: (v.reshape(-1)
              if (k.endswith(".bias") and getattr(v, "ndim", 0) == 4
                  and v.shape[0] == 1 and v.shape[2:] == (1, 1)) else v)
          for k, v in sd.items()}
    log_size = int(math.log2(size))

    net_app: dict[str, Any] = {
        "conv0": _convlayer(sd, "enc.net_app.convs.0"),
        "final": {"weight": np.ascontiguousarray(
            sd[f"enc.net_app.convs.{log_size - 1}.weight"]
            .transpose(2, 3, 1, 0))},
    }
    for j in range(log_size - 2):
        net_app[f"res{j}"] = _sg2_resblock(sd, f"enc.net_app.convs.{j + 1}")
    enc = {"net_app": net_app}
    for i in range(5):
        enc[f"fc{i}"] = _linear(sd, f"enc.fc.{i}")

    dec: dict[str, Any] = {
        "direction": {"weight": sd["dec.direction.weight"]},
        "input": np.ascontiguousarray(
            sd["dec.input.input"].transpose(0, 2, 3, 1)),
        "conv1": _styled_conv(sd, "dec.conv1"),
    }
    for i in range(2 * (log_size - 2)):
        dec[f"convs_{i}"] = _styled_conv(sd, f"dec.convs.{i}")
    for j in range(log_size - 2):
        # LIA ToRGB (styledecoder.py:374) is UNmodulated: ConvLayer
        # [EqualConv2d, FusedLeakyReLU] + standalone bias
        dec[f"to_rgbs_{j}"] = {
            "conv": _conv(sd, f"dec.to_rgbs.{j}.conv.0", "weight"),
            "act_bias": sd[f"dec.to_rgbs.{j}.conv.1.bias"],
            "bias": np.ascontiguousarray(
                raw[f"dec.to_rgbs.{j}.bias"].transpose(0, 2, 3, 1)),
        }
        dec[f"to_flows_{j}"] = {
            "conv": _modconv(sd, f"dec.to_flows.{j}.conv"),
            "bias": np.ascontiguousarray(
                raw[f"dec.to_flows.{j}.bias"].transpose(0, 2, 3, 1)),
        }
    return {"enc": enc, "dec": dec}


# --------------------------------------------------------------- faceVid2Vid


def _conv3(sd, name):
    """torch Conv3d (O, I, D, H, W) -> flax kernel (D, H, W, I, O)."""
    out = {"kernel": np.ascontiguousarray(
        sd[f"{name}.weight"].transpose(2, 3, 4, 1, 0))}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _fv2v_convnorm(sd, name, conv3d=False):
    """{Same,Down,Up}Block2d/3d: conv + BatchNorm (reference
    face_vid2vid/modules/util.py:156-260)."""
    cv = _conv3(sd, f"{name}.conv") if conv3d else _conv(sd, f"{name}.conv")
    return {"conv": cv, "norm": _bn(sd, f"{name}.norm")}


def _fv2v_bottleneck(sd, name):
    """ResBottleneck (reference util.py:74-103)."""
    out = {
        "conv1": _conv(sd, f"{name}.conv1"),
        "norm1": _bn(sd, f"{name}.norm1"),
        "conv2": _conv(sd, f"{name}.conv2"),
        "norm2": _bn(sd, f"{name}.norm2"),
        "conv3": _conv(sd, f"{name}.conv3"),
        "norm3": _bn(sd, f"{name}.norm3"),
    }
    if f"{name}.skip.weight" in sd:
        out["skip"] = _conv(sd, f"{name}.skip")
        out["norm4"] = _bn(sd, f"{name}.norm4")
    return out


def _fv2v_spade(sd, name):
    """SPADE norm (reference util.py:421-441): mlp_shared is Sequential(Conv,
    ReLU) -> index 0."""
    return {
        "mlp_shared": _conv(sd, f"{name}.mlp_shared.0"),
        "mlp_gamma": _conv(sd, f"{name}.mlp_gamma"),
        "mlp_beta": _conv(sd, f"{name}.mlp_beta"),
    }


def _fv2v_spade_block(sd, name):
    """SPADEResnetBlock with spectral-normed convs (reference util.py:444-476)."""
    out = {
        "norm_0": _fv2v_spade(sd, f"{name}.norm_0"),
        "norm_1": _fv2v_spade(sd, f"{name}.norm_1"),
        "conv_0": _spectral_conv(sd, f"{name}.conv_0"),
        "conv_1": _spectral_conv(sd, f"{name}.conv_1"),
    }
    if (f"{name}.conv_s.weight" in sd or f"{name}.conv_s.weight_orig" in sd):
        out["norm_s"] = _fv2v_spade(sd, f"{name}.norm_s")
        out["conv_s"] = _spectral_conv(sd, f"{name}.conv_s")
    return out


def convert_facevid2vid_kp(sd: Mapping[str, np.ndarray]) -> dict:
    """KPDetector (reference face_vid2vid/modules/keypoint_detector.py:9):
    predictor = KPHourglass (2D downs -> 1x1 conv -> 3D ups), kp = Conv3d.
    The AntiAliasInterpolation2d 'down' kernel is a fixed buffer (recomputed
    here), so it is skipped."""
    sd = strip_module_prefix(sd)
    pred: dict[str, Any] = {"conv": _conv(sd, "predictor.conv")}
    i = 0
    while f"predictor.down_blocks.down{i}.conv.weight" in sd:
        pred[f"down_{i}"] = _fv2v_convnorm(sd, f"predictor.down_blocks.down{i}")
        i += 1
    i = 0
    while f"predictor.up_blocks.up{i}.conv.weight" in sd:
        pred[f"up_{i}"] = _fv2v_convnorm(sd, f"predictor.up_blocks.up{i}",
                                         conv3d=True)
        i += 1
    return {"predictor": pred, "kp": _conv3(sd, "kp")}


def convert_facevid2vid_he(sd: Mapping[str, np.ndarray]) -> dict:
    """HEEstimator (reference keypoint_detector.py:85-134)."""
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {}
    for i in range(1, 6):
        out[f"conv{i}"] = _conv(sd, f"conv{i}")
        out[f"norm{i}"] = _bn(sd, f"norm{i}")
    for blk, n in (("block1", 3), ("block3", 3), ("block5", 5), ("block7", 2)):
        for i in range(n):
            out[f"{blk}_{i}"] = _fv2v_bottleneck(
                sd, f"{blk}.b{blk[-1]}_{i}")
    for blk in ("block2", "block4", "block6"):
        out[blk] = _fv2v_bottleneck(sd, blk)
    for fc in ("fc_roll", "fc_pitch", "fc_yaw", "fc_t", "fc_exp"):
        out[fc] = _linear(sd, fc)
    return out


def convert_facevid2vid_generator(sd: Mapping[str, np.ndarray]) -> dict:
    """OcclusionAwareSPADEGenerator (reference generator.py:161-250) incl. its
    DenseMotionNetwork (dense_motion.py:9) and SPADEDecoder (generator.py:120)."""
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {
        "first": _fv2v_convnorm(sd, "first"),
        "second": _conv(sd, "second"),
        "third": _fv2v_convnorm(sd, "third"),
        "fourth": _conv(sd, "fourth"),
    }
    i = 0
    while f"down_blocks.{i}.conv.weight" in sd:
        out[f"down_blocks_{i}"] = _fv2v_convnorm(sd, f"down_blocks.{i}")
        i += 1
    i = 0
    while f"resblocks_3d.3dr{i}.conv1.weight" in sd:
        r = f"resblocks_3d.3dr{i}"
        out[f"resblocks_3d_{i}"] = {
            "conv1": _conv3(sd, f"{r}.conv1"),
            "conv2": _conv3(sd, f"{r}.conv2"),
            "norm1": _bn(sd, f"{r}.norm1"),
            "norm2": _bn(sd, f"{r}.norm2"),
        }
        i += 1

    dm: dict[str, Any] = {
        "compress": _conv3(sd, "dense_motion_network.compress"),
        "norm": _bn(sd, "dense_motion_network.norm"),
        "mask": _conv3(sd, "dense_motion_network.mask"),
    }
    if "dense_motion_network.occlusion.weight" in sd:
        dm["occlusion"] = _conv(sd, "dense_motion_network.occlusion")
    hg: dict[str, Any] = {
        "conv": _conv3(sd, "dense_motion_network.hourglass.decoder.conv"),
        "norm": _bn(sd, "dense_motion_network.hourglass.decoder.norm"),
    }
    i = 0
    while (f"dense_motion_network.hourglass.encoder.down_blocks.{i}.conv.weight"
           in sd):
        hg[f"down_{i}"] = _fv2v_convnorm(
            sd, f"dense_motion_network.hourglass.encoder.down_blocks.{i}",
            conv3d=True)
        hg[f"up_{i}"] = _fv2v_convnorm(
            sd, f"dense_motion_network.hourglass.decoder.up_blocks.{i}",
            conv3d=True)
        i += 1
    dm["hourglass"] = hg
    out["dense_motion_network"] = dm

    dec: dict[str, Any] = {
        "fc": _conv(sd, "decoder.fc"),
        "conv_img": _conv(sd, "decoder.conv_img"),
        "up_0": _fv2v_spade_block(sd, "decoder.up_0"),
        "up_1": _fv2v_spade_block(sd, "decoder.up_1"),
    }
    i = 0
    while (f"decoder.G_middle_{i}.conv_0.weight" in sd
           or f"decoder.G_middle_{i}.conv_0.weight_orig" in sd):
        dec[f"G_middle_{i}"] = _fv2v_spade_block(sd, f"decoder.G_middle_{i}")
        i += 1
    out["decoder"] = dec
    return out


def convert_facevid2vid(ckpt: Mapping[str, Mapping[str, np.ndarray]]) -> dict:
    """Full 00000189-checkpoint.pth.tar (reference drive_demo.py:21-58): keys
    'generator', 'kp_detector', 'he_estimator' -> FaceVid2VidDriver params.
    Accepts the nested or load_torch_checkpoint-flattened form."""
    ckpt = _nest_flat_ckpt(ckpt)
    return {
        "kp_detector": convert_facevid2vid_kp(dict(ckpt["kp_detector"])),
        "he_estimator": convert_facevid2vid_he(dict(ckpt["he_estimator"])),
        "generator": convert_facevid2vid_generator(dict(ckpt["generator"])),
    }


# --------------------------------------------------------------------- GCFSR


def _gcfsr_convlayer(sd, name, downsample=False, activate=True):
    """basicsr-style ConvLayer Sequential (reference gcfsr_arch.py:458-505):
    [UpFirDnSmooth,] EqualConv2d [, FusedLeakyReLU]."""
    i = 1 if downsample else 0
    out = {"conv": _conv(sd, f"{name}.{i}", "weight")}
    if activate:
        out["act_bias"] = sd[f"{name}.{i + 1}.bias"]
    return out


def _gcfsr_styled(sd, name):
    """StyleConv / StyleConv_norm_scale_shift (gcfsr_arch.py:289,708): the
    Norm2Scale stage is parameter-free, so both share one layout."""
    return {"conv": _modconv(sd, f"{name}.modulated_conv"),
            "noise_weight": sd[f"{name}.weight"],
            "act_bias": sd[f"{name}.activate.bias"]}


def _gcfsr_torgb(sd, name):
    return {"conv": _modconv(sd, f"{name}.modulated_conv"),
            "bias": np.ascontiguousarray(
                sd[f"{name}.bias"].transpose(0, 2, 3, 1))}


def convert_gcfsr(sd: Mapping[str, np.ndarray]) -> dict:
    """FaceInpaintingArch / net_g_50000.pth (reference gcfsr_arch.py:1347,
    face_inpainting.py:13-22) -> models.gcfsr.FaceInpainting params. The
    `noises.noise*` buffers and UpFirDnSmooth kernels are fixed/recomputed."""
    sd = strip_module_prefix(sd)
    if "params_ema" in sd or any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    out: dict[str, Any] = {
        "conv_body_first": _gcfsr_convlayer(sd, "conv_body_first"),
        "final_conv": _gcfsr_convlayer(sd, "final_conv"),
        "final_down1": _gcfsr_convlayer(sd, "final_down1", downsample=True),
        "final_down2": _gcfsr_convlayer(sd, "final_down2", downsample=True),
        "final_linear": _linear(sd, "final_linear"),
        "style_conv1": _gcfsr_styled(sd, "style_conv1"),
        "to_rgb1": _gcfsr_torgb(sd, "to_rgb1"),
    }
    i = 0
    while f"conv_body_down.{i}.1.weight" in sd:
        out[f"conv_body_down_{i}"] = _gcfsr_convlayer(
            sd, f"conv_body_down.{i}", downsample=True)
        i += 1
    j = 0
    while f"condition_scale1.{j}.weight" in sd:
        out[f"condition_scale1_{j}"] = _linear(sd, f"condition_scale1.{j}")
        out[f"condition_scale2_{j}"] = _linear(sd, f"condition_scale2.{j}")
        out[f"condition_shift_{j}"] = _gcfsr_convlayer(
            sd, f"condition_shift.{j}", activate=False)
        j += 1
    k = 0
    while f"style_convs.{k}.modulated_conv.weight" in sd:
        out[f"style_convs_{k}"] = _gcfsr_styled(sd, f"style_convs.{k}")
        k += 1
    p = 0
    while f"to_rgbs.{p}.modulated_conv.weight" in sd:
        out[f"to_rgbs_{p}"] = _gcfsr_torgb(sd, f"to_rgbs.{p}")
        p += 1
    return out


# ------------------------------------------------------------------- GFPGAN


def _clean_modconv(sd, name):
    """Clean-arch ModulatedConv2d (reference GFPGAN stylegan2_clean_arch.py:24):
    5-dim weight + plain nn.Linear modulation."""
    return {
        "weight": np.ascontiguousarray(
            sd[f"{name}.weight"][0].transpose(2, 3, 1, 0)),
        "modulation": _linear(sd, f"{name}.modulation"),
    }


def _clean_styled(sd, name):
    return {
        "conv": _clean_modconv(sd, f"{name}.modulated_conv"),
        "noise_weight": sd[f"{name}.weight"],
        "bias": np.ascontiguousarray(sd[f"{name}.bias"].transpose(0, 2, 3, 1)),
    }


def _clean_torgb(sd, name):
    return {
        "conv": _clean_modconv(sd, f"{name}.modulated_conv"),
        "bias": np.ascontiguousarray(sd[f"{name}.bias"].transpose(0, 2, 3, 1)),
    }


def _gfpgan_resblock(sd, name):
    return {"conv1": _conv(sd, f"{name}.conv1"),
            "conv2": _conv(sd, f"{name}.conv2"),
            "skip": _conv(sd, f"{name}.skip")}


def convert_gfpgan(sd: Mapping[str, np.ndarray]) -> dict:
    """GFPGANv1Clean (reference GFPGAN/gfpgan/archs/gfpganv1_clean_arch.py:180)
    -> models.gfpgan.GFPGANv1Clean params. The decoder's style_mlp (unused:
    inputs are W latents, input_is_latent=True) and the aux `toRGB` heads
    (return_rgb only) are dropped; noise buffers are runtime inputs."""
    sd = strip_module_prefix(sd)
    if any(k.startswith("params_ema.") for k in sd):
        sd = {k[len("params_ema."):]: v for k, v in sd.items()
              if k.startswith("params_ema.")}
    out: dict[str, Any] = {
        "conv_body_first": _conv(sd, "conv_body_first"),
        "final_conv": _conv(sd, "final_conv"),
        "final_linear": _linear(sd, "final_linear"),
    }
    i = 0
    while f"conv_body_down.{i}.conv1.weight" in sd:
        out[f"conv_body_down_{i}"] = _gfpgan_resblock(sd, f"conv_body_down.{i}")
        i += 1
    i = 0
    while f"conv_body_up.{i}.conv1.weight" in sd:
        out[f"conv_body_up_{i}"] = _gfpgan_resblock(sd, f"conv_body_up.{i}")
        out[f"condition_scale_{i}_0"] = _conv(sd, f"condition_scale.{i}.0")
        out[f"condition_scale_{i}_2"] = _conv(sd, f"condition_scale.{i}.2")
        out[f"condition_shift_{i}_0"] = _conv(sd, f"condition_shift.{i}.0")
        out[f"condition_shift_{i}_2"] = _conv(sd, f"condition_shift.{i}.2")
        i += 1
    dec: dict[str, Any] = {
        "constant_input": np.ascontiguousarray(
            sd["stylegan_decoder.constant_input.weight"].transpose(0, 2, 3, 1)),
        "style_conv1": _clean_styled(sd, "stylegan_decoder.style_conv1"),
        "to_rgb1": _clean_torgb(sd, "stylegan_decoder.to_rgb1"),
    }
    k = 0
    while f"stylegan_decoder.style_convs.{k}.modulated_conv.weight" in sd:
        dec[f"style_convs_{k}"] = _clean_styled(
            sd, f"stylegan_decoder.style_convs.{k}")
        k += 1
    p = 0
    while f"stylegan_decoder.to_rgbs.{p}.modulated_conv.weight" in sd:
        dec[f"to_rgbs_{p}"] = _clean_torgb(sd, f"stylegan_decoder.to_rgbs.{p}")
        p += 1
    out["stylegan_decoder"] = dec
    return out


# ------------------------------------------------------------------ Hopenet


def convert_hopenet(sd: Mapping[str, np.ndarray],
                    layers: tuple = (3, 4, 6, 3)) -> dict:
    """Hopenet ResNet-50 pose net (reference head_pose_esit/hopenet.py:7-26)
    -> models.hopenet.Hopenet params. fc_finetune is vestigial (never used in
    the reference forward) and dropped."""
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _bn(sd, "bn1"),
        "fc_yaw": _linear(sd, "fc_yaw"),
        "fc_pitch": _linear(sd, "fc_pitch"),
        "fc_roll": _linear(sd, "fc_roll"),
    }
    for li, n in enumerate(layers):
        for bi in range(n):
            t = f"layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv(sd, f"{t}.conv1"),
                "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": _conv(sd, f"{t}.conv2"),
                "bn2": _bn(sd, f"{t}.bn2"),
                "conv3": _conv(sd, f"{t}.conv3"),
                "bn3": _bn(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = _conv(sd, f"{t}.downsample.0")
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            out[f"layer{li + 1}_{bi}"] = blk
    return out


# -------------------------------------------------------------------- VGG16


def convert_vgg16(sd: Mapping[str, np.ndarray]) -> dict:
    """torchvision vgg16 `features` (reference criteria/style_loss.py:83-101)
    -> models.vgg.VGG16Features params (classifier head dropped)."""
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {}
    for k in sd:
        if k.startswith("features.") and k.endswith(".weight"):
            idx = int(k.split(".")[1])
            out[f"conv_{idx}"] = _conv(sd, f"features.{idx}")
    return out


# --------------------------------------------------------------- RetinaFace


def _conv_bn_seq(sd, name, conv_idx=0, bn_idx=1):
    """A reference `conv_bn`/`conv_bn1X1`/`conv_bn_no_relu` Sequential
    (gpen/face_detect/facemodels/net.py:9-27) -> ConvBNLeaky params."""
    return {"conv": _conv(sd, f"{name}.{conv_idx}"),
            "bn": _bn(sd, f"{name}.{bn_idx}")}


def _conv_dw(sd, name):
    """reference `conv_dw` Sequential (net.py:29-38): 0=dw conv, 1=bn,
    3=pw conv, 4=bn -> ConvDW params."""
    return {"dw": _conv_bn_seq(sd, name, 0, 1),
            "pw": _conv_bn_seq(sd, name, 3, 4)}


def _fold_bgr_mean_into_stem(conv_kernel: np.ndarray, bn: dict,
                             mean_bgr=(104.0, 117.0, 123.0)):
    """RetinaFace checkpoints are trained on BGR input minus (104, 117, 123)
    (reference retinaface_detection.py:72-73). Fold both into the stem so the
    Flax net takes raw RGB [0,255]: flip the kernel's input channels and add
    conv(W, mean) to the BN running mean."""
    k = conv_kernel[:, :, ::-1, :].copy()  # HWIO: flip I (BGR -> RGB)
    m = np.asarray(mean_bgr, np.float32)
    shift = np.einsum("hwio,i->o", conv_kernel, m)
    bn = dict(bn)
    bn["mean"] = bn["mean"] + shift
    return k, bn


def convert_retinaface(sd: Mapping[str, np.ndarray],
                       cfg: Mapping[str, Any] | None = None) -> dict:
    """Map a RetinaFace checkpoint (reference gpen/face_detect/facemodels/
    retinaface.py:48; `mobilenet0.25_Final.pth` / `RetinaFace-R50.pth`)
    onto models.retinaface.RetinaFace params. Folds the BGR+mean
    preprocessing into the stem (see _fold_bgr_mean_into_stem)."""
    from e4s2024_tpu.models.retinaface import CFG_MNET

    cfg = cfg or CFG_MNET
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {}

    if cfg["backbone"] == "mobilenet":
        body: dict[str, Any] = {"stem": _conv_bn_seq(sd, "body.stage1.0")}
        for i in range(5):
            body[f"s1_{i}"] = _conv_dw(sd, f"body.stage1.{i + 1}")
        for i in range(6):
            body[f"s2_{i}"] = _conv_dw(sd, f"body.stage2.{i}")
        for i in range(2):
            body[f"s3_{i}"] = _conv_dw(sd, f"body.stage3.{i}")
        k, bn = _fold_bgr_mean_into_stem(body["stem"]["conv"]["kernel"],
                                         body["stem"]["bn"])
        body["stem"]["conv"]["kernel"], body["stem"]["bn"] = k, bn
    else:  # resnet50 (torchvision trunk, layers 3/4/6/3)
        body = {"conv1": _conv(sd, "body.conv1"), "bn1": _bn(sd, "body.bn1")}
        for li, n in enumerate((3, 4, 6, 3)):
            for bi in range(n):
                t = f"body.layer{li + 1}.{bi}"
                blk = {
                    "conv1": _conv(sd, f"{t}.conv1"),
                    "bn1": _bn(sd, f"{t}.bn1"),
                    "conv2": _conv(sd, f"{t}.conv2"),
                    "bn2": _bn(sd, f"{t}.bn2"),
                    "conv3": _conv(sd, f"{t}.conv3"),
                    "bn3": _bn(sd, f"{t}.bn3"),
                }
                if f"{t}.downsample.0.weight" in sd:
                    blk["down_conv"] = _conv(sd, f"{t}.downsample.0")
                    blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
                body[f"layer{li + 1}_{bi}"] = blk
        k, bn = _fold_bgr_mean_into_stem(body["conv1"]["kernel"],
                                         body["bn1"])
        body["conv1"]["kernel"], body["bn1"] = k, bn
    out["body"] = body

    out["fpn"] = {
        "output1": _conv_bn_seq(sd, "fpn.output1"),
        "output2": _conv_bn_seq(sd, "fpn.output2"),
        "output3": _conv_bn_seq(sd, "fpn.output3"),
        "merge1": _conv_bn_seq(sd, "fpn.merge1"),
        "merge2": _conv_bn_seq(sd, "fpn.merge2"),
    }
    for i in range(1, 4):
        out[f"ssh{i}"] = {
            "conv3x3": _conv_bn_seq(sd, f"ssh{i}.conv3X3"),
            "conv5x5_1": _conv_bn_seq(sd, f"ssh{i}.conv5X5_1"),
            "conv5x5_2": _conv_bn_seq(sd, f"ssh{i}.conv5X5_2"),
            "conv7x7_2": _conv_bn_seq(sd, f"ssh{i}.conv7X7_2"),
            "conv7x7_3": _conv_bn_seq(sd, f"ssh{i}.conv7x7_3"),
        }
    for i in range(3):
        out[f"class_head{i}"] = _conv(sd, f"ClassHead.{i}.conv1x1")
        out[f"bbox_head{i}"] = _conv(sd, f"BboxHead.{i}.conv1x1")
        out[f"landmark_head{i}"] = _conv(sd, f"LandmarkHead.{i}.conv1x1")
    return out


# ---------------------------------------------------------------------- FAN


def _fan_convblock(sd, name):
    """face-alignment ConvBlock -> models.fan.ConvBlock params (downsample =
    Sequential(bn, relu, conv) -> indices 0 and 2)."""
    out = {
        "bn1": _bn(sd, f"{name}.bn1"),
        "conv1": _conv(sd, f"{name}.conv1"),
        "bn2": _bn(sd, f"{name}.bn2"),
        "conv2": _conv(sd, f"{name}.conv2"),
        "bn3": _bn(sd, f"{name}.bn3"),
        "conv3": _conv(sd, f"{name}.conv3"),
    }
    if f"{name}.downsample.0.running_mean" in sd:
        out["down_bn"] = _bn(sd, f"{name}.downsample.0")
        out["down_conv"] = _conv(sd, f"{name}.downsample.2")
    return out


def convert_fan(sd: Mapping[str, np.ndarray], num_modules: int = 4,
                depth: int = 4) -> dict:
    """Map a face-alignment FAN checkpoint (`2DFAN4*.pth` — the landmark net
    the reference accepts at utils/alignment.py:41-64) onto models.fan.FAN
    params."""
    sd = strip_module_prefix(sd)
    out: dict[str, Any] = {
        "conv1": _conv(sd, "conv1"),
        "bn1": _bn(sd, "bn1"),
        "conv2": _fan_convblock(sd, "conv2"),
        "conv3": _fan_convblock(sd, "conv3"),
        "conv4": _fan_convblock(sd, "conv4"),
    }
    for i in range(num_modules):
        hg: dict[str, Any] = {}
        for level in range(1, depth + 1):
            hg[f"b1_{level}"] = _fan_convblock(sd, f"m{i}.b1_{level}")
            hg[f"b2_{level}"] = _fan_convblock(sd, f"m{i}.b2_{level}")
            hg[f"b3_{level}"] = _fan_convblock(sd, f"m{i}.b3_{level}")
        hg["b2_plus_1"] = _fan_convblock(sd, f"m{i}.b2_plus_1")
        out[f"m{i}"] = hg
        out[f"top_m_{i}"] = _fan_convblock(sd, f"top_m_{i}")
        out[f"conv_last{i}"] = _conv(sd, f"conv_last{i}")
        out[f"bn_end{i}"] = _bn(sd, f"bn_end{i}")
        out[f"l{i}"] = _conv(sd, f"l{i}")
        if i < num_modules - 1:
            out[f"bl{i}"] = _conv(sd, f"bl{i}")
            out[f"al{i}"] = _conv(sd, f"al{i}")
    return out
