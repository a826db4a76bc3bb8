"""detnet checkpoint interop with the reference's fine-tuned .pth files.

The reference detnet (minimal-hand/model/detnet/detnet.py) state dict:
  encoder.resnet.<torchvision keys>      (ResNetModel wrapper)
  deconv.{0,3,6}.weight                  ConvTranspose2d 4x4/2
  deconv.{1,4,7}.{weight,bias,running_*} BatchNorm2d
  {hmap,dmap,lmap}_0.project.0.weight    conv3x3
  {hmap,dmap,lmap}_0.project.1.*         BatchNorm2d
  {hmap,dmap,lmap}_0.prediction.{weight,bias}  1x1 conv

Ours (finetune/detnet.py): encoder/*, deconv{i}/kernel, deconv_bn{i}/*,
{hmap,dmap,lmap}_0/{project_conv,project_bn,prediction}/*.

Conv kernels transpose (O, I, kH, kW) <-> (kH, kW, I, O); ConvTranspose2d
weights are (I, O, kH, kW) in torch vs flax ConvTranspose (kH, kW, I, O)
with flipped spatial taps.
"""
from __future__ import annotations

import numpy as np

from simhand_tpu.train.torch_port import (
    encoder_to_torch_state_dict,
    torch_state_dict_to_encoder,
)

_HEADS = ("hmap_0", "dmap_0", "lmap_0")


def detnet_to_torch_state_dict(params: dict, batch_stats: dict) -> dict:
    sd: dict[str, np.ndarray] = {}

    enc = encoder_to_torch_state_dict(params["encoder"], batch_stats["encoder"])
    for k, v in enc.items():
        sd[f"encoder.resnet.{k}"] = v

    for i in range(3):
        w = np.asarray(params[f"deconv{i}"]["kernel"])   # (kH, kW, I, O)
        # flax ConvTranspose applies the kernel unflipped; torch
        # ConvTranspose2d stores (I, O, kH, kW) and flips
        sd[f"deconv.{3 * i}.weight"] = w[::-1, ::-1].transpose(2, 3, 0, 1)
        bn_p = params[f"deconv_bn{i}"]
        bn_s = batch_stats[f"deconv_bn{i}"]
        sd[f"deconv.{3 * i + 1}.weight"] = np.asarray(bn_p["scale"])
        sd[f"deconv.{3 * i + 1}.bias"] = np.asarray(bn_p["bias"])
        sd[f"deconv.{3 * i + 1}.running_mean"] = np.asarray(bn_s["mean"])
        sd[f"deconv.{3 * i + 1}.running_var"] = np.asarray(bn_s["var"])

    for head in _HEADS:
        hp, hs = params[head], batch_stats[head]
        sd[f"{head}.project.0.weight"] = np.asarray(
            hp["project_conv"]["kernel"]
        ).transpose(3, 2, 0, 1)
        sd[f"{head}.project.1.weight"] = np.asarray(hp["project_bn"]["scale"])
        sd[f"{head}.project.1.bias"] = np.asarray(hp["project_bn"]["bias"])
        sd[f"{head}.project.1.running_mean"] = np.asarray(hs["project_bn"]["mean"])
        sd[f"{head}.project.1.running_var"] = np.asarray(hs["project_bn"]["var"])
        sd[f"{head}.prediction.weight"] = np.asarray(
            hp["prediction"]["kernel"]
        ).transpose(3, 2, 0, 1)
        sd[f"{head}.prediction.bias"] = np.asarray(hp["prediction"]["bias"])
    return sd


def torch_state_dict_to_detnet(sd: dict) -> tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}

    enc_sd = {
        k[len("encoder.resnet."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.resnet.")
    }
    if not enc_sd:  # alternate wrapper prefix
        enc_sd = {
            k.split(".", 1)[1]: v for k, v in sd.items()
            if k.startswith("encoder.")
        }
    params["encoder"], stats["encoder"] = torch_state_dict_to_encoder(enc_sd)

    for i in range(3):
        w = np.asarray(sd[f"deconv.{3 * i}.weight"])      # (I, O, kH, kW)
        params[f"deconv{i}"] = {
            "kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        }
        params[f"deconv_bn{i}"] = {
            "scale": np.asarray(sd[f"deconv.{3 * i + 1}.weight"]),
            "bias": np.asarray(sd[f"deconv.{3 * i + 1}.bias"]),
        }
        stats[f"deconv_bn{i}"] = {
            "mean": np.asarray(sd[f"deconv.{3 * i + 1}.running_mean"]),
            "var": np.asarray(sd[f"deconv.{3 * i + 1}.running_var"]),
        }

    for head in _HEADS:
        params[head] = {
            "project_conv": {
                "kernel": np.asarray(
                    sd[f"{head}.project.0.weight"]
                ).transpose(2, 3, 1, 0)
            },
            "project_bn": {
                "scale": np.asarray(sd[f"{head}.project.1.weight"]),
                "bias": np.asarray(sd[f"{head}.project.1.bias"]),
            },
            "prediction": {
                "kernel": np.asarray(
                    sd[f"{head}.prediction.weight"]
                ).transpose(2, 3, 1, 0),
                "bias": np.asarray(sd[f"{head}.prediction.bias"]),
            },
        }
        stats[head] = {
            "project_bn": {
                "mean": np.asarray(sd[f"{head}.project.1.running_mean"]),
                "var": np.asarray(sd[f"{head}.project.1.running_var"]),
            }
        }
    return params, stats
