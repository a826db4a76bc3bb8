"""W8A8 int8-compute inference: the quantized serving path.

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 peak) and
``scripts/bench_int8.py`` measured XLA actually reaching it: 1.88x on
encoder matmul shapes, 1.58x on layer3 convs where bf16 is already at
97% MFU. This module converts a trained model into that form:

* **BN folding**: every frozen conv+BN pair collapses to one conv with a
  per-output-channel scale/bias (``W' = W * gamma/sigma``,
  ``b = beta - mu * gamma/sigma``) — BN disappears from the graph.
* **Weights**: per-output-channel symmetric int8 of the FOLDED kernel.
* **Activations**: per-tensor symmetric int8 with STATIC scales from a
  calibration pass (run f32 over sample batches, record max|t| at every
  quantization point). Static scales let the requantization fuse into
  the producing epilogue: ``int32 conv out -> *(sx*sw/s_out) + b/s_out
  -> relu -> rint -> int8`` is one elementwise chain, so the activation
  is written once, at 1 byte/elem.
* Residual adds, global pool, the projection head, deconvs and the 1x1
  prediction convs stay f32: they are a rounding error of the FLOPs and
  quantizing them costs accuracy for nothing.

The model structure is walked ONCE (``_walk_resnet``) over an ops
object; ``_CalibOps`` interprets it in f32 (and doubles as the folding
correctness oracle — its output must match ``model.apply`` exactly),
``_QuantOps`` interprets it in int8. Reference serving path this
replaces: the reference loads ``.pth`` weights into a full-precision
torch module for every consumer (hubconf.py:6-23, minimal-hand/demo.py);
it ships no quantized deployment at all.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

STAGE_SIZES = {
    "18": (2, 2, 2, 2),
    "34": (3, 4, 6, 3),
    "50": (3, 4, 6, 3),
    "101": (3, 4, 23, 3),
    "152": (3, 8, 36, 3),
}
_BOTTLENECK = ("50", "101", "152")


# ---------------------------------------------------------------------------
# BN folding
# ---------------------------------------------------------------------------

def fold_conv_bn(kernel, bn_params, bn_stats, eps: float = 1e-5):
    """(kh, kw, ci, co) conv kernel + frozen BN -> (folded kernel, bias)."""
    k = np.asarray(kernel, np.float32)
    s = np.asarray(bn_params["scale"], np.float32) / np.sqrt(
        np.asarray(bn_stats["var"], np.float32) + eps)
    b = (np.asarray(bn_params["bias"], np.float32)
         - np.asarray(bn_stats["mean"], np.float32) * s)
    return k * s, b


def _fold_resnet(params: dict, stats: dict, backbone: str) -> dict:
    """site name -> (folded f32 kernel, f32 bias) for every conv+BN pair."""
    if "conv1" not in params:
        raise NotImplementedError(
            "int8 inference supports the conv7 stem only (no s2d)")
    fw = {"conv1": fold_conv_bn(params["conv1"]["kernel"],
                                params["bn1"], stats["bn1"])}
    bott = backbone in _BOTTLENECK
    for stage, n in enumerate(STAGE_SIZES[backbone]):
        for b in range(n):
            name = f"layer{stage + 1}_{b}"
            p, st = params[name], stats[name]
            convs = ("conv1", "conv2", "conv3") if bott else ("conv1", "conv2")
            for i, c in enumerate(convs, start=1):
                fw[f"{name}/{c}"] = fold_conv_bn(
                    p[c]["kernel"], p[f"bn{i}"], st[f"bn{i}"])
            if "downsample_conv" in p:
                fw[f"{name}/downsample"] = fold_conv_bn(
                    p["downsample_conv"]["kernel"],
                    p["downsample_bn"], st["downsample_bn"])
    return fw


def quantize_folded(fw: dict) -> dict:
    """site -> (int8 kernel, per-out-channel scale, f32 bias)."""
    qw = {}
    for key, (w, b) in fw.items():
        sw = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))
        sw = np.maximum(sw / 127.0, 1e-12).astype(np.float32)
        q = np.clip(np.rint(w / sw), -127, 127).astype(np.int8)
        qw[key] = (q, sw, b.astype(np.float32))
    return qw


# ---------------------------------------------------------------------------
# the two interpretations of the walk
# ---------------------------------------------------------------------------

def _conv(x, w, stride, padding):
    int8 = np.dtype(w.dtype) == np.int8
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if int8 else None,
    )


class _CalibOps:
    """f32 folded forward; records max|t| at every quantization point.

    Doubles as the folding oracle: with quantization points as identity,
    the output must equal the flax model's frozen forward.
    """

    def __init__(self, fw: dict):
        self.fw = fw
        self.maxes: dict = {}

    def _track(self, key, t):
        self.maxes[key] = jnp.max(jnp.abs(t)).astype(jnp.float32)
        return t

    def input(self, key, x):
        return self._track(key, x.astype(jnp.float32))

    def conv_bias(self, key, x, stride, padding):
        w, b = self.fw[key]
        return _conv(x, jnp.asarray(w), stride, padding) + b

    def conv_bn_relu(self, key, x, stride, padding, out_f32=False):
        y = jax.nn.relu(self.conv_bias(key, x, stride, padding))
        return y if out_f32 else self._track(key, y)

    def conv_bn(self, key, x, stride, padding):
        return self.conv_bias(key, x, stride, padding)

    def add_relu(self, key, y, shortcut):
        return self._track(key, jax.nn.relu(y + shortcut))

    def maxpool(self, x):
        import flax.linen as nn

        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])

    def to_f32(self, x):
        return x

    def quantize(self, key, x):
        return self._track(key, x)


class _QuantOps:
    """int8 forward: tensors travel as (int8 array, static python scale)."""

    def __init__(self, qw: dict, scales: dict):
        self.qw = {k: (jnp.asarray(q), sw, b) for k, (q, sw, b) in qw.items()}
        self.scales = scales

    def _requant(self, key, y):
        s = self.scales[key]
        return jnp.clip(jnp.rint(y / s), -127, 127).astype(jnp.int8), s

    def input(self, key, x):
        return self._requant(key, x.astype(jnp.float32))

    def conv_bn_relu(self, key, xq_s, stride, padding, out_f32=False):
        xq, sx = xq_s
        q, sw, b = self.qw[key]
        y32 = _conv(xq, q, stride, padding)
        if out_f32:
            return jax.nn.relu(y32.astype(jnp.float32) * (sx * sw) + b)
        # fused epilogue: dequant+bias+relu+requant in one elementwise
        # chain; the activation is written once, int8
        so = self.scales[key]
        y = y32.astype(jnp.float32) * (sx * sw / so) + b / so
        return (jnp.clip(jnp.rint(jax.nn.relu(y)), 0, 127).astype(jnp.int8),
                so)

    def conv_bn(self, key, xq_s, stride, padding):
        xq, sx = xq_s
        q, sw, b = self.qw[key]
        return _conv(xq, q, stride, padding).astype(jnp.float32) * (sx * sw) + b

    def add_relu(self, key, y, shortcut):
        if isinstance(shortcut, tuple):  # identity shortcut: dequant
            shortcut = shortcut[0].astype(jnp.float32) * shortcut[1]
        return self._requant(key, jax.nn.relu(y + shortcut))

    def maxpool(self, xq_s):
        import flax.linen as nn

        xq, s = xq_s  # max commutes with the positive scale: pool int8
        return nn.max_pool(xq, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)]), s

    def to_f32(self, xq_s):
        xq, s = xq_s
        return xq.astype(jnp.float32) * s

    def quantize(self, key, x):
        return self._requant(key, x)


def _walk_resnet(ops, backbone: str, x, pool: bool):
    """The single structural walk all interpretations share. Mirrors
    simhand_tpu/models/resnet.py (torchvision layout, NHWC).

    If ``ops`` exposes ``block_override(name, x, stride, cin, cout)``
    and it returns non-None, that value replaces the whole residual
    block — the hook the whole-block Mosaic kernel plugs into
    (ops/bottleneck_block.py)."""
    bott = backbone in _BOTTLENECK
    override = getattr(ops, "block_override", None)
    x = ops.input("in", x)
    x = ops.conv_bn_relu("conv1", x, 2, [(3, 3), (3, 3)])
    x = ops.maxpool(x)
    cin = 64
    for stage, n in enumerate(STAGE_SIZES[backbone]):
        f = 64 * 2 ** stage
        cout = f * (4 if bott else 1)
        for b in range(n):
            stride = 2 if stage > 0 and b == 0 else 1
            name = f"layer{stage + 1}_{b}"
            if override is not None:
                y = override(name, x, stride, cin, cout)
                if y is not None:
                    x = y
                    cin = cout
                    continue
            shortcut = x
            if bott:
                y = ops.conv_bn_relu(f"{name}/conv1", x, 1, "SAME")
                y = ops.conv_bn_relu(f"{name}/conv2", y, stride, "SAME")
                y = ops.conv_bn(f"{name}/conv3", y, 1, "SAME")
            else:
                y = ops.conv_bn_relu(f"{name}/conv1", x, stride, "SAME")
                y = ops.conv_bn(f"{name}/conv2", y, 1, "SAME")
            if stride != 1 or cin != cout:
                shortcut = ops.conv_bn(f"{name}/downsample", x, stride,
                                       "SAME")
            x = ops.add_relu(f"{name}/out", y, shortcut)
            cin = cout
    feats = ops.to_f32(x)
    return jnp.mean(feats, axis=(1, 2)) if pool else feats


# ---------------------------------------------------------------------------
# encoder surface
# ---------------------------------------------------------------------------

def _projection_forward(emb, proj_params: dict, proj_stats: dict):
    p = proj_params
    w1 = np.asarray(p["fc1"]["kernel"], np.float32)
    b1 = np.asarray(p["fc1"]["bias"], np.float32)
    bn, st = p["bn1"], proj_stats["bn1"]
    s = np.asarray(bn["scale"], np.float32) / np.sqrt(
        np.asarray(st["var"], np.float32) + 1e-5)
    w1f = w1 * s
    b1f = (b1 - np.asarray(st["mean"], np.float32)) * s + np.asarray(
        bn["bias"], np.float32)
    z = jax.nn.relu(emb @ w1f + b1f)
    return z @ np.asarray(p["fc2"]["kernel"], np.float32)


def build_encoder_int8(variables: dict, backbone: str = "50",
                       calib_batches=None, calib_device=None):
    """-> (forward images->{embedding, projection}, report dict).

    calib_batches: iterable of (N, S, S, 3) f32 arrays for activation
    scale calibration (required). calib_device: optional jax device for
    the calibration pass (e.g. jax.devices("cpu")[0] to avoid a remote
    TPU compile). The f32 calibration walker is also the fold oracle.
    """
    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    fw = _fold_resnet(params, stats, backbone)
    scales, report = _calibrate(
        fw, backbone, calib_batches, pool=True, extra=None,
        device=calib_device)
    qw = quantize_folded(fw)
    ops = _QuantOps(qw, scales)
    pp = variables["params"]["projection_head"]
    ps = variables["batch_stats"]["projection_head"]

    def forward(images):
        emb = _walk_resnet(ops, backbone, images, pool=True)
        return {"embedding": emb,
                "projection": _projection_forward(emb, pp, ps)}

    return forward, report


def fold_encoder_f32(variables: dict, backbone: str = "50"):
    """The f32 folded forward (oracle for tests; no quantization)."""
    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    fw = _fold_resnet(params, stats, backbone)
    pp = variables["params"]["projection_head"]
    ps = variables["batch_stats"]["projection_head"]

    def forward(images):
        emb = _walk_resnet(_CalibOps(fw), backbone, images, pool=True)
        return {"embedding": emb,
                "projection": _projection_forward(emb, pp, ps)}

    return forward


# ---------------------------------------------------------------------------
# detnet surface
# ---------------------------------------------------------------------------

def _fold_detnet_heads(params: dict, stats: dict) -> dict:
    """Folded map-head 3x3 project convs (the heavy head FLOPs)."""
    fw = {}
    for head in ("hmap_0", "dmap_0", "lmap_0"):
        fw[f"{head}/project"] = fold_conv_bn(
            params[head]["project_conv"]["kernel"],
            params[head]["project_bn"], stats[head]["project_bn"])
    return fw


def _detnet_tail(ops, params: dict, stats: dict, feats,
                 hm_res: int, njoints: int):
    """deconvs (f32, folded BN) + quantized map-head projections +
    f32 1x1 predictions; mirrors finetune/detnet.py."""
    from simhand_tpu.finetune.detnet import (gather_at_argmax, map_to_uv,
                                             pose_tile)

    x = feats
    for i in range(3):
        k = np.asarray(params[f"deconv{i}"]["kernel"], np.float32)
        bnp, bns = params[f"deconv_bn{i}"], stats[f"deconv_bn{i}"]
        s = np.asarray(bnp["scale"], np.float32) / np.sqrt(
            np.asarray(bns["var"], np.float32) + 1e-5)
        kf = k * s
        bf = (np.asarray(bnp["bias"], np.float32)
              - np.asarray(bns["mean"], np.float32) * s)
        x = jax.lax.conv_transpose(
            x, kf, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(x + bf)

    n = x.shape[0]
    x = jnp.concatenate([x, pose_tile(n, hm_res, jnp.float32)], axis=-1)
    maps = {}
    for head, out_ch, sig in (("hmap_0", njoints, True),
                              ("dmap_0", njoints * 3, False),
                              ("lmap_0", njoints * 3, False)):
        hq = ops.quantize(f"{head}/in", x)
        h = ops.conv_bn_relu(f"{head}/project", hq, 1, "SAME", out_f32=True)
        pred = params[head]["prediction"]
        y = _conv(h, np.asarray(pred["kernel"], np.float32), 1, "SAME")
        y = y + np.asarray(pred["bias"], np.float32)
        maps[head] = jax.nn.sigmoid(y) if sig else y
        x = jnp.concatenate([x, maps[head]], axis=-1)

    hmap = maps["hmap_0"]
    j, r = njoints, hm_res
    dmap = maps["dmap_0"].reshape(n, r, r, j, 3)
    lmap = maps["lmap_0"].reshape(n, r, r, j, 3)
    uv, onehot = map_to_uv(hmap)
    return {
        "h_map": hmap, "d_map": dmap, "l_map": lmap,
        "delta": gather_at_argmax(dmap, onehot),
        "xyz": gather_at_argmax(lmap, onehot),
        "uv": uv,
    }


def build_detnet_int8(variables: dict, backbone: str = "50",
                      calib_batches=None, hm_res: int = 32,
                      njoints: int = 21, calib_device=None):
    """-> (forward images->maps dict, report). Quantizes the backbone and
    the three map-head 3x3 projections; deconvs and 1x1 predictions f32."""
    params = variables["params"]
    stats = variables["batch_stats"]
    fw = _fold_resnet(params["encoder"], stats["encoder"], backbone)
    head_fw = _fold_detnet_heads(params, stats)

    def extra(ops, feats):
        return _detnet_tail(ops, params, stats, feats, hm_res,
                            njoints)

    scales, report = _calibrate({**fw, **head_fw}, backbone, calib_batches,
                                pool=False, extra=extra,
                                device=calib_device)
    qw = quantize_folded({**fw, **head_fw})
    ops = _QuantOps(qw, scales)

    def forward(images):
        feats = _walk_resnet(ops, backbone, images, pool=False)
        return _detnet_tail(ops, params, stats, feats, hm_res,
                            njoints)

    return forward, report


def fold_detnet_f32(variables: dict, backbone: str = "50",
                    hm_res: int = 32, njoints: int = 21):
    """f32 folded detnet forward (fold/walk oracle for tests)."""
    params, stats = variables["params"], variables["batch_stats"]
    fw = _fold_resnet(params["encoder"], stats["encoder"], backbone)
    head_fw = _fold_detnet_heads(params, stats)

    def forward(images):
        ops = _CalibOps({**fw, **head_fw})
        feats = _walk_resnet(ops, backbone, images, pool=False)
        return _detnet_tail(ops, params, stats, feats, hm_res,
                            njoints)

    return forward


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------

def _calibrate(fw: dict, backbone: str, calib_batches, pool: bool,
               extra, device=None) -> tuple:
    if calib_batches is None:
        raise ValueError(
            "int8 compute needs calibration batches (representative "
            "images); pass calib_batches=[...] or use "
            "random_calibration_batches() for smoke use")

    def _run(x):
        ops = _CalibOps(fw)
        feats = _walk_resnet(ops, backbone, x, pool=pool)
        if extra is not None:
            extra(ops, feats)
        return ops.maxes

    # device: where the f32 calibration pass runs — scale collection is
    # tiny, so jax.devices("cpu")[0] avoids a multi-minute remote TPU
    # compile when the serve target is a tunnel-attached chip (jit
    # follows the committed placement of its inputs)
    run = jax.jit(_run)

    maxes: dict = {}
    nb = 0
    for batch in calib_batches:
        x = jnp.asarray(batch, jnp.float32)
        if device is not None:
            x = jax.device_put(x, device)
        out = jax.tree.map(np.asarray, run(x))
        for k, v in out.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))
        nb += 1
    scales = {k: max(v / 127.0, 1e-12) for k, v in maxes.items()}
    return scales, {"calib_batches": nb, "sites": len(scales),
                    "scales": scales}


def random_calibration_batches(side: int = 128, batch: int = 32,
                               n: int = 2, seed: int = 0):
    """ImageNet-normalized-range random images — smoke-grade calibration
    (real deployments should pass real crops)."""
    rng = np.random.default_rng(seed)
    return [rng.normal(size=(batch, side, side, 3)).astype(np.float32)
            for _ in range(n)]


def cache_calibration_batches(cache_dir: str, side: int = 128,
                              batch: int = 32, n: int = 4, seed: int = 0):
    """Representative calibration batches from a packed crop cache
    (data/cache.py), preprocessed EXACTLY like the serving input path
    (serving/embed.py: resize + ImageNet normalize) — activation scales
    then match what the deployed artifact actually sees."""
    from simhand_tpu.data.cache import CachedHand100MSource
    from simhand_tpu.serving.embed import _preprocess_fn

    src = CachedHand100MSource(cache_dir)
    rng = np.random.default_rng(seed)
    total = min(batch * n, len(src))
    idx = rng.choice(len(src), size=total, replace=False)
    preprocess = _preprocess_fn(side)
    return [np.asarray(preprocess(jnp.asarray(
        src.gather_crops(np.sort(idx[lo:lo + batch])))), np.float32)
        for lo in range(0, total, batch)]
