"""StableHLO serving artifacts: export / save / load / run.

The reference's deployment path re-instantiates the torch module and
loads a ``.pth`` in every consumer (hubconf.py:6-23,
minimal-hand/demo.py). Here the deployable unit is instead a single
self-contained file produced by ``jax.export``:

* the frozen forward pass (``train=False``, running BN stats) is traced
  once with the weights **baked in as constants** — the artifact needs
  no checkpoint, no model code, and no flax at serve time;
* ``batch="poly"`` exports with a symbolic batch dimension, so one
  artifact serves any batch size (the TPU compiles per concrete shape on
  first use, cached after);
* ``platforms=("cpu", "tpu")`` lowers both targets into the same file —
  the artifact a CI box validates is byte-identical to the one the TPU
  pod serves.

File format: ``SHTPU1\\n`` magic, an 8-byte little-endian header length,
a JSON header (surface, backbone, input spec, jax version), then the
``jax.export`` serialization.

CLI (also a console script, see pyproject):

  python -m simhand_tpu.serving.export --surface detnet \\
      --pth runs/ft/detnet.pth --out detnet.shlo
  python -m simhand_tpu.serving.export --surface encoder \\
      --pth resnet50_simhand.pth --out encoder.shlo --batch 256
"""
from __future__ import annotations

import argparse
import io
import json
import struct
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_MAGIC = b"SHTPU1\n"


# ---------------------------------------------------------------------------
# forward builders (weights closed over -> baked into the export)
# ---------------------------------------------------------------------------

def detnet_apply(backbone: str = "50", dtype=jnp.bfloat16,
                 side: int = 128) -> Callable:
    """(variables, images (N, S, S, 3) f32) -> {h_map, uv, xyz, delta}
    (the maps the demo/eval consume; reference serving loop:
    minimal-hand/demo.py per-frame forward). ``hm_res`` follows the
    input side (side/32 features, 3 deconv 2x ups)."""
    from simhand_tpu.finetune.detnet import DetNet

    model = DetNet(resnet_size=backbone, dtype=dtype, hm_res=side // 4)

    def apply(variables, images):
        preds = model.apply(variables, images, train=False)
        return {
            "h_map": preds["h_map"],
            "uv": preds["uv"],
            "xyz": preds["xyz"],
            "delta": preds["delta"],
        }

    return apply


def encoder_apply(backbone: str = "50", dtype=jnp.bfloat16) -> Callable:
    """(variables, images) -> {embedding (N, 2048-D), projection
    (N, 128-D)} — the pretrain product used for retrieval / re-mining
    (reference: base_model.forward -> embeddings)."""
    from simhand_tpu.models import ContrastiveModel

    model = ContrastiveModel(resnet_size=backbone, dtype=dtype)

    def apply(variables, images):
        emb, proj = model.apply(variables, images, train=False)
        return {"embedding": emb, "projection": proj}

    return apply


def build_detnet_forward(variables: dict, backbone: str = "50",
                         dtype=jnp.bfloat16, side: int = 128) -> Callable:
    """Frozen detnet forward with the weights closed over (baked into an
    export as constants)."""
    apply = detnet_apply(backbone, dtype, side)
    return lambda images: apply(variables, images)


def build_encoder_forward(variables: dict, backbone: str = "50",
                          dtype=jnp.bfloat16) -> Callable:
    """Frozen encoder forward with the weights closed over."""
    apply = encoder_apply(backbone, dtype)
    return lambda images: apply(variables, images)


# ---------------------------------------------------------------------------
# export / artifact io
# ---------------------------------------------------------------------------

def _image_spec(side: int, batch: int | str):
    if batch == "poly":
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch)
    return jax.ShapeDtypeStruct((b, side, side, 3), jnp.float32)


def export_forward(forward: Callable, side: int = 128,
                   batch: int | str = "poly",
                   platforms: Sequence[str] = ("cpu",)):
    """Traces ``forward(images)`` into a ``jax.export.Exported`` with the
    closed-over weights baked in as constants.

    batch: a concrete int, or "poly" for a symbolic batch dimension
    (serve any N from one artifact).
    """
    return jax_export.export(
        jax.jit(forward), platforms=tuple(platforms)
    )(_image_spec(side, batch))


def export_apply_quantized(apply: Callable, variables: dict,
                           side: int = 128, batch: int | str = "poly",
                           platforms: Sequence[str] = ("cpu",)):
    """int8 weight-only export: ``apply(variables, images)`` is traced
    with the QUANTIZED weights as an *argument* pytree and the dequant
    in-graph. Baking them as closed-over constants instead would fold
    the dequant at trace time and store f32 (measured). Returns
    (exported, qvariables) — save both via ``save_artifact(weights=...)``.
    """
    from simhand_tpu.serving.quant import (dequantize_variables,
                                           quantize_variables)

    qvars = jax.tree.map(np.asarray, quantize_variables(variables))

    def forward(qv, images):
        return apply(dequantize_variables(qv, jnp.float32), images)

    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), qvars)
    exported = jax_export.export(
        jax.jit(forward), platforms=tuple(platforms)
    )(specs, _image_spec(side, batch))
    return exported, qvars


def _flatten_weights(tree, prefix=()):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten_weights(v, prefix + (k,)))
        return out
    return {"/".join(prefix): np.asarray(tree)}


def _unflatten_weights(flat: dict) -> dict:
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        *parents, leaf = key.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return tree


def save_artifact(path: str, exported, meta: dict,
                  weights: dict | None = None) -> None:
    """Single-file artifact: magic + JSON header + [weights npz] +
    serialized export. ``weights`` is the argument pytree of a
    quantized export (None for constants-baked exports)."""
    header = dict(meta)
    header.setdefault("jax_version", jax.__version__)
    header.setdefault("platforms", list(exported.platforms))
    wblob = b""
    if weights is not None:
        buf = io.BytesIO()
        np.savez(buf, **_flatten_weights(weights))
        wblob = buf.getvalue()
    header["weights_len"] = len(wblob)
    blob = exported.serialize()
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        f.write(wblob)
        f.write(blob)


def shard_over_devices(call: Callable, devices=None) -> tuple[Callable, int]:
    """Single-process multi-chip serving: wrap an artifact ``call`` so the
    batch dimension shards over a 1-D ``("data",)`` mesh of ``devices``
    (default: all local devices).

    The deserialized export inlines into the wrapping ``jit``, so XLA's
    SPMD partitioner splits every (batch-parallel) op across the mesh —
    one process drives N chips with one call, activations never leave
    their shard, and the (replicated) weights ride ICI once at compile
    time. This is the one-process counterpart of the N-process scale-out
    pattern in SCALING.md (disjoint cache ranges per process).

    Returns ``(sharded_call, n_devices)``; callers must keep
    ``batch % n_devices == 0`` (the embed CLI pads to the fixed batch
    already, so it only checks the flag once).
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = list(jax.devices() if devices is None else devices)
    mesh = Mesh(np.array(devices), ("data",))
    in_s = NamedSharding(mesh, PartitionSpec("data"))
    fn = jax.jit(call, in_shardings=(in_s,))

    def sharded(images):
        if images.shape[0] % len(devices):
            raise ValueError(
                f"batch {images.shape[0]} not divisible by "
                f"{len(devices)} devices")
        return fn(images)

    return sharded, len(devices)


def load_artifact(path: str) -> tuple[Callable, dict]:
    """Returns (callable images -> outputs dict, header metadata).

    The callable wraps the deserialized export's ``.call`` — compiled
    per concrete input shape on first use; no model code or params
    needed. For quantized artifacts the int8 weight pytree is unpacked
    from the container and placed on device once at load time.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a simhand_tpu serving artifact")
        (hdr_len,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hdr_len).decode("utf-8"))
        wblob = f.read(meta.get("weights_len", 0))
        exported = jax_export.deserialize(bytearray(f.read()))
    if not wblob:
        return exported.call, meta
    with np.load(io.BytesIO(wblob)) as z:
        weights = _unflatten_weights({k: z[k] for k in z.files})
    weights = jax.device_put(weights)
    return lambda images: exported.call(weights, images), meta


# ---------------------------------------------------------------------------
# weight loading for the CLI
# ---------------------------------------------------------------------------

def _init_variables(surface: str, backbone: str, side: int, dtype) -> dict:
    if surface == "detnet":
        from simhand_tpu.finetune.detnet import DetNet

        model = DetNet(resnet_size=backbone, dtype=dtype)
        return model.init(jax.random.key(0),
                          jnp.zeros((1, side, side, 3)))
    from simhand_tpu.models import ContrastiveModel

    model = ContrastiveModel(resnet_size=backbone, dtype=dtype)
    return model.init(jax.random.key(0), jnp.zeros((2, side, side, 3)))


def _load_variables(args, dtype) -> dict:
    variables = _init_variables(args.surface, args.backbone, args.side,
                                dtype)
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze copy
    if args.pth and args.surface == "detnet":
        from simhand_tpu.finetune.torch_port_detnet import (
            torch_state_dict_to_detnet,
        )
        import torch

        sd = torch.load(args.pth, map_location="cpu", weights_only=True)
        params, stats = torch_state_dict_to_detnet(
            {k: v.numpy() for k, v in sd.items()}
        )
        return {"params": params, "batch_stats": stats}
    if args.pth:  # encoder: SiMHand release / torchvision .pth
        from simhand_tpu.hub import load_encoder_into_contrastive

        return load_encoder_into_contrastive(variables, args.pth)
    if args.checkpoint:  # orbax run directory (template-free restore)
        from simhand_tpu.train.checkpoint import CheckpointManager

        tree = CheckpointManager(args.checkpoint).restore_tree()
        if tree is None:
            raise FileNotFoundError(
                f"no checkpoint steps under {args.checkpoint}")
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}
    if not args.random_init:
        raise SystemExit(
            "one of --pth / --checkpoint / --random_init is required")
    return variables


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--surface", choices=("detnet", "encoder"),
                   required=True)
    p.add_argument("--backbone", default="50")
    p.add_argument("--side", type=int, default=128)
    p.add_argument("--batch", default="poly",
                   help='"poly" (any batch) or a concrete int')
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--quantize", choices=("int8", "int8_compute"),
                   default=None,
                   help="int8: weight-only storage (~4x smaller artifact; "
                        "compute stays --dtype). int8_compute: W8A8 — "
                        "BN-folded int8 convs on the MXU's double-rate "
                        "path (serving/int8_infer.py); needs --calib_npy "
                        "for real calibration (random smoke otherwise)")
    p.add_argument("--calib_npy", default=None,
                   help="(N, S, S, 3) f32 npy of representative images "
                        "for int8_compute activation-scale calibration")
    p.add_argument("--calib_cache", default=None,
                   help="packed crop cache directory (data/cache.py): "
                        "sample crops and run them through the serving "
                        "preprocess (resize + ImageNet normalize) as "
                        "int8_compute calibration data")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--pth", default=None,
                   help="torch .pth weights (detnet.pth or encoder)")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint directory")
    p.add_argument("--random_init", action="store_true",
                   help="export freshly initialized weights (smoke)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    variables = _load_variables(args, dtype)
    if args.surface == "detnet":
        apply = detnet_apply(backbone=args.backbone, dtype=dtype,
                             side=args.side)
    else:
        apply = encoder_apply(backbone=args.backbone, dtype=dtype)
    batch = args.batch if args.batch == "poly" else int(args.batch)
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    weights = None
    if args.quantize == "int8_compute":
        from simhand_tpu.serving.int8_infer import (
            build_detnet_int8, build_encoder_int8,
            cache_calibration_batches, random_calibration_batches)

        if args.calib_npy:
            calib = [np.load(args.calib_npy).astype(np.float32)]
        elif args.calib_cache:
            calib = cache_calibration_batches(args.calib_cache,
                                              side=args.side)
        else:
            print("int8_compute: no --calib_npy/--calib_cache; "
                  "calibrating on random images (smoke-grade scales)")
            calib = random_calibration_batches(side=args.side)
        if args.surface == "detnet":
            det_fwd, _ = build_detnet_int8(
                variables, backbone=args.backbone, calib_batches=calib,
                hm_res=args.side // 4)

            def forward(images):  # same key set as detnet_apply
                preds = det_fwd(images)
                return {k: preds[k] for k in
                        ("h_map", "uv", "xyz", "delta")}
        else:
            forward, _ = build_encoder_int8(
                variables, backbone=args.backbone, calib_batches=calib)
        exported = export_forward(forward, side=args.side, batch=batch,
                                  platforms=platforms)
    elif args.quantize:
        exported, weights = export_apply_quantized(
            apply, variables, side=args.side, batch=batch,
            platforms=platforms)
    else:
        exported = export_forward(
            lambda images: apply(variables, images),
            side=args.side, batch=batch, platforms=platforms)
    save_artifact(args.out, exported, weights=weights, meta={
        "surface": args.surface,
        "backbone": args.backbone,
        "side": args.side,
        "batch": batch,
        "dtype": args.dtype,
        "quantize": args.quantize,
    })
    print(json.dumps({
        "artifact": args.out,
        "surface": args.surface,
        "platforms": list(exported.platforms),
        "batch": batch,
    }))


if __name__ == "__main__":
    main()
