"""Weight-only int8 quantization for serving artifacts.

Conv/dense kernels are stored as per-output-channel symmetric int8
(q = round(w / s), s = max|w| / 127 over all-but-last axes) and
dequantized to the compute dtype inside the traced forward — so the
baked-in constants of a StableHLO artifact shrink ~4x (a rn50 encoder
artifact drops from ~100 MB to ~26 MB) while the math stays the model's
own bf16/f32. Small leaves (biases, BN scale/shift, running stats) stay
float: they are a rounding error of the file size and quantizing them
costs accuracy for nothing.

This is deliberately weight-only: activations keep the compute dtype,
no calibration pass is needed, and accuracy loss is bounded by kernel
rounding (tested: encoder embedding cosine vs f32, detnet uv parity).
Full int8 activation compute (the MXU's 2x int8 path) is gated on the
scripts/bench_int8.py probe and intentionally not built until that
probe shows >1.5x on the serving shapes.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

def _is_kernel(name: str, leaf) -> bool:
    return (
        name in ("kernel", "w") and hasattr(leaf, "ndim") and leaf.ndim >= 2
        and leaf.size >= 4096
    )


def _is_quant_node(tree: dict) -> bool:
    # no flax module in this framework has exactly these children
    # (BN = {scale, bias}, conv/dense = {kernel[, bias]})
    return set(tree.keys()) == {"q", "scale"}


def quantize_tree(tree: Any) -> Any:
    """Recursively replaces large kernel leaves of a params dict with
    ``{"q": int8, "scale": f32 per-out-channel}``."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for name, leaf in tree.items():
        if isinstance(leaf, dict):
            out[name] = quantize_tree(leaf)
        elif _is_kernel(name, leaf):
            w = np.asarray(leaf, np.float32)
            axes = tuple(range(w.ndim - 1))
            scale = np.max(np.abs(w), axis=axes) / 127.0
            scale = np.maximum(scale, 1e-12).astype(np.float32)
            q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
            out[name] = {"q": q, "scale": scale}
        else:
            out[name] = leaf
    return out


def dequantize_tree(tree: Any, dtype=jnp.float32) -> Any:
    """Inverse of ``quantize_tree``. MUST run on tracers (the quantized
    tree passed as a jitted-function ARGUMENT): on concrete constants
    the multiply executes eagerly at trace time and the export bakes the
    dequantized f32 right back in (measured — f32-sized artifact)."""
    if not isinstance(tree, dict):
        return tree
    if _is_quant_node(tree):
        return (tree["q"].astype(dtype)
                * jnp.asarray(tree["scale"], dtype))
    return {k: dequantize_tree(v, dtype) for k, v in tree.items()}


def quantize_variables(variables: dict) -> dict:
    """Quantizes the ``params`` collection; ``batch_stats`` (and any other
    collections) pass through untouched."""
    out = dict(variables)
    out["params"] = quantize_tree(variables["params"])
    return out


def dequantize_variables(qvariables: dict, dtype=jnp.float32) -> dict:
    out = dict(qvariables)
    out["params"] = dequantize_tree(qvariables["params"], dtype)
    return out


def quantized_size_fraction(variables: dict) -> float:
    """Bytes(quantized) / bytes(f32) — the expected artifact shrink."""
    import jax

    def nbytes(t):
        return sum(np.asarray(x).nbytes for x in jax.tree.leaves(t))

    return nbytes(quantize_variables(variables)) / nbytes(
        jax.tree.map(lambda x: np.asarray(x, np.float32), variables))
