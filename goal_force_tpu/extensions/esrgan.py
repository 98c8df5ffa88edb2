"""ESRGAN 4x upscaler (RRDBNet).

Parity with /root/reference/diffsynth/extensions/ESRGAN/__init__.py: 23 RRDB blocks of
3 residual-dense blocks each, 0.2-scaled residuals, two nearest-2x upsample stages.
Channels-last; the 23 identical RRDB blocks run under lax.scan (stacked params) so the
network compiles once per block instead of 23 times.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp


def _conv(p, x):
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(p, x):
    x1 = _lrelu(_conv(p["conv1"], x))
    x2 = _lrelu(_conv(p["conv2"], jnp.concatenate([x, x1], -1)))
    x3 = _lrelu(_conv(p["conv3"], jnp.concatenate([x, x1, x2], -1)))
    x4 = _lrelu(_conv(p["conv4"], jnp.concatenate([x, x1, x2, x3], -1)))
    x5 = _conv(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], -1))
    return x5 * 0.2 + x


def _rrdb(p, x):
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return out * 0.2 + x


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def rrdbnet_apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) [0,1] -> (B, 4H, 4W, 3)."""
    feat = _conv(params["conv_first"], x)

    def body(carry, blk):
        return _rrdb(blk, carry), None

    body_feat, _ = jax.lax.scan(body, feat, params["body"])
    feat = feat + _conv(params["conv_body"], body_feat)
    feat = _lrelu(_conv(params["conv_up1"], _up2(feat)))
    feat = _lrelu(_conv(params["conv_up2"], _up2(feat)))
    return _conv(params["conv_last"], _lrelu(_conv(params["conv_hr"], feat)))


def rrdbnet_params_from_torch(sd) -> Dict:
    def conv(name):
        return {"w": np.ascontiguousarray(sd[name + ".weight"].transpose(2, 3, 1, 0)),
                "b": sd[name + ".bias"]}

    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("body."))
    blocks = []
    for i in range(n_blocks):
        blk = {}
        for r in ("rdb1", "rdb2", "rdb3"):
            blk[r] = {f"conv{j}": conv(f"body.{i}.{r}.conv{j}") for j in range(1, 6)}
        blocks.append(blk)
    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    return {
        "conv_first": conv("conv_first"),
        "body": stacked,
        "conv_body": conv("conv_body"),
        "conv_up1": conv("conv_up1"),
        "conv_up2": conv("conv_up2"),
        "conv_hr": conv("conv_hr"),
        "conv_last": conv("conv_last"),
    }


class ESRGAN:
    """Batched image upscaler with the reference's [0,1] float contract (:93-137)."""

    def __init__(self, params: Dict):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._fn = jax.jit(lambda p, x: rrdbnet_apply(p, x))

    @classmethod
    def from_torch_checkpoint(cls, path: str) -> "ESRGAN":
        from goal_force_tpu.io.safetensors_io import load_safetensors, load_torch_pth

        sd = (load_torch_pth(path) if path.endswith((".pth", ".pt"))
              else load_safetensors(path))
        if "params_ema" in sd:
            sd = sd["params_ema"]
        return cls(rrdbnet_params_from_torch(sd))

    def upscale(self, images: np.ndarray, batch_size: int = 4) -> np.ndarray:
        """(F, H, W, 3) float [0,1] -> (F, 4H, 4W, 3) float [0,1]."""
        out = []
        for i in range(0, images.shape[0], batch_size):
            batch = jnp.asarray(images[i:i + batch_size], jnp.float32)
            out.append(np.asarray(self._fn(self.params, batch)))
        return np.clip(np.concatenate(out), 0.0, 1.0)
