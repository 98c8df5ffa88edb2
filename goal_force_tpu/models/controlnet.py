"""Force/mass ControlNet: patch-embed + N DiT-block copies + zero-init 1x1 convs.

Parity with /root/reference/src/goal_force/wan_video_new.py:40-117 (module structure),
:536-571 (weight init by copying the first N — optionally strided — blocks of each DiT
expert), and the per-block injection loop at :1489-1522, 1559-1570.

TPU design: block params are a stacked pytree (same structure as wan_dit blocks) so the
side-stack runs as one lax.scan collecting states; zero convs are a batched matmul
(N, D, D) applied to the collected (N, B, S, D) states in one einsum. Weight init from a
DiT is a tree slice — the reference's deepcopy dance disappears.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import ControlNetConfig, WanDiTConfig
from goal_force_tpu.models.wan_dit import patchify, run_blocks


def init_from_dit(
    key,
    dit_params: Dict,
    dit_cfg: WanDiTConfig,
    cfg: ControlNetConfig,
    dtype=jnp.bfloat16,
) -> Dict:
    """Copy block weights from the expert DiT (strided: block_id * stride — reference
    :561-571); fresh patch embedding; zero-init zero convs (:114-117)."""
    stride = cfg.stride or 1
    idx = jnp.asarray([i * stride for i in range(cfg.num_layers)])
    blocks = jax.tree_util.tree_map(lambda a: jnp.asarray(a)[idx], dit_params["blocks"])
    patch_in = cfg.in_channels * math.prod(dit_cfg.patch_size)
    scale = 1.0 / math.sqrt(patch_in)
    return {
        "patch_embedding": {
            "w": jax.random.uniform(key, (patch_in, dit_cfg.dim), dtype, -scale, scale),
            "b": jnp.zeros((dit_cfg.dim,), dtype),
        },
        "blocks": blocks,
        "zero_convs": {
            "w": jnp.zeros((cfg.num_layers, dit_cfg.dim, dit_cfg.dim), dtype),
            "b": jnp.zeros((cfg.num_layers, dit_cfg.dim), dtype),
        },
    }


def init_controlnet(key, dit_cfg: WanDiTConfig, cfg: ControlNetConfig, dtype=jnp.bfloat16) -> Dict:
    """Random init (structure only; real runs init from the DiT or a checkpoint)."""
    from goal_force_tpu.models.wan_dit import init_block

    ks = jax.random.split(key, cfg.num_layers + 1)
    blocks = [init_block(k, dit_cfg, dtype) for k in ks[:-1]]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    patch_in = cfg.in_channels * math.prod(dit_cfg.patch_size)
    scale = 1.0 / math.sqrt(patch_in)
    return {
        "patch_embedding": {
            "w": jax.random.uniform(ks[-1], (patch_in, dit_cfg.dim), dtype, -scale, scale),
            "b": jnp.zeros((dit_cfg.dim,), dtype),
        },
        "blocks": stacked,
        "zero_convs": {
            "w": jnp.zeros((cfg.num_layers, dit_cfg.dim, dit_cfg.dim), dtype),
            "b": jnp.zeros((cfg.num_layers, dit_cfg.dim), dtype),
        },
    }


def controlnet_injections(
    params: Dict,
    dit_cfg: WanDiTConfig,
    control_latents: jnp.ndarray,
    context: jnp.ndarray,
    t_mod: jnp.ndarray,
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    remat: bool = False,
    attn_impl: str = "auto",
    apply_zero_convs: bool = True,
) -> jnp.ndarray:
    """Run the side-stack and return per-layer injections (N, B, S, D).

    control_latents: (B, F, H, W, 16) VAE-encoded control video. The side stack mirrors
    the reference loop (:1489-1522); the zero convs (:1559-1570) are fused here into one
    batched matmul so the main-stack scan just adds injections[i]. In strided mode the
    reference adds raw states without zero convs (:1560-1562) — apply_zero_convs=False.
    """
    from goal_force_tpu.parallel.mesh import constrain

    tokens, _ = patchify(params["patch_embedding"], control_latents, dit_cfg.patch_size)
    if not apply_zero_convs:
        _, states = run_blocks(
            params["blocks"], tokens, context, t_mod, rope_cos, rope_sin, dit_cfg,
            collect=True, remat=remat, attn_impl=attn_impl,
        )  # (N, B, S, D)
        return constrain(states, None, "dp", "sp", None)

    # zero convs fused INTO the side-stack scan: only the post-zero-conv
    # injections are materialized — the raw (N, B, S, D) state stack (6.7 GB
    # at A14B geometry) is never written/re-read. The layout constraint also
    # keeps the saved stack token-sharded (sp), matching the residuals the
    # main stack adds them to (unconstrained, the FSDP-sharded zero-conv
    # weights propagate a D-sharding into the stack and the train backward
    # forces an involuntary full rematerialization).
    from goal_force_tpu.models.wan_dit import dit_block

    zc = params["zero_convs"]

    def body(carry, layer):
        c = carry
        p_blk, zc_w, zc_b = layer
        c = constrain(c, "dp", "sp", None)
        c = dit_block(p_blk, c, context, t_mod, rope_cos, rope_sin, dit_cfg,
                      attn_impl)
        inj = jnp.matmul(c, zc_w.astype(c.dtype)) + zc_b.astype(c.dtype)
        return c, constrain(inj, "dp", "sp", None)

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    _, inj = jax.lax.scan(body, tokens, (params["blocks"], zc["w"], zc["b"]))
    return constrain(inj, None, "dp", "sp", None)
