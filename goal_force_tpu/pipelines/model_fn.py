"""The full denoiser forward: DiT + ControlNet side-stack + conditioning.

Mirrors model_fn_wan_video (/root/reference/src/goal_force/wan_video_new.py:1349-1591):
time embed -> text embed -> y concat -> patchify -> RoPE -> ControlNet states -> 40 blocks
with per-block injection -> head -> unpatchify. Everything here traces into ONE XLA
computation — the reference's per-step Python orchestration (TeaCache checks, USP chunking,
offload hooks) lives outside at the pipeline/sharding layer.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from goal_force_tpu.configs import ControlNetConfig, WanDiTConfig
from goal_force_tpu.models.controlnet import controlnet_injections
from goal_force_tpu.models.wan_dit import (
    head,
    patchify,
    run_blocks,
    text_embed,
    time_embed,
    unpatchify,
)
from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d


def denoise_forward(
    dit_params: Dict,
    dit_cfg: WanDiTConfig,
    latents: jnp.ndarray,            # (B, F, H, W, 16)
    timestep: jnp.ndarray,           # (B,)
    context: jnp.ndarray,            # (B, L_txt, text_dim)
    y: Optional[jnp.ndarray] = None,  # (B, F, H, W, 20)
    controlnet_params: Optional[Dict] = None,
    controlnet_cfg: Optional[ControlNetConfig] = None,
    control_latents: Optional[jnp.ndarray] = None,  # (B, F, H, W, 16)
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Velocity prediction (B, F, H, W, out_dim)."""
    t, t_mod = time_embed(dit_params, dit_cfg, timestep)
    ctx = text_embed(dit_params, context)

    x = latents
    if y is not None:
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
    tokens, grid = patchify(dit_params["patch_embedding"], x, dit_cfg.patch_size)
    tables = rope_tables_3d(dit_cfg.head_dim, dit_cfg.rope_max_len)
    cos, sin = assemble_rope(tables, *grid)

    use_cn = controlnet_params is not None and control_latents is not None
    stride = controlnet_cfg.stride if (use_cn and controlnet_cfg is not None) else None

    if use_cn:
        inj = controlnet_injections(
            controlnet_params, dit_cfg, control_latents.astype(tokens.dtype), ctx, t_mod,
            cos, sin, remat=remat, attn_impl=attn_impl,
            apply_zero_convs=(stride is None),
        )
    if use_cn and stride is not None:
        # Strided mode: raw states added after blocks 0, stride, 2*stride, ...
        # (reference :1560-1562 — note no zero conv in this mode).
        n_layers = dit_cfg.num_layers
        n_inj = inj.shape[0]
        import jax

        def seg(blocks, a, b):
            return jax.tree_util.tree_map(lambda t_: t_[a:b], blocks)

        pos = 0
        for i in range(n_inj):
            stop = min(pos + 1, n_layers)
            tokens, _ = run_blocks(
                seg(dit_params["blocks"], pos, stop), tokens, ctx, t_mod, cos, sin,
                dit_cfg, remat=remat, attn_impl=attn_impl,
            )
            tokens = tokens + inj[i].astype(tokens.dtype)
            pos = stop
            nxt = min(pos + stride - 1, n_layers) if i + 1 < n_inj else n_layers
            if nxt > pos:
                tokens, _ = run_blocks(
                    seg(dit_params["blocks"], pos, nxt), tokens, ctx, t_mod, cos, sin,
                    dit_cfg, remat=remat, attn_impl=attn_impl,
                )
                pos = nxt
    else:
        tokens, _ = run_blocks(
            dit_params["blocks"], tokens, ctx, t_mod, cos, sin, dit_cfg,
            injections=inj if use_cn else None,
            remat=remat, attn_impl=attn_impl,
        )

    out = head(dit_params["head"], tokens, t, dit_cfg.eps)
    return unpatchify(out, grid, dit_cfg.patch_size, dit_cfg.out_dim)
