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
    linear,
    patchify,
    pp_run_blocks,
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
    return_token_states: bool = False,
    t_mod_offset: Optional[jnp.ndarray] = None,   # motion controller (B, 6, D)
    vace_params: Optional[Dict] = None,
    vace_context: Optional[jnp.ndarray] = None,   # (B, F, H, W, vace_in_dim)
    vace_scale=1.0,
    vace_layers: tuple = (),
    reference_latents: Optional[jnp.ndarray] = None,  # (B, h, w, 16) Fun-Reference
    camera_embedding: Optional[jnp.ndarray] = None,   # (B, S, D) camera adapter tokens
    pp_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Velocity prediction (B, F, H, W, out_dim).

    return_token_states: also return (tokens_pre, tokens_post) around the block stack —
    the TeaCache residual pair (reference :1283-1287).
    t_mod_offset: motion-controller t_mod shift (reference :1445-1446).
    vace_*: VACE hint stack injected after blocks in vace_layers (reference :1486-1487,
    1572-1577).
    reference_latents: Fun-Reference — a 2x2-conv patch of the reference image prepended
    as extra tokens (reference :1467-1471), stripped again after the head (:1587).
    camera_embedding: per-token camera adapter features added to the patch embedding
    (reference wan_video_dit.py:343-346).
    pp_microbatches: with an ambient mesh that has a "pp" axis > 1, run the block
    trunk pipeline-parallel (wan_dit.pp_run_blocks) in this many microbatches."""
    t, t_mod = time_embed(dit_params, dit_cfg, timestep)
    if t_mod_offset is not None:
        t_mod = t_mod + t_mod_offset.astype(t_mod.dtype)
    ctx = text_embed(dit_params, context)

    x = latents
    if y is not None:
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
    tokens, grid = patchify(dit_params["patch_embedding"], x, dit_cfg.patch_size)
    if camera_embedding is not None:
        tokens = tokens + camera_embedding.astype(tokens.dtype)
    tokens_pre = tokens if return_token_states else None  # TeaCache pair (:1283-1287)
    n_ref = 0
    rope_grid = grid
    if reference_latents is not None:
        if "ref_conv" not in dit_params:
            raise ValueError(
                "reference_latents requires a DiT with ref_conv weights "
                "(Fun-Reference checkpoints)")
        if controlnet_params is not None and control_latents is not None:
            raise NotImplementedError(
                "Fun-Reference tokens cannot combine with the goal-force "
                "ControlNet: the side-stack states cover only the video tokens")
        b_, hh_, ww_, c_ = reference_latents.shape
        r = reference_latents.reshape(b_, hh_ // 2, 2, ww_ // 2, 2, c_)
        r = r.transpose(0, 1, 3, 5, 2, 4).reshape(b_, (hh_ // 2) * (ww_ // 2), c_ * 4)
        ref_tokens = linear(dit_params["ref_conv"], r).astype(tokens.dtype)
        n_ref = ref_tokens.shape[1]
        tokens = jnp.concatenate([ref_tokens, tokens], axis=1)
        rope_grid = (grid[0] + 1, grid[1], grid[2])
    tables = rope_tables_3d(dit_cfg.head_dim, dit_cfg.rope_max_len)
    cos, sin = assemble_rope(tables, *rope_grid)

    use_cn = controlnet_params is not None and control_latents is not None
    stride = controlnet_cfg.stride if (use_cn and controlnet_cfg is not None) else None

    if use_cn:
        inj = controlnet_injections(
            controlnet_params, dit_cfg, control_latents.astype(tokens.dtype), ctx, t_mod,
            cos, sin, remat=remat, attn_impl=attn_impl,
            apply_zero_convs=(stride is None),
        )
    if pp_microbatches and (stride is not None or vace_params is not None):
        # Both modes run the trunk as Python-segmented scans between injection
        # points — a shape the GPipe schedule does not cover. Refuse loudly
        # rather than silently falling back to the unpipelined trunk on a mesh
        # whose block weights are stage-major pinned (per-layer cross-stage
        # gathers + unpipelined activation memory on HBM-tight topologies).
        raise NotImplementedError(
            "pp_microbatches cannot be combined with strided-ControlNet or "
            "VACE segmented execution; shard without a pp axis for these modes")
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
    elif vace_params is not None and vace_context is not None:
        # VACE: hints land after strided layers; run segments between injection points.
        # (VACE + goal-force ControlNet are mutually exclusive, as in the reference runs.)
        if use_cn:
            raise NotImplementedError("VACE and goal-force ControlNet cannot be combined")
        from goal_force_tpu.models.adapters import vace_hints

        hints = vace_hints(vace_params, dit_cfg, tokens, vace_context.astype(tokens.dtype),
                           ctx, t_mod, cos, sin, vace_layers=vace_layers)
        import jax

        def seg(a_, b_):
            return jax.tree_util.tree_map(lambda t_: t_[a_:b_], dit_params["blocks"])

        pos = 0
        for n_hint, layer in enumerate(vace_layers):
            tokens, _ = run_blocks(seg(pos, layer + 1), tokens, ctx, t_mod, cos, sin,
                                   dit_cfg, remat=remat, attn_impl=attn_impl)
            tokens = tokens + hints[n_hint].astype(tokens.dtype) * vace_scale
            pos = layer + 1
        if pos < dit_cfg.num_layers:
            tokens, _ = run_blocks(seg(pos, dit_cfg.num_layers), tokens, ctx, t_mod,
                                   cos, sin, dit_cfg, remat=remat, attn_impl=attn_impl)
    elif pp_microbatches:
        tokens = pp_run_blocks(
            dit_params["blocks"], tokens, ctx, t_mod, cos, sin, dit_cfg,
            n_micro=pp_microbatches, injections=inj if use_cn else None,
            remat=remat, attn_impl=attn_impl,
        )
    else:
        tokens, _ = run_blocks(
            dit_params["blocks"], tokens, ctx, t_mod, cos, sin, dit_cfg,
            injections=inj if use_cn else None,
            remat=remat, attn_impl=attn_impl,
        )

    if n_ref:
        tokens = tokens[:, n_ref:]  # strip Fun-Reference tokens (reference :1587)
    out = head(dit_params["head"], tokens, t, dit_cfg.eps)
    out = unpatchify(out, grid, dit_cfg.patch_size, dit_cfg.out_dim)
    if return_token_states:
        return out, (tokens_pre, tokens)
    return out


def denoise_forward_skip(
    dit_params: Dict,
    dit_cfg: WanDiTConfig,
    latents: jnp.ndarray,
    timestep: jnp.ndarray,
    y: Optional[jnp.ndarray],
    residual: jnp.ndarray,
) -> jnp.ndarray:
    """TeaCache skip path: reuse the cached block-stack residual
    (reference :1532-1533,1290-1292) — patchify, add residual, head, unpatchify."""
    t, _ = time_embed(dit_params, dit_cfg, timestep)
    x = latents
    if y is not None:
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
    tokens, grid = patchify(dit_params["patch_embedding"], x, dit_cfg.patch_size)
    tokens = tokens + residual.astype(tokens.dtype)
    out = head(dit_params["head"], tokens, t, dit_cfg.eps)
    return unpatchify(out, grid, dit_cfg.patch_size, dit_cfg.out_dim)


def temporal_tiled_forward(
    model_fn,
    latents: jnp.ndarray,            # (B, F, H, W, C)
    y: Optional[jnp.ndarray],
    window: int,
    stride: int,
    control_latents: Optional[jnp.ndarray] = None,
):
    """Sliding-window denoising over latent frames with linear blend masks.

    Parity with TemporalTiler_BCTHW (/root/reference/src/goal_force/wan_video_new.py:
    1296-1345): mask ramps use (i+0.5)/border; windows advance by `stride` and skip
    once the previous window already covered the tail.

    control_latents are sliced per window and fed to model_fn as a third
    argument — the reference's own tiler path silently DROPS the ControlNet
    (wan_video_new.py:1381-1405 passes no controlnet states inside the tile
    loop); here the side-stack runs per window."""
    import numpy as np

    f = latents.shape[1]
    border = window - stride
    value = jnp.zeros_like(latents, dtype=jnp.float32)
    weight = np.zeros((1, f, 1, 1, 1), np.float32)
    for t0 in range(0, f, stride):
        if t0 - stride >= 0 and t0 - stride + window >= f:
            continue
        t1 = min(t0 + window, f)
        out = model_fn(latents[:, t0:t1], None if y is None else y[:, t0:t1],
                       None if control_latents is None
                       else control_latents[:, t0:t1])
        n = t1 - t0
        mask = np.ones((n,), np.float32)
        if border > 0:
            ramp = (np.arange(border) + 0.5) / border
            if t0 != 0:
                mask[:border] = ramp
            if t1 != f:
                mask[-border:] = ramp[::-1]
        m = jnp.asarray(mask).reshape(1, n, 1, 1, 1)
        value = value.at[:, t0:t1].add(out.astype(jnp.float32) * m)
        weight[:, t0:t1] += mask.reshape(1, n, 1, 1, 1)
    return (value / jnp.asarray(weight)).astype(latents.dtype)
