"""Stable Diffusion 1.5 UNet (epsilon-prediction, 860M), JAX / NHWC.

First member of the non-Wan model zoo (SURVEY §2.3 "other model families").
The reference implements this as a flat ModuleList of 62 blocks threaded
through a push/pop residual stack (reference: diffsynth/models/sd_unet.py:
229-345); here the same topology is a declarative BLOCK PLAN — a tuple of
("res"|"attn"|"push"|"pop"|"down"|"up", ...) specs — interpreted by one pure
function over a params list. The plan is data, so tiny test-sized UNets and
the real SD-1.5 geometry share every code path, and the full graph unrolls
under one jit (stack push/pop happens at trace time).

TPU-native choices: NHWC activations with HWIO conv weights (XLA's preferred
conv layout), GroupNorm in f32, attention via one einsum-softmax (token counts
here are <=4096, far below flash-attention territory).

Weight layout matches the reference's diffsynth-format state dict
(blocks.{i}.*); the reference converts civitai/diffusers checkpoints into
that format first (reference: sd_unet.py:348+ SDUNetStateDictConverter), so
files load here through the same path.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Block plan
# ---------------------------------------------------------------------------

# ("res", in_ch, out_ch) | ("attn", heads, head_dim, ch, ctx_dim[, depth])
# | ("push",) | ("pop",) | ("down", ch) | ("up", ch)   (depth defaults to 1)
BlockSpec = Tuple

SD15_PLAN: Tuple[BlockSpec, ...] = (
    # CrossAttnDownBlock2D x3, DownBlock2D, mid, UpBlock2D, CrossAttnUpBlock2D x3
    ("res", 320, 320), ("attn", 8, 40, 320, 768), ("push",),
    ("res", 320, 320), ("attn", 8, 40, 320, 768), ("push",),
    ("down", 320), ("push",),
    ("res", 320, 640), ("attn", 8, 80, 640, 768), ("push",),
    ("res", 640, 640), ("attn", 8, 80, 640, 768), ("push",),
    ("down", 640), ("push",),
    ("res", 640, 1280), ("attn", 8, 160, 1280, 768), ("push",),
    ("res", 1280, 1280), ("attn", 8, 160, 1280, 768), ("push",),
    ("down", 1280), ("push",),
    ("res", 1280, 1280), ("push",),
    ("res", 1280, 1280), ("push",),
    ("res", 1280, 1280), ("attn", 8, 160, 1280, 768), ("res", 1280, 1280),
    ("pop",), ("res", 2560, 1280),
    ("pop",), ("res", 2560, 1280),
    ("pop",), ("res", 2560, 1280), ("up", 1280),
    ("pop",), ("res", 2560, 1280), ("attn", 8, 160, 1280, 768),
    ("pop",), ("res", 2560, 1280), ("attn", 8, 160, 1280, 768),
    ("pop",), ("res", 1920, 1280), ("attn", 8, 160, 1280, 768), ("up", 1280),
    ("pop",), ("res", 1920, 640), ("attn", 8, 80, 640, 768),
    ("pop",), ("res", 1280, 640), ("attn", 8, 80, 640, 768),
    ("pop",), ("res", 960, 640), ("attn", 8, 80, 640, 768), ("up", 640),
    ("pop",), ("res", 960, 320), ("attn", 8, 40, 320, 768),
    ("pop",), ("res", 640, 320), ("attn", 8, 40, 320, 768),
    ("pop",), ("res", 640, 320), ("attn", 8, 40, 320, 768),
)

SD15_TIME_DIM = 1280
SD15_MODEL_DIM = 320


def tiny_sd_plan(ctx_dim: int = 24) -> Tuple[BlockSpec, ...]:
    """Structure-complete miniature (all block types, one down/up level)."""
    return (
        ("res", 8, 8), ("attn", 2, 4, 8, ctx_dim), ("push",),
        ("down", 8), ("push",),
        ("res", 8, 16), ("push",),
        ("res", 16, 16), ("attn", 2, 8, 16, ctx_dim), ("res", 16, 16),
        ("pop",), ("res", 32, 16),
        ("pop",), ("res", 24, 8), ("up", 8),
        ("pop",), ("res", 16, 8), ("attn", 2, 4, 8, ctx_dim),
    )


# ---------------------------------------------------------------------------
# Primitives (NHWC)
# ---------------------------------------------------------------------------


def group_norm(p: Dict, x: jnp.ndarray, groups: int = 32,
               eps: float = 1e-5) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = xf.mean((1, 2, 4), keepdims=True)
    var = xf.var((1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(b, h, w, c) * p["scale"] + p["bias"]).astype(x.dtype)


def layer_norm(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def conv2d(p: Dict, x: jnp.ndarray, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["b"].astype(x.dtype)


def timestep_embedding(timesteps: jnp.ndarray, dim: int) -> jnp.ndarray:
    """cat([cos, sin]) sinusoid (reference: sd_unet.py:6-17 — note cos first,
    the opposite of the usual diffusers order)."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    ang = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _attention(p: Dict, x: jnp.ndarray, ctx: jnp.ndarray,
               num_heads: int, ip=None, ctx_len=None) -> jnp.ndarray:
    """ctx_len: optional (B,) natural context lengths. The merged-CFG batch
    pads a shorter prompt's context to the longest row with extra all-pad
    77-token sentences (pipelines/sd.py::_long_ids); masking keys past the
    row's natural length makes the padded row compute EXACTLY what the
    reference's separate natural-length call computes (sd_unet.py:325-345
    never sees the pad sentences because posi/nega run as separate calls)."""
    b, s, _ = x.shape
    t = ctx.shape[1]
    q = x @ p["q_w"] + p["q_b"] if "q_b" in p else x @ p["q_w"]
    k = ctx @ p["k_w"] + p["k_b"] if "k_b" in p else ctx @ p["k_w"]
    v = ctx @ p["v_w"] + p["v_b"] if "v_b" in p else ctx @ p["v_w"]
    q = q.reshape(b, s, num_heads, -1)
    k = k.reshape(b, t, num_heads, -1)
    v = v.reshape(b, t, num_heads, -1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhc,bkhc->bhqk", q, k) * scale
    if ctx_len is not None:
        col = jnp.arange(t)
        keep = col[None, None, None, :] < jnp.asarray(
            ctx_len, jnp.int32)[:, None, None, None]
        logits = jnp.where(keep, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhc->bqhc", probs, v).reshape(b, s, -1)
    if ip is not None:
        # IP-Adapter: same query over image K/V, added pre-output-projection
        # (reference attention.py:29-56 interact_with_ipadapter)
        ti = ip["k"].shape[1]
        ipk = jnp.broadcast_to(ip["k"], (b, ti, ip["k"].shape[-1]))
        ipv = jnp.broadcast_to(ip["v"], (b, ti, ip["v"].shape[-1]))
        ipk = ipk.reshape(b, ti, num_heads, -1).astype(q.dtype)
        ipv = ipv.reshape(b, ti, num_heads, -1).astype(q.dtype)
        lg = jnp.einsum("bqhc,bkhc->bhqk", q, ipk) * scale
        pr = jax.nn.softmax(lg.astype(jnp.float32), -1).astype(x.dtype)
        out = out + ip["scale"] * jnp.einsum("bhqk,bkhc->bqhc", pr,
                                             ipv).reshape(b, s, -1)
    return out @ p["o_w"] + p["o_b"]


def _transformer_block(p: Dict, x: jnp.ndarray, ctx: jnp.ndarray,
                       num_heads: int, ip=None, ctx_len=None) -> jnp.ndarray:
    x = x + _attention(p["attn1"], layer_norm(p["norm1"], x),
                       layer_norm(p["norm1"], x), num_heads)
    x = x + _attention(p["attn2"], layer_norm(p["norm2"], x), ctx, num_heads,
                       ip=ip, ctx_len=ctx_len)
    y = layer_norm(p["norm3"], x) @ p["geglu_w"] + p["geglu_b"]
    y, gate = jnp.split(y, 2, axis=-1)
    y = y * jax.nn.gelu(gate, approximate=False)
    return x + (y @ p["ff_w"] + p["ff_b"])


def _resnet(p: Dict, x: jnp.ndarray, temb, groups: int = 32,
            eps: float = 1e-5) -> jnp.ndarray:
    h = jax.nn.silu(group_norm(p["norm1"], x, groups, eps=eps))
    h = conv2d(p["conv1"], h)
    if temb is not None:
        h = h + (jax.nn.silu(temb) @ p["temb_w"] + p["temb_b"])[:, None, None, :]
    h = jax.nn.silu(group_norm(p["norm2"], h, groups, eps=eps))
    h = conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x)
    return x + h


def _attn_block(p: Dict, x: jnp.ndarray, ctx: jnp.ndarray, num_heads: int,
                groups: int = 32, eps: float = 1e-6, ip=None,
                cross_frame: bool = False,
                tile_ctx: Optional[Tuple[int, int]] = None,
                ctx_len=None) -> jnp.ndarray:
    """cross_frame: flatten all frames into ONE sequence so self-attention
    spans the whole video, with the batch-mean text context (reference
    sd_unet.py:164-166,198-199).

    tile_ctx: (tile_size, tile_stride) enables the reference's per-transformer-
    block spatial tiling (sd_unet.py:172-190): each transformer block runs over
    overlapping (ts, ts) tiles of the spatial grid, blended with the ramp mask;
    tile_size clamps to min(h, w) per resolution. IP-Adapter kwargs are ignored
    on the tiled path, as in the reference."""
    b, h, w, c = x.shape
    res = x
    t = group_norm(p["norm"], x, groups, eps=eps).reshape(b, h * w, c)
    t = t @ p["proj_in_w"] + p["proj_in_b"]
    if tile_ctx is not None:
        from goal_force_tpu.models.tiler import tiled_forward_2d

        ts = min(tile_ctx[0], h, w)
        for tp in p["transformer_blocks"]:
            fn = lambda xt: _transformer_block(
                tp, xt.reshape(xt.shape[0], -1, c), ctx, num_heads,
                ctx_len=ctx_len,
            ).reshape(xt.shape)
            t = tiled_forward_2d(fn, t.reshape(b, h, w, c), ts, tile_ctx[1]
                                 ).astype(t.dtype).reshape(b, h * w, c)
    else:
        if cross_frame:
            # AnimateDiff cross-frame path mixes the batch contexts by mean;
            # per-row natural lengths don't apply there
            t = t.reshape(1, b * h * w, c)
            ctx = ctx.mean(axis=0, keepdims=True)
            ctx_len = None
        for di, tp in enumerate(p["transformer_blocks"]):
            t = _transformer_block(tp, t, ctx, num_heads,
                                   ip=None if ip is None else ip.get(di),
                                   ctx_len=ctx_len)
        if cross_frame:
            t = t.reshape(b, h * w, c)
    t = t @ p["proj_out_w"] + p["proj_out_b"]
    return t.reshape(b, h, w, c) + res


def sd_unet_apply(params: Dict, plan: Sequence[BlockSpec], sample: jnp.ndarray,
                  timestep: jnp.ndarray, text_emb: jnp.ndarray,
                  groups: int = 32,
                  controlnet_res: Optional[List[jnp.ndarray]] = None,
                  motion: Optional[Dict] = None,
                  video_batch: int = 1,
                  ipadapter: Optional[Dict] = None,
                  cross_frame_attention: bool = False,
                  tile_ctx: Optional[Tuple[int, int]] = None,
                  ctx_len=None) -> jnp.ndarray:
    """sample (B, H, W, 4) NHWC latents + (B,) timestep + (B, 77, ctx) text
    embeddings -> predicted noise (B, H, W, 4)
    (reference: sd_unet.py:325-345 SDUNet.forward).

    controlnet_res: zero-conv residuals from sd_controlnet_apply, injected at the
    end of the down+mid phase — hidden += res[-1], remaining stack entries +=
    res[:-1] (reference dancer.py:102-107).
    motion: AnimateDiff temporal modules {"modules": [...], "call": {plan_idx:
    module_idx}} applied after the mapped plan entries (dancer.py:93-100);
    video_batch groups the leading axis as (video_batch, frames)."""
    temb = timestep_embedding(timestep, params["conv_in"]["w"].shape[-1])
    temb = jax.nn.silu(temb.astype(sample.dtype) @ params["time_w1"]
                       + params["time_b1"])
    temb = temb @ params["time_w2"] + params["time_b2"]

    x = conv2d(params["conv_in"], sample)
    stack: List[jnp.ndarray] = [x]
    cn_applied = controlnet_res is None
    for i, (spec, p) in enumerate(zip(plan, params["blocks"])):
        kind = spec[0]
        if kind == "pop" and not cn_applied:
            x = x + controlnet_res[-1].astype(x.dtype)
            stack = [s + r.astype(s.dtype)
                     for s, r in zip(stack, controlnet_res[:-1])] \
                + stack[len(controlnet_res) - 1:]
            cn_applied = True
        if kind == "res":
            x = _resnet(p, x, temb, groups)
        elif kind == "attn":
            x = _attn_block(p, x, text_emb, num_heads=spec[1], groups=groups,
                            ip=None if ipadapter is None else ipadapter.get(i),
                            cross_frame=cross_frame_attention,
                            tile_ctx=tile_ctx, ctx_len=ctx_len)
        elif kind == "push":
            stack.append(x)
        elif kind == "pop":
            x = jnp.concatenate([x, stack.pop()], axis=-1)
        elif kind == "down":
            x = conv2d(p["conv"], x, stride=2,
                       padding=((1, 1), (1, 1)))
        elif kind == "up":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = conv2d(p["conv"], x)
        else:
            raise ValueError(spec)
        if motion is not None and i in motion["call"]:
            from goal_force_tpu.models.sd_motion import temporal_block_apply

            x = temporal_block_apply(motion["modules"][motion["call"][i]], x,
                                     groups=groups, video_batch=video_batch)
    x = jax.nn.silu(group_norm(params["conv_norm_out"], x, groups))
    return conv2d(params["conv_out"], x)


# ---------------------------------------------------------------------------
# Converter + init
# ---------------------------------------------------------------------------


def _lin(sd, pre, transpose=True):
    w = np.asarray(sd[pre + ".weight"])
    out = {"w": np.ascontiguousarray(w.T) if transpose else w}
    if pre + ".bias" in sd:
        out["b"] = np.asarray(sd[pre + ".bias"])
    return out


def _conv(sd, pre):
    return {"w": np.ascontiguousarray(
        np.transpose(np.asarray(sd[pre + ".weight"]), (2, 3, 1, 0))),
        "b": np.asarray(sd[pre + ".bias"])}


def _norm(sd, pre):
    return {"scale": np.asarray(sd[pre + ".weight"]),
            "bias": np.asarray(sd[pre + ".bias"])}


def sd_unet_params_from_torch(sd, plan: Sequence[BlockSpec] = SD15_PLAN) -> Dict:
    """Convert the reference's diffsynth-format SDUNet state dict
    (blocks.{i}.* naming, reference: sd_unet.py:229-323)."""
    blocks = []
    for i, spec in enumerate(plan):
        pre = f"blocks.{i}"
        kind = spec[0]
        num_transformer_layers = spec[5] if kind == "attn" and len(spec) > 5 else 1
        if kind == "res":
            p = {
                "norm1": _norm(sd, pre + ".norm1"),
                "conv1": _conv(sd, pre + ".conv1"),
                "temb_w": np.asarray(sd[pre + ".time_emb_proj.weight"]).T,
                "temb_b": np.asarray(sd[pre + ".time_emb_proj.bias"]),
                "norm2": _norm(sd, pre + ".norm2"),
                "conv2": _conv(sd, pre + ".conv2"),
            }
            if pre + ".conv_shortcut.weight" in sd:
                p["shortcut"] = _conv(sd, pre + ".conv_shortcut")
            blocks.append(p)
        elif kind == "attn":
            tbs = []
            for j in range(num_transformer_layers):
                tp = f"{pre}.transformer_blocks.{j}"
                tbs.append({
                    "norm1": _norm(sd, tp + ".norm1"),
                    "attn1": {
                        "q_w": np.asarray(sd[tp + ".attn1.to_q.weight"]).T,
                        "k_w": np.asarray(sd[tp + ".attn1.to_k.weight"]).T,
                        "v_w": np.asarray(sd[tp + ".attn1.to_v.weight"]).T,
                        "o_w": np.asarray(sd[tp + ".attn1.to_out.weight"]).T,
                        "o_b": np.asarray(sd[tp + ".attn1.to_out.bias"]),
                    },
                    "norm2": _norm(sd, tp + ".norm2"),
                    "attn2": {
                        "q_w": np.asarray(sd[tp + ".attn2.to_q.weight"]).T,
                        "k_w": np.asarray(sd[tp + ".attn2.to_k.weight"]).T,
                        "v_w": np.asarray(sd[tp + ".attn2.to_v.weight"]).T,
                        "o_w": np.asarray(sd[tp + ".attn2.to_out.weight"]).T,
                        "o_b": np.asarray(sd[tp + ".attn2.to_out.bias"]),
                    },
                    "norm3": _norm(sd, tp + ".norm3"),
                    "geglu_w": np.asarray(sd[tp + ".act_fn.proj.weight"]).T,
                    "geglu_b": np.asarray(sd[tp + ".act_fn.proj.bias"]),
                    "ff_w": np.asarray(sd[tp + ".ff.weight"]).T,
                    "ff_b": np.asarray(sd[tp + ".ff.bias"]),
                })
            blocks.append({
                "norm": _norm(sd, pre + ".norm"),
                "proj_in_w": np.asarray(sd[pre + ".proj_in.weight"]).T,
                "proj_in_b": np.asarray(sd[pre + ".proj_in.bias"]),
                "transformer_blocks": tbs,
                "proj_out_w": np.asarray(sd[pre + ".proj_out.weight"]).T,
                "proj_out_b": np.asarray(sd[pre + ".proj_out.bias"]),
            })
        elif kind in ("down", "up"):
            blocks.append({"conv": _conv(sd, pre + ".conv")})
        else:
            blocks.append({})
    return {
        "time_w1": np.asarray(sd["time_embedding.0.weight"]).T,
        "time_b1": np.asarray(sd["time_embedding.0.bias"]),
        "time_w2": np.asarray(sd["time_embedding.2.weight"]).T,
        "time_b2": np.asarray(sd["time_embedding.2.bias"]),
        "conv_in": _conv(sd, "conv_in"),
        "blocks": blocks,
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }


def init_sd_unet(key, plan: Sequence[BlockSpec] = SD15_PLAN,
                 model_dim: int = SD15_MODEL_DIM, time_dim: int = SD15_TIME_DIM,
                 in_channels: int = 4, groups: int = 32,
                 dtype=jnp.float32) -> Dict:
    n_keys = sum(8 * (s[5] if s[0] == "attn" and len(s) > 5 else 1) + 8
                 for s in plan) + 16
    ks = iter(jax.random.split(key, n_keys))
    n = lambda *s: jax.random.normal(next(ks), s, dtype) * 0.02
    norm = lambda c: {"scale": jnp.ones(c, dtype), "bias": jnp.zeros(c, dtype)}
    conv = lambda ci, co, k=3: {"w": n(k, k, ci, co), "b": jnp.zeros(co, dtype)}

    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind == "res":
            _, ci, co = spec
            p = {"norm1": norm(ci), "conv1": conv(ci, co),
                 "temb_w": n(time_dim, co), "temb_b": jnp.zeros(co, dtype),
                 "norm2": norm(co), "conv2": conv(co, co)}
            if ci != co:
                p["shortcut"] = conv(ci, co, 1)
            blocks.append(p)
        elif kind == "attn":
            heads, hd, ch, ctx = spec[1:5]
            depth = spec[5] if len(spec) > 5 else 1
            inner = heads * hd

            def tb():
                return {"norm1": norm(inner),
                        "attn1": {"q_w": n(inner, inner), "k_w": n(inner, inner),
                                  "v_w": n(inner, inner), "o_w": n(inner, inner),
                                  "o_b": jnp.zeros(inner, dtype)},
                        "norm2": norm(inner),
                        "attn2": {"q_w": n(inner, inner), "k_w": n(ctx, inner),
                                  "v_w": n(ctx, inner), "o_w": n(inner, inner),
                                  "o_b": jnp.zeros(inner, dtype)},
                        "norm3": norm(inner),
                        "geglu_w": n(inner, 8 * inner),
                        "geglu_b": jnp.zeros(8 * inner, dtype),
                        "ff_w": n(4 * inner, inner), "ff_b": jnp.zeros(inner, dtype)}

            blocks.append({"norm": norm(ch), "proj_in_w": n(ch, inner),
                           "proj_in_b": jnp.zeros(inner, dtype),
                           "transformer_blocks": [tb() for _ in range(depth)],
                           "proj_out_w": n(inner, ch),
                           "proj_out_b": jnp.zeros(ch, dtype)})
        elif kind in ("down", "up"):
            blocks.append({"conv": conv(spec[1], spec[1])})
        else:
            blocks.append({})
    return {"time_w1": n(model_dim, time_dim), "time_b1": jnp.zeros(time_dim, dtype),
            "time_w2": n(time_dim, time_dim), "time_b2": jnp.zeros(time_dim, dtype),
            "conv_in": conv(in_channels, model_dim),
            "blocks": blocks,
            "conv_norm_out": norm(model_dim),
            "conv_out": conv(model_dim, in_channels)}


# ---------------------------------------------------------------------------
# civitai / LDM checkpoint converter (algorithmic)
# ---------------------------------------------------------------------------


def _ldm_prefixes(plan: Sequence[BlockSpec]) -> List[str]:
    """Derive the LDM (`model.diffusion_model.*`) module prefix for every
    non-push/pop entry of a block plan. The correspondence is structural:
    each "push" closes one `input_blocks.{i}`, the stretch between the last
    push and the first pop is `middle_block`, and each "pop" opens one
    `output_blocks.{i}` (an "up" stays inside the current output block).
    Works for any plan of this family, not just SD-1.5 (the reference instead
    ships a literal ~700-entry rename table: sd_unet.py:412+ from_civitai)."""
    first_pop = next(i for i, s in enumerate(plan) if s[0] == "pop")
    last_push = max(i for i, s in enumerate(plan) if s[0] == "push")
    prefixes: List[str] = []
    in_i, j = 1, 0
    for spec in plan[:last_push + 1]:
        if spec[0] == "push":
            in_i += 1
            j = 0
        else:
            prefixes.append(f"input_blocks.{in_i}.{j}")
            j += 1
    for j, spec in enumerate(plan[last_push + 1:first_pop]):
        prefixes.append(f"middle_block.{j}")
    out_i, j = -1, 0
    for spec in plan[first_pop:]:
        if spec[0] == "pop":
            out_i += 1
            j = 0
        else:
            prefixes.append(f"output_blocks.{out_i}.{j}")
            j += 1
    return prefixes


def sd_unet_params_from_civitai(sd, plan: Sequence[BlockSpec] = SD15_PLAN) -> Dict:
    """Convert an LDM/civitai SD checkpoint (`model.diffusion_model.*`,
    in_layers/emb_layers/out_layers resblocks, SpatialTransformer with 1x1
    conv proj_in/proj_out) directly — no intermediate rename pass."""
    pre0 = "model.diffusion_model."
    if not any(k.startswith(pre0) for k in sd):
        pre0 = ""
    g = lambda k: np.asarray(sd[pre0 + k])

    def norm(p):
        return {"scale": g(p + ".weight"), "bias": g(p + ".bias")}

    def conv(p):
        return {"w": np.ascontiguousarray(
            np.transpose(g(p + ".weight"), (2, 3, 1, 0))),
            "b": g(p + ".bias")}

    def lin1x1(p):
        # SpatialTransformer proj convs are (O, I, 1, 1); as a linear: (I, O)
        return np.squeeze(g(p + ".weight"), (2, 3)).T

    prefixes = iter(_ldm_prefixes(plan))
    blocks = []
    for spec in plan:
        kind = spec[0]
        if kind in ("push", "pop"):
            blocks.append({})
            continue
        base = next(prefixes)
        num_transformer_layers = spec[5] if kind == "attn" and len(spec) > 5 else 1
        if kind == "res":
            p = {"norm1": norm(base + ".in_layers.0"),
                 "conv1": conv(base + ".in_layers.2"),
                 "temb_w": g(base + ".emb_layers.1.weight").T,
                 "temb_b": g(base + ".emb_layers.1.bias"),
                 "norm2": norm(base + ".out_layers.0"),
                 "conv2": conv(base + ".out_layers.3")}
            if pre0 + base + ".skip_connection.weight" in sd:
                p["shortcut"] = conv(base + ".skip_connection")
            blocks.append(p)
        elif kind == "attn":
            tbs = []
            for j in range(num_transformer_layers):
                tp = f"{base}.transformer_blocks.{j}"
                attn = lambda a: {
                    "q_w": g(f"{tp}.{a}.to_q.weight").T,
                    "k_w": g(f"{tp}.{a}.to_k.weight").T,
                    "v_w": g(f"{tp}.{a}.to_v.weight").T,
                    "o_w": g(f"{tp}.{a}.to_out.0.weight").T,
                    "o_b": g(f"{tp}.{a}.to_out.0.bias"),
                }
                tbs.append({
                    "norm1": norm(tp + ".norm1"), "attn1": attn("attn1"),
                    "norm2": norm(tp + ".norm2"), "attn2": attn("attn2"),
                    "norm3": norm(tp + ".norm3"),
                    "geglu_w": g(tp + ".ff.net.0.proj.weight").T,
                    "geglu_b": g(tp + ".ff.net.0.proj.bias"),
                    "ff_w": g(tp + ".ff.net.2.weight").T,
                    "ff_b": g(tp + ".ff.net.2.bias"),
                })
            blocks.append({
                "norm": norm(base + ".norm"),
                "proj_in_w": lin1x1(base + ".proj_in"),
                "proj_in_b": g(base + ".proj_in.bias"),
                "transformer_blocks": tbs,
                "proj_out_w": lin1x1(base + ".proj_out"),
                "proj_out_b": g(base + ".proj_out.bias"),
            })
        elif kind == "down":
            blocks.append({"conv": conv(base + ".op")})
        elif kind == "up":
            blocks.append({"conv": conv(base + ".conv")})
    return {
        "time_w1": g("time_embed.0.weight").T, "time_b1": g("time_embed.0.bias"),
        "time_w2": g("time_embed.2.weight").T, "time_b2": g("time_embed.2.bias"),
        "conv_in": conv("input_blocks.0.0"),
        "blocks": blocks,
        "conv_norm_out": norm("out.0"),
        "conv_out": conv("out.2"),
    }
