"""IP-Adapter (image-prompt) modules for SD / SDXL / Flux.

Reference behavior (/root/reference/diffsynth/models/sd_ipadapter.py,
sdxl_ipadapter.py, flux_ipadapter.py):
- image_proj: linear(clip_embed -> tokens*ctx) + LayerNorm -> (B*tokens, ctx)
  image prompt tokens (sdxl_ipadapter.py:17-28); Flux uses a 2-layer GELU MLP
  (flux_ipadapter.py:7-25).
- one (to_k_ip, to_v_ip) linear pair per cross-attention transformer unit;
  during attention the SAME query also attends over these image K/V and the
  result is added (scaled) to the text-attention output BEFORE the output
  projection (attention.py:29-56).
- checkpoint module order follows the reference UNet block id sort: all
  down-block units, then all up-block units, then the mid-block unit(s)
  (sd_ipadapter.py:27, sdxl_ipadapter.py:52-65).

Here the UNets are block plans, so the wiring is a mapping
{plan_index: [per-depth {"k","v","scale"}]} consumed by sd_unet_apply /
sdxl_unet_apply.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Plan schedule: which attn units exist, in checkpoint module order
# ---------------------------------------------------------------------------

def attn_unit_schedule(plan: Sequence[Tuple]) -> List[Tuple[int, int]]:
    """Enumerate cross-attn transformer units of a block plan in the
    reference's checkpoint order: down units, up units, then mid units.

    Returns [(plan_index, depth_index), ...]; position in the list is the
    adapter module id (reference sd_ipadapter.py:27 block_ids — mid last)."""
    first_pop = next(i for i, s in enumerate(plan) if s[0] == "pop")
    last_push = max(i for i, s in enumerate(plan) if s[0] == "push")
    downs, mids, ups = [], [], []
    for i, spec in enumerate(plan):
        if spec[0] != "attn":
            continue
        depth = spec[5] if len(spec) > 5 else 1
        units = [(i, d) for d in range(depth)]
        if i < last_push:
            downs += units
        elif i < first_pop:
            mids += units
        else:
            ups += units
    return downs + ups + mids


def ip_plan_assignments(plan: Sequence[Tuple],
                        module_ids: Sequence[int] = None) -> Dict[int, Dict[int, int]]:
    """{plan_index: {depth_index: module_id}} for the selected module ids
    (all by default; pass a subset for SDXL set_less_adapter —
    sdxl_ipadapter.py:67-81 keeps ids 34..43)."""
    sched = attn_unit_schedule(plan)
    keep = set(range(len(sched))) if module_ids is None else set(module_ids)
    out: Dict[int, Dict[int, int]] = {}
    for j, (pi, di) in enumerate(sched):
        if j in keep:
            out.setdefault(pi, {})[di] = j
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def ip_image_proj_apply(p: Dict, image_embeds: jnp.ndarray) -> jnp.ndarray:
    """(B, clip_dim) -> (1, B*tokens, ctx_dim) image prompt tokens
    (sdxl_ipadapter.py:25-28, batch folded into tokens :85)."""
    x = image_embeds @ p["proj"]["w"] + p["proj"]["b"]
    ctx = p["norm"]["scale"].shape[0]
    x = x.reshape(-1, ctx)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    x = x * p["norm"]["scale"] + p["norm"]["bias"]
    return x[None]


def flux_ip_image_proj_apply(p: Dict, image_embeds: jnp.ndarray) -> jnp.ndarray:
    """Flux MLPProjModel: linear-GELU-linear then LayerNorm
    (flux_ipadapter.py:14-25)."""
    x = image_embeds @ p["proj0"]["w"] + p["proj0"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["proj2"]["w"] + p["proj2"]["b"]
    ctx = p["norm"]["scale"].shape[0]
    x = x.reshape(-1, ctx)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return (x * p["norm"]["scale"] + p["norm"]["bias"])[None]


def ip_adapter_apply(params: Dict, image_embeds: jnp.ndarray,
                     scale: float = 1.0) -> List[Dict]:
    """Project the image embedding and emit per-module image K/V:
    [{"k": (1, T, out), "v": (1, T, out), "scale": s}, ...] in checkpoint
    module order (sd_ipadapter.py:34-48)."""
    tokens = ip_image_proj_apply(params["image_proj"], image_embeds)
    out = []
    for m in params["modules"]:
        out.append({"k": tokens @ m["k_w"], "v": tokens @ m["v_w"],
                    "scale": scale})
    return out


def ipadapter_kwargs_for_plan(plan: Sequence[Tuple], params: Dict,
                              image_embeds: jnp.ndarray, scale: float = 1.0,
                              module_ids: Sequence[int] = None) -> Dict:
    """End-to-end: {plan_index: {depth: {"k","v","scale"}}} ready for
    sd_unet_apply(..., ipadapter=...)."""
    kvs = ip_adapter_apply(params, image_embeds, scale)
    assign = ip_plan_assignments(plan, module_ids)
    return {pi: {di: kvs[j] for di, j in dm.items()}
            for pi, dm in assign.items()}


def sdxl_less_adapter_ids(plan: Sequence[Tuple]) -> List[int]:
    """Reference set_less_adapter keeps one up-block's worth of modules:
    checkpoint ids 34..43 for the full SDXL plan (sdxl_ipadapter.py:81).
    Generalized: the second up-level attn block's units."""
    return list(range(34, 44))


# ---------------------------------------------------------------------------
# Converters
# ---------------------------------------------------------------------------

def ip_adapter_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """Consume the reference's converted layout (ipadapter_modules.N.to_k_ip /
    image_proj.*) or the raw diffusers two-dict layout
    (sdxl_ipadapter.py:108-118)."""
    if "ip_adapter" in sd:  # raw diffusers bundle
        flat = {}
        for name, w in sd["ip_adapter"].items():
            parts = name.split(".")
            flat[f"ipadapter_modules.{int(parts[0]) // 2}." + ".".join(parts[1:])] = w
        for name, w in sd["image_proj"].items():
            flat["image_proj." + name] = w
        sd = flat
    g = lambda k: jnp.asarray(np.asarray(sd[k]))
    n = 0
    while f"ipadapter_modules.{n}.to_k_ip.weight" in sd:
        n += 1
    modules = [{"k_w": g(f"ipadapter_modules.{i}.to_k_ip.weight").T,
                "v_w": g(f"ipadapter_modules.{i}.to_v_ip.weight").T}
               for i in range(n)]
    return {
        "modules": modules,
        "image_proj": {
            "proj": {"w": g("image_proj.proj.weight").T,
                     "b": g("image_proj.proj.bias")},
            "norm": {"scale": g("image_proj.norm.weight"),
                     "bias": g("image_proj.norm.bias")},
        },
    }


def init_ip_adapter(key, plan: Sequence[Tuple], ctx_dim: int, clip_dim: int,
                    tokens: int = 4, dtype=jnp.float32) -> Dict:
    """Random init sized to a block plan (for tests / tiny pipelines)."""
    sched = attn_unit_schedule(plan)
    ks = jax.random.split(key, len(sched) + 1)
    modules = []
    for k, (pi, di) in zip(ks, sched):
        out_dim = plan[pi][3]  # attn spec: (attn, heads, head_dim, dim, ctx, depth)
        k1, k2 = jax.random.split(k)
        modules.append({
            "k_w": jax.random.normal(k1, (ctx_dim, out_dim), dtype) * 0.02,
            "v_w": jax.random.normal(k2, (ctx_dim, out_dim), dtype) * 0.02,
        })
    return {
        "modules": modules,
        "image_proj": {
            "proj": {"w": jax.random.normal(ks[-1], (clip_dim, tokens * ctx_dim),
                                            dtype) * 0.02,
                     "b": jnp.zeros((tokens * ctx_dim,), dtype)},
            "norm": {"scale": jnp.ones((ctx_dim,), dtype),
                     "bias": jnp.zeros((ctx_dim,), dtype)},
        },
    }
