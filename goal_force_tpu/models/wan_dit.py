"""Wan video DiT as pure functions over a param pytree.

Architecture parity with /root/reference/diffsynth/models/wan_video_dit.py:100-411
(DiTBlock :196-230, SelfAttention :124-147, CrossAttention :150-186, Head :253-269,
patchify/unpatchify :341-356), rebuilt TPU-first:

- channels-last (B, F, H, W, C) latents; patchify is a reshape+matmul (the reference's
  Conv3d with kernel==stride collapses to a linear over flattened patches) — pure MXU work.
- the 40 blocks are *stacked* along a leading layer axis and driven by lax.scan: one block
  compiles once, params stream layer-by-layer, remat wraps the scan body for training.
- RoPE from precomputed f32 cos/sin tables (see ops/rope.py); norm statistics in f32.

Param tree (leaf layouts chosen for jnp compute; torch converters in io/torch_convert.py):
  patch_embedding: {w: (C_in*prod(patch), D), b: (D,)}
  text_embedding:  {fc0: {w,b}, fc2: {w,b}}
  time_embedding:  {fc0: {w,b}, fc2: {w,b}}
  time_projection: {w: (D, 6D), b: (6D,)}
  blocks: every leaf stacked with leading dim num_layers:
    self_attn/cross_attn: {q,k,v,o: {w,b}, norm_q: {w}, norm_k: {w}}
    norm3: {w,b}; ffn: {fc0: {w,b}, fc2: {w,b}}; modulation: (L, 6, D)
  head: {w: (D, out*prod(patch)), b, modulation: (2, D)}
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import WanDiTConfig
from goal_force_tpu.ops.attention import attention
from goal_force_tpu.ops.rope import apply_rope
from goal_force_tpu.parallel.mesh import constrain


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------

def linear(p, x):
    if "w_i8" in p:
        # weight-only int8 pack from ops/quant.quantize_linear_tree — W8A8 on
        # the MXU (the v5e-native analog of the reference's fp8 linear path)
        from goal_force_tpu.ops.quant import int8_linear

        return int8_linear(p, x, p.get("b"))
    if "w_f8" in p:
        # e4m3 scaled-mm pack (ops/quant.quantize_linear_tree_fp8) — the
        # literal torch._scaled_mm analog, native on v5p+
        from goal_force_tpu.ops.quant import fp8_linear

        return fp8_linear(p, x, p.get("b"))
    return jnp.matmul(x, p["w"]) + p["b"]


def rms_norm(x, w, eps: float = 1e-6):
    """Reference RMSNorm (:100-111): normalize in f32, cast to x.dtype, then * weight."""
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return n.astype(x.dtype) * w


def layer_norm(x, eps: float = 1e-6, w=None, b=None):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if w is not None:
        out = out * w + b
    return out


def gelu_tanh(x):
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


def sinusoidal_embedding(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """cos||sin table (reference :68-72; f64 there, f32 here — positions <= 1000)."""
    pos = position.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(dim // 2, dtype=jnp.float32) / (dim // 2))
    sinusoid = jnp.outer(pos, freqs)
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


# ---------------------------------------------------------------------------
# Patchify (Conv3d kernel==stride == matmul over flattened patches)
# ---------------------------------------------------------------------------

def patchify(p, x, patch_size: Tuple[int, int, int]):
    """x: (B, F, H, W, C) -> tokens (B, F*h*w, D), grid (F, h, w).

    Patch feature order is (c, dy, dx) to match the reference Conv3d weight layout
    (D, C, pf, ph, pw) (:307-308) — the converter reshapes accordingly.
    """
    pf, ph, pw = patch_size
    b, f, hh, ww, c = x.shape
    fo, ho, wo = f // pf, hh // ph, ww // pw
    x = x.reshape(b, fo, pf, ho, ph, wo, pw, c)
    # -> (b, fo, ho, wo, c, pf, ph, pw)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(b, fo * ho * wo, c * pf * ph * pw)
    return linear(p, x), (fo, ho, wo)


def unpatchify(x, grid: Tuple[int, int, int], patch_size: Tuple[int, int, int], out_dim: int):
    """(B, S, prod(patch)*out_dim) -> (B, F, H, W, C); feature order (pf, ph, pw, c)
    matching the reference rearrange '(x y z c)' (:351-356)."""
    pf, ph, pw = patch_size
    b = x.shape[0]
    f, h, w = grid
    x = x.reshape(b, f, h, w, pf, ph, pw, out_dim)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, f * pf, h * ph, w * pw, out_dim)


# ---------------------------------------------------------------------------
# DiT block
# ---------------------------------------------------------------------------

def self_attention(p, x, cos, sin, num_heads: int, eps: float, attn_impl: str = "auto",
                   bounded: bool = False):
    """Tokens arrive sp-sharded; q/k/v are resharded to head-parallel over ("sp","tp") —
    GSPMD inserts the Ulysses all-to-alls the reference did by hand via xfuser."""
    b, s, d = x.shape
    q = rms_norm(linear(p["q"], x), p["norm_q"]["w"], eps).reshape(b, s, num_heads, -1)
    k = rms_norm(linear(p["k"], x), p["norm_k"]["w"], eps).reshape(b, s, num_heads, -1)
    v = linear(p["v"], x).reshape(b, s, num_heads, -1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    # Ulysses re-layout, axis-aligned so GSPMD lowers it to ONE all-to-all:
    # tokens arrive sp-sharded; heads take over the SAME sp axis (seq<->head
    # swap on matching device groups) while tp shards head_dim. Sharding heads
    # over the combined ("sp","tp") axes instead needs a device-order transpose
    # GSPMD cannot express — the involuntary-full-rematerialization warnings
    # the round-2 dryrun was full of.
    q = constrain(q, "dp", None, "sp", "tp")
    k = constrain(k, "dp", None, "sp", "tp")
    v = constrain(v, "dp", None, "sp", "tp")
    out = attention(q, k, v, impl=attn_impl, bounded=bounded)
    # keep the HEAD sharding through the o-projection: contract (n, h) directly
    # against the head-reshaped o weight — one einsum + all-reduce GSPMD
    # expresses natively (merging heads first forces another 4D reshard).
    out = constrain(out, "dp", None, "sp", "tp")
    from goal_force_tpu.parallel.mesh import current_mesh

    if current_mesh() is None or "w_i8" in p["o"]:
        # single chip (or int8 pack): the flat (b, s, d) @ (d, d) matmul is
        # the fastest MXU lowering (the per-head einsum measured +8%/block)
        return linear(p["o"], out.reshape(b, s, d))
    ow = p["o"]["w"].reshape(num_heads, -1, d)
    # align the weight with the activation layout (n over sp, h over tp) so the
    # contraction lowers to a local matmul + psum over (sp, tp)
    ow = constrain(ow, "sp", "tp", None)
    out = jnp.einsum("bsnh,nhd->bsd", out, ow.astype(out.dtype)) + p["o"]["b"]
    return constrain(out, "dp", "sp", None)


def cross_attention(p, x, context, num_heads: int, eps: float, attn_impl: str = "auto",
                    num_img_tokens: int = 0, bounded: bool = False):
    """Text cross-attention; with num_img_tokens > 0 the first tokens of `context` are
    CLIP image tokens attended through separate k_img/v_img projections and ADDED
    (reference CrossAttention has_image_input :171-186)."""
    b, s, d = x.shape
    if num_img_tokens:
        img, ctx = context[:, :num_img_tokens], context[:, num_img_tokens:]
    else:
        ctx = context
    t = ctx.shape[1]
    q = rms_norm(linear(p["q"], x), p["norm_q"]["w"], eps).reshape(b, s, num_heads, -1)
    k = rms_norm(linear(p["k"], ctx), p["norm_k"]["w"], eps).reshape(b, t, num_heads, -1)
    v = linear(p["v"], ctx).reshape(b, t, num_heads, -1)
    # text KV is tiny (512 tokens): keep q token-sharded, replicate KV — no
    # collective. The explicit constraints keep the BACKWARD shardings
    # consistent too (un-pinned, the kv-grad einsums mix token- and
    # head-sharded layouts and trip involuntary rematerializations).
    q = constrain(q, "dp", "sp", None, None)
    k = constrain(k, "dp", None, None, None)
    v = constrain(v, "dp", None, None, None)
    out = attention(q, k, v, impl=attn_impl, bounded=bounded)
    out = constrain(out, "dp", "sp", None, None).reshape(b, s, d)
    if num_img_tokens:
        ti = img.shape[1]
        k_img = rms_norm(linear(p["k_img"], img), p["norm_k_img"]["w"], eps).reshape(
            b, ti, num_heads, -1)
        v_img = linear(p["v_img"], img).reshape(b, ti, num_heads, -1)
        out = out + attention(q, k_img, v_img, impl=attn_impl,
                              bounded=bounded).reshape(b, s, d)
    return linear(p["o"], out)


def dit_block(p, x, context, t_mod, cos, sin, cfg: WanDiTConfig, attn_impl: str = "auto",
              num_img_tokens: int = 0):
    """One DiT block (reference DiTBlock.forward :214-230). t_mod: (B, 6, D)."""
    mod = p["modulation"].astype(t_mod.dtype)[None] + t_mod  # (B, 6, D)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
        mod[:, i][:, None, :] for i in range(6)
    )
    h = layer_norm(x, cfg.eps) * (1 + scale_msa) + shift_msa
    x = x + gate_msa * self_attention(p["self_attn"], h, cos, sin, cfg.num_heads,
                                      cfg.eps, attn_impl, bounded=cfg.qk_bounded)
    x = x + cross_attention(
        p["cross_attn"], layer_norm(x, cfg.eps, p["norm3"]["w"], p["norm3"]["b"]),
        context, cfg.num_heads, cfg.eps, attn_impl, num_img_tokens=num_img_tokens,
        bounded=cfg.qk_bounded,
    )
    h = layer_norm(x, cfg.eps) * (1 + scale_mlp) + shift_mlp
    h = linear(p["ffn"]["fc2"], gelu_tanh(linear(p["ffn"]["fc0"], h)))
    return x + gate_mlp * h


# injection gating mode for run_blocks ("cond" | "where") — module-level so
# on-chip experiments can A/B it without signature churn. Min-of-3 timing at
# A14B geometry shows the two are EQUIVALENT at depth >= 4 (the apparent
# cond/where deltas were first-call warmup noise); "where" stays the default
# as the simpler, branch-free form.
INJECTION_GATE = "where"


def run_blocks(
    blocks,
    x,
    context,
    t_mod,
    cos,
    sin,
    cfg: WanDiTConfig,
    injections: Optional[jnp.ndarray] = None,
    collect: bool = False,
    remat: bool = False,
    attn_impl: str = "auto",
    num_img_tokens: int = 0,
):
    """Scan x through stacked blocks.

    injections: optional (n_inj, B, S, D) residuals added after blocks 0..n_inj-1 —
    the ControlNet zero-conv outputs (reference injection loop at
    /root/reference/src/goal_force/wan_video_new.py:1559-1570).
    collect: return per-block outputs (the ControlNet side-stack collects its states).
    """

    n_inj = 0 if injections is None else injections.shape[0]

    def body(carry, layer):
        x_in, i = carry
        p, _ = layer
        x_in = constrain(x_in, "dp", "sp", None)
        out = dit_block(p, x_in, context, t_mod, cos, sin, cfg, attn_impl,
                        num_img_tokens=num_img_tokens)
        if injections is not None:
            # One scan over ALL layers; layers beyond the injection count add
            # nothing. (Slicing the stacked params into per-segment scans
            # materializes full copies of the weight stack in HBM — measured
            # 0.9 GB per slice at A14B.) "cond" gates the injection READ with
            # lax.cond (skips 0.67 GB dead fetches on the 30 non-injected
            # layers); "where" is the branch-free round-2 form — toggled for
            # on-chip A/B measurement.
            if INJECTION_GATE == "cond":
                def _add(o):
                    idx = jnp.minimum(i, n_inj - 1)
                    inj = jax.lax.dynamic_index_in_dim(injections, idx,
                                                       keepdims=False)
                    return o + inj.astype(o.dtype)

                out = jax.lax.cond(i < n_inj, _add, lambda o: o, out)
            else:
                idx = jnp.minimum(i, n_inj - 1)
                inj = jax.lax.dynamic_index_in_dim(injections, idx, keepdims=False)
                out = out + jnp.where(i < n_inj, 1.0, 0.0).astype(out.dtype) \
                    * inj.astype(out.dtype)
        return (out, i + 1), (out if collect else None)

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)

    (x, _), ys = jax.lax.scan(body, (x, jnp.zeros((), jnp.int32)), (blocks, None))
    return x, ys


def pp_run_blocks(
    blocks,
    x: jnp.ndarray,                  # (B, S, D), B = n_micro * microbatch
    context: jnp.ndarray,            # (B, L_txt, D)
    t_mod: jnp.ndarray,              # (B, 6, D)
    cos, sin,
    cfg: WanDiTConfig,
    *,
    n_micro: int,
    injections: Optional[jnp.ndarray] = None,   # (n_inj, B, S, D)
    remat: bool = False,
    attn_impl: str = "auto",
    num_img_tokens: int = 0,
):
    """GPipe-schedule pipeline-parallel block trunk over the mesh "pp" axis.

    The reference has no pipeline parallelism (its scaling axes are DDP + USP,
    /root/reference/src/goal_force/wan_video_new.py:460-463); this exceeds it the
    GSPMD-native way rather than with hand-written send/recv: the layer stack is
    reshaped stage-major (pp, L/pp, ...) and sharded over "pp", a vmap with
    spmd_axis_name="pp" runs every stage in parallel on its own slot of a
    stage-major activation buffer, and jnp.roll on the stage axis (XLA emits a
    collective-permute) hands each stage's output to its successor. Microbatches
    enter at slot 0 and drain from slot pp-1; a batch of B = n_micro * mb takes
    n_micro + pp - 1 ticks (pipeline bubble (pp-1)/(n_micro+pp-1)).

    Per-microbatch conditioning (context, t_mod, ControlNet injections) rides the
    rolled buffer alongside the activations so each stage always sees the
    conditioning of the microbatch it is processing. Fully differentiable: the
    tick loop is a lax.scan, roll/dynamic-update transpose cleanly, and remat
    checkpoints each stage body exactly like the plain run_blocks scan.
    """
    from goal_force_tpu.parallel import constrain, current_mesh

    mesh = current_mesh()
    if mesh is None or "pp" not in mesh.axis_names or mesh.shape["pp"] == 1:
        out, _ = run_blocks(blocks, x, context, t_mod, cos, sin, cfg,
                            injections=injections, remat=remat,
                            attn_impl=attn_impl, num_img_tokens=num_img_tokens)
        return out
    pp = mesh.shape["pp"]
    n_layers = cfg.num_layers
    if n_layers % pp != 0:
        raise ValueError(f"num_layers {n_layers} not divisible by pp {pp}")
    l_stage = n_layers // pp
    b, s, d = x.shape
    # largest microbatch count <= n_micro that divides the batch (b=1 degrades
    # to a single microbatch walking the stages — correct, just bubble-only)
    n_micro = max(1, min(n_micro, b))
    while b % n_micro:
        n_micro -= 1
    mb = b // n_micro
    n_inj = 0 if injections is None else injections.shape[0]

    # Stage-major stacked params (pp, L/pp, ...), stage axis pinned to "pp":
    # each stage group holds only its own L/pp layers' weights. Other dims stay
    # UNCONSTRAINED so an FSDP placement (parallel/sharding.py pins the layer
    # axis to "pp" on pipeline meshes) flows through without resharding.
    U = jax.sharding.PartitionSpec.UNCONSTRAINED

    def stage_major(t_):
        t_ = t_.reshape((pp, l_stage) + t_.shape[1:])
        spec = jax.sharding.PartitionSpec("pp", *([U] * (t_.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            t_, jax.sharding.NamedSharding(mesh, spec))

    blocks_st = jax.tree_util.tree_map(stage_major, blocks)

    # RoPE tables are closed over by the manually-partitioned (spmd_axis_name)
    # stage vmap; pin them replicated so the partitioner's fake parameters for
    # them don't inherit an unreachable layout (they're S x head_dim — tiny).
    cos = constrain(cos, *([None] * cos.ndim))
    sin = constrain(sin, *([None] * sin.ndim))

    # Normalize the incoming layouts (x0/y/context arrive carrying VAE/T5
    # activation shardings): one expressible reshard here instead of
    # inexpressible ones inside the tick loop.
    x = constrain(x, "dp", "sp", None)
    context = constrain(context, "dp", None, None)
    t_mod = constrain(t_mod, "dp", None, None)
    if injections is not None:
        injections = constrain(injections, None, "dp", "sp", None)

    # Microbatch j takes the STRIDED batch rows {j, n_micro+j, ...}: the mb axis
    # then carries the dp sharding of the original batch (each dp group feeds
    # every microbatch), so the per-tick dynamic index walks an UNSHARDED axis —
    # indexing a dp-sharded axis forces a full reshard (involuntary
    # rematerialization) every tick.
    def to_mb(a):
        a = a.reshape((mb, n_micro) + a.shape[1:])
        return jnp.swapaxes(a, 0, 1)

    x_mb = to_mb(x)
    ctx_mb = to_mb(context)
    tmod_mb = to_mb(t_mod)
    inj_mb = None
    if n_inj:
        inj_mb = injections.reshape((n_inj, mb, n_micro, s, d)).transpose(2, 0, 1, 3, 4)

    # Buffer layout hints: slot axis on "pp", microbatch rows on "dp", tokens on
    # "sp" — keeps every tick's feed/roll/stage handoff expressible for GSPMD.
    c_x = lambda a: constrain(a, "pp", "dp", "sp", None)
    c_ctx = lambda a: constrain(a, "pp", "dp", None, None)
    c_inj = lambda a: constrain(a, "pp", None, "dp", "sp", None)

    def zbuf(mb_arr):
        return jnp.zeros((pp,) + mb_arr.shape[1:], mb_arr.dtype)

    # Inside the manually partitioned stage vmap the flash kernel's shard_map
    # dispatch cannot apply (shard_map under vmap(spmd_axis_name)); the XLA
    # attention partitions correctly under the pp schedule. The ControlNet
    # side-stack and any non-pp caller keep the Pallas path.
    stage_attn = "xla" if attn_impl in ("auto", "pallas", "pallas_int8") else attn_impl

    def stage_apply(stage, blk, xs, cs, ts, js):
        def body(carry, layer):
            h, i = carry
            h = constrain(h, "dp", "sp", None)
            out = dit_block(layer, h, cs, ts, cos, sin, cfg, stage_attn,
                            num_img_tokens=num_img_tokens)
            if n_inj:
                g = stage * l_stage + i          # global layer index
                idx = jnp.minimum(g, n_inj - 1)
                inj = jax.lax.dynamic_index_in_dim(js, idx, keepdims=False)
                out = out + jnp.where(g < n_inj, 1.0, 0.0).astype(out.dtype) \
                    * inj.astype(out.dtype)
            return (out, i + 1), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (h, _), _ = jax.lax.scan(body, (xs, jnp.zeros((), jnp.int32)), blk)
        return h

    # spmd_axis_name pins the mapped (stage) axis of every internal sharding
    # constraint to "pp" — GSPMD partitions the stage computations across the
    # pp groups instead of replicating them.
    vstage = jax.vmap(stage_apply, in_axes=(0, 0, 0, 0, 0, 0 if n_inj else None),
                      spmd_axis_name="pp")
    stages = jnp.arange(pp, dtype=jnp.int32)

    def tick(carry, t):
        buf, ctxb, tmodb, injb, outs = carry
        feeding = t < n_micro
        src = jnp.minimum(t, n_micro - 1)

        def feed(slot_buf, mb_arr):
            v = jnp.where(feeding, mb_arr[src], slot_buf[0])
            return slot_buf.at[0].set(v)

        buf = c_x(feed(buf, x_mb))
        ctxb = c_ctx(feed(ctxb, ctx_mb))
        tmodb = c_ctx(feed(tmodb, tmod_mb))
        if n_inj:
            injb = c_inj(feed(injb, inj_mb))
        out = vstage(stages, blocks_st, buf, ctxb, tmodb, injb)
        dst = jnp.clip(t - (pp - 1), 0, n_micro - 1)
        outs = outs.at[dst].set(jnp.where(t >= pp - 1, out[pp - 1], outs[dst]))
        roll = lambda a: jnp.roll(a, 1, axis=0)
        return (c_x(roll(out)), c_ctx(roll(ctxb)), c_ctx(roll(tmodb)),
                c_inj(roll(injb)) if n_inj else None,
                constrain(outs, None, "dp", "sp", None)), None

    carry0 = (zbuf(x_mb), zbuf(ctx_mb), zbuf(tmod_mb),
              zbuf(inj_mb) if n_inj else None, jnp.zeros_like(x_mb))
    ticks = jnp.arange(n_micro + pp - 1, dtype=jnp.int32)
    (_, _, _, _, outs), _ = jax.lax.scan(tick, carry0, ticks)
    return jnp.swapaxes(outs, 0, 1).reshape(b, s, d)


def head(p, x, t, eps: float = 1e-6):
    """Final projection with 2-way modulation (reference Head :253-269). t: (B, D)."""
    mod = p["modulation"].astype(t.dtype)[None] + t[:, None, :]  # (B, 2, D)
    shift, scale = mod[:, 0][:, None, :], mod[:, 1][:, None, :]
    return jnp.matmul(layer_norm(x, eps) * (1 + scale) + shift, p["w"]) + p["b"]


def time_embed(params, cfg: WanDiTConfig, timestep: jnp.ndarray, dtype=None):
    """timestep (B,) -> t (B, D), t_mod (B, 6, D) (reference :368-370)."""
    emb = sinusoidal_embedding(cfg.freq_dim, timestep)
    if dtype is not None:
        emb = emb.astype(dtype)
    else:
        emb = emb.astype(params["time_embedding"]["fc0"]["w"].dtype)
    t = linear(params["time_embedding"]["fc0"], emb)
    t = linear(params["time_embedding"]["fc2"], jax.nn.silu(t.astype(jnp.float32)).astype(t.dtype))
    t_mod = linear(params["time_projection"], jax.nn.silu(t.astype(jnp.float32)).astype(t.dtype))
    return t, t_mod.reshape(t.shape[0], 6, cfg.dim)


def text_embed(params, x):
    h = gelu_tanh(linear(params["text_embedding"]["fc0"], x))
    return linear(params["text_embedding"]["fc2"], h)


def gelu_erf(x):
    import math as _math

    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(xf / _math.sqrt(2.0)))).astype(x.dtype)


def img_embed(params, clip_feature):
    """CLIP tokens -> DiT context tokens (reference MLP :233-250: LN, Linear, GELU(erf),
    Linear, LN; optional learned pos emb for first-last-frame models)."""
    p = params["img_emb"]
    x = clip_feature
    if "emb_pos" in p:
        x = x + p["emb_pos"].astype(x.dtype)
    x = layer_norm(x, 1e-5, p["norm_in"]["w"], p["norm_in"]["b"])
    x = gelu_erf(linear(p["fc0"], x))
    x = linear(p["fc2"], x)
    return layer_norm(x, 1e-5, p["norm_out"]["w"], p["norm_out"]["b"])


def wan_dit_forward(
    params,
    cfg: WanDiTConfig,
    x: jnp.ndarray,
    timestep: jnp.ndarray,
    context: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    clip_feature: Optional[jnp.ndarray] = None,
    reference_latents: Optional[jnp.ndarray] = None,   # (B, h, w, 16) Fun-Reference
    camera_embedding: Optional[jnp.ndarray] = None,    # (B, S, D) camera adapter tokens
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """Full denoiser forward, base model (no ControlNet — see pipelines/model_fn.py).

    x: (B, F, H, W, 16) noisy latents; y: (B, F, H, W, 20) mask+first-frame conditioning;
    timestep: (B,); context: (B, L_txt, text_dim). Returns velocity (B, F, H, W, out_dim).
    Mirrors WanModel.forward (:358-411).
    """
    from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d

    t, t_mod = time_embed(params, cfg, timestep)
    context = text_embed(params, context)
    num_img_tokens = 0
    if clip_feature is not None and cfg.has_image_input:
        img_ctx = img_embed(params, clip_feature)
        num_img_tokens = img_ctx.shape[1]
        context = jnp.concatenate([img_ctx, context.astype(img_ctx.dtype)], axis=1)
    if y is not None:
        x = jnp.concatenate([x, y.astype(x.dtype)], axis=-1)
    tokens, grid = patchify(params["patch_embedding"], x, cfg.patch_size)
    if camera_embedding is not None:
        # camera adapter features added to the patch embedding (reference :341-349)
        tokens = tokens + camera_embedding.astype(tokens.dtype)
    n_ref = 0
    if reference_latents is not None and "ref_conv" in params:
        # Fun-Reference: 2x2-conv patch of the reference image prepended as extra tokens
        # at frame index f (reference :1467-1472); stripped again after the head.
        b_, hh_, ww_, c_ = reference_latents.shape
        r = reference_latents.reshape(b_, hh_ // 2, 2, ww_ // 2, 2, c_)
        r = r.transpose(0, 1, 3, 5, 2, 4).reshape(b_, (hh_ // 2) * (ww_ // 2), c_ * 4)
        ref_tokens = linear(params["ref_conv"], r).astype(tokens.dtype)
        n_ref = ref_tokens.shape[1]
        tokens = jnp.concatenate([ref_tokens, tokens], axis=1)
        grid_ref = (grid[0] + 1, grid[1], grid[2])
    if rope_cos is None:
        tables = rope_tables_3d(cfg.head_dim, cfg.rope_max_len)
        rope_cos, rope_sin = assemble_rope(tables, *(grid_ref if n_ref else grid))
    tokens, _ = run_blocks(
        params["blocks"], tokens, context, t_mod, rope_cos, rope_sin, cfg,
        remat=remat, attn_impl=attn_impl, num_img_tokens=num_img_tokens,
    )
    if n_ref:
        tokens = tokens[:, n_ref:]
    out = head(params["head"], tokens, t, cfg.eps)
    return unpatchify(out, grid, cfg.patch_size, cfg.out_dim)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, dtype):
    k1, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(k1, (d_in, d_out), dtype, -scale, scale),
        "b": jnp.zeros((d_out,), dtype),
    }


def _init_attn(key, dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "q": _init_linear(ks[0], dim, dim, dtype),
        "k": _init_linear(ks[1], dim, dim, dtype),
        "v": _init_linear(ks[2], dim, dim, dtype),
        "o": _init_linear(ks[3], dim, dim, dtype),
        "norm_q": {"w": jnp.ones((dim,), dtype)},
        "norm_k": {"w": jnp.ones((dim,), dtype)},
    }


def init_block(key, cfg: WanDiTConfig, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": _init_attn(ks[0], cfg.dim, dtype),
        "cross_attn": _init_attn(ks[1], cfg.dim, dtype),
        "norm3": {"w": jnp.ones((cfg.dim,), dtype), "b": jnp.zeros((cfg.dim,), dtype)},
        "ffn": {
            "fc0": _init_linear(ks[2], cfg.dim, cfg.ffn_dim, dtype),
            "fc2": _init_linear(ks[3], cfg.ffn_dim, cfg.dim, dtype),
        },
        "modulation": (jax.random.normal(ks[4], (6, cfg.dim), dtype) / cfg.dim**0.5),
    }


def init_wan_dit(key, cfg: WanDiTConfig, dtype=jnp.bfloat16):
    ks = jax.random.split(key, 8)
    patch_in = cfg.in_dim * math.prod(cfg.patch_size)
    blocks = [init_block(k, cfg, dtype) for k in jax.random.split(ks[0], cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "patch_embedding": _init_linear(ks[1], patch_in, cfg.dim, dtype),
        "text_embedding": {
            "fc0": _init_linear(ks[2], cfg.text_dim, cfg.dim, dtype),
            "fc2": _init_linear(ks[3], cfg.dim, cfg.dim, dtype),
        },
        "time_embedding": {
            "fc0": _init_linear(ks[4], cfg.freq_dim, cfg.dim, dtype),
            "fc2": _init_linear(ks[5], cfg.dim, cfg.dim, dtype),
        },
        "time_projection": _init_linear(ks[6], cfg.dim, cfg.dim * 6, dtype),
        "blocks": stacked,
        "head": {
            **_init_linear(ks[7], cfg.dim, cfg.out_dim * math.prod(cfg.patch_size), dtype),
            "modulation": jax.random.normal(ks[7], (2, cfg.dim), dtype) / cfg.dim**0.5,
        },
    }
