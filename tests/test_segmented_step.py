"""The host-staged segmented step (scripts/measure_north_star.py) computes EXACTLY the
product denoiser: splitting the 40+10-block trunk into streamed 5-block segments — CN
chunk -> its injections -> the matching DiT chunk, then the plain trunk — must equal the
monolithic `denoise_forward`. This is what makes the measured full-depth step an execution
of the real model rather than a lookalike (VERDICT r3 item 1)."""

import jax
import jax.numpy as jnp

from goal_force_tpu.configs import ControlNetConfig, WanDiTConfig
from goal_force_tpu.models import wan_dit as wd
from goal_force_tpu.models.controlnet import init_controlnet
from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d
from goal_force_tpu.pipelines.model_fn import denoise_forward

# real head_dim (the 3D RoPE channel split assumes it); tiny everywhere else
CFG = WanDiTConfig(dim=256, in_dim=36, ffn_dim=128, out_dim=16, text_dim=48,
                   freq_dim=32, num_heads=2, num_layers=8)
CN_CFG = ControlNetConfig(num_layers=4, in_channels=16)
SEG, N_DIT_SEG, N_CN_SEG = 2, 4, 2
B, F, H, W = 2, 3, 8, 12
GRID = (F, H // 2, W // 2)


def _run_segmented(dit, cn, lat2, y2, cl2, ctx_raw, ts):
    """The segmented composition (mirrors measure_north_star/measure_int8_clip
    full_step): CN chunk -> injections -> matching DiT chunk, then plain trunk."""
    small = {k: v for k, v in dit.items() if k != "blocks"}
    cos, sin = assemble_rope(rope_tables_3d(CFG.head_dim, CFG.rope_max_len), *GRID)
    sl = lambda tr, a, b: jax.tree_util.tree_map(lambda x: x[a:b], tr)
    dit_segs = [sl(dit["blocks"], i * SEG, (i + 1) * SEG) for i in range(N_DIT_SEG)]
    cn_segs = [{"blocks": sl(cn["blocks"], i * SEG, (i + 1) * SEG),
                "zc_w": cn["zero_convs"]["w"][i * SEG:(i + 1) * SEG],
                "zc_b": cn["zero_convs"]["b"][i * SEG:(i + 1) * SEG]}
               for i in range(N_CN_SEG)]

    t, t_mod = wd.time_embed(small, CFG, ts)
    ctx = wd.text_embed(small, ctx_raw)
    x = jnp.concatenate([lat2, y2], axis=-1)
    tokens, _ = wd.patchify(small["patch_embedding"], x, CFG.patch_size)
    c_tok, _ = wd.patchify(cn["patch_embedding"], cl2, CFG.patch_size)

    def cn_seg_fn(seg, c, ctx, t_mod):
        def body(c, layer):
            p_blk, zw, zb = layer
            c = wd.dit_block(p_blk, c, ctx, t_mod, cos, sin, CFG, "xla")
            return c, jnp.matmul(c, zw.astype(c.dtype)) + zb.astype(c.dtype)
        return jax.lax.scan(body, c, (seg["blocks"], seg["zc_w"], seg["zc_b"]))

    for k in range(N_CN_SEG):
        c_tok, inj = cn_seg_fn(cn_segs[k], c_tok, ctx, t_mod)
        tokens, _ = wd.run_blocks(dit_segs[k], tokens, ctx, t_mod, cos, sin, CFG,
                                  injections=inj, attn_impl="xla")
    for k in range(N_CN_SEG, N_DIT_SEG):
        tokens, _ = wd.run_blocks(dit_segs[k], tokens, ctx, t_mod, cos, sin, CFG,
                                  attn_impl="xla")
    return wd.unpatchify(wd.head(small["head"], tokens, t, CFG.eps),
                         GRID, CFG.patch_size, CFG.out_dim)


def _inputs(key):
    kk = jax.random.split(key, 4)
    lat2 = jnp.tile(jax.random.normal(kk[0], (1, F, H, W, 16)), (B, 1, 1, 1, 1))
    y2 = jax.random.normal(kk[1], (B, F, H, W, 20))
    cl2 = jax.random.normal(kk[2], (B, F, H, W, 16))
    ctx_raw = jax.random.normal(kk[3], (B, 16, CFG.text_dim))
    ts = jnp.full((B,), 900.0, jnp.float32)
    return lat2, y2, cl2, ctx_raw, ts


def _model(key):
    dit = wd.init_wan_dit(key, CFG, jnp.float32)
    cn = init_controlnet(jax.random.PRNGKey(1), CFG, CN_CFG, jnp.float32)
    # non-zero zero-convs so the injections actually participate
    cn["zero_convs"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(2), cn["zero_convs"]["w"].shape)
    cn["zero_convs"]["b"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), cn["zero_convs"]["b"].shape)
    return dit, cn


def test_segmented_step_matches_monolithic():
    dit, cn = _model(jax.random.PRNGKey(0))
    lat2, y2, cl2, ctx_raw, ts = _inputs(jax.random.PRNGKey(0))

    ref = denoise_forward(dit, CFG, lat2, ts, ctx_raw, y=y2,
                          controlnet_params=cn, controlnet_cfg=CN_CFG,
                          control_latents=cl2, attn_impl="xla")
    out = _run_segmented(dit, cn, lat2, y2, cl2, ctx_raw, ts)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4


def test_int8_segmented_step_matches_monolithic_int8():
    """The W8A8 streaming step (scripts/measure_int8_{step,clip}.py) quantizes the
    block-stack linears with quantize_linear_tree and streams them in segments; the
    segmented int8 composition must equal the SAME quantized model run monolithically,
    so the measured 22.3 s step is an execution of the quantized denoiser, not a
    lookalike. (Quantization error vs f32 is bounded separately in test_quant.py.)"""
    from goal_force_tpu.ops.quant import quantize_linear_tree

    dit, cn = _model(jax.random.PRNGKey(0))
    qpaths = ("self_attn", "cross_attn", "ffn")
    dit = dict(dit, blocks=quantize_linear_tree(dit["blocks"], paths=qpaths))
    cn = dict(cn, blocks=quantize_linear_tree(cn["blocks"], paths=qpaths))
    lat2, y2, cl2, ctx_raw, ts = _inputs(jax.random.PRNGKey(0))

    ref = denoise_forward(dit, CFG, lat2, ts, ctx_raw, y=y2,
                          controlnet_params=cn, controlnet_cfg=CN_CFG,
                          control_latents=cl2, attn_impl="xla")
    out = _run_segmented(dit, cn, lat2, y2, cl2, ctx_raw, ts)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
    # and the quantization actually took: int8 packs present in both stacks
    assert "w_i8" in dit["blocks"]["ffn"]["fc0"]
    assert "w_i8" in cn["blocks"]["self_attn"]["q"]
