"""W8A8 full-depth streaming step (beyond-parity headroom measurement).

The round-5 headline step streams all 45 blocks' bf16 weights host->HBM every
step (MEASURED_r05.json). v5e's int8 MXU runs at 2x the bf16 peak and an int8
weight stream is half the DMA bytes, so the W8A8 pack (ops/quant.py — the
TPU-native analog of the reference's fp8 torch._scaled_mm path,
/root/reference/diffsynth/vram_management/layers.py:141-148) is the honest
"faster than the bf16 story" option a 16 GB single chip has. This measures it:
the SAME 40+10-block A14B step, block linears quantized to int8 (per-output-
channel weight scales, per-token dynamic activation scales), streamed per step
in int8 segments. Two attention variants: bf16 flash ("pallas", only the
linears are int8) and the int8 flash kernel ("pallas_int8").

Weights are zeros like the bf16 measurement (MXU timing is data-independent;
accuracy of W8A8 is covered by tests/test_quant.py golden bounds). This script
is the only writer of MEASURED_r05_INT8.json.

Run standalone: NS_BUDGET_S=3600 python scripts/measure_int8_step.py
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from goal_force_tpu.utils.compile_cache import enable_persistent_cache

CACHE_DIR = enable_persistent_cache()

import jax.numpy as jnp  # noqa: E402

from goal_force_tpu.configs import WanDiTConfig  # noqa: E402
from goal_force_tpu.models import wan_dit as wd  # noqa: E402
from goal_force_tpu.ops.quant import quantize_linear_tree  # noqa: E402
from goal_force_tpu.ops.rope import assemble_rope, rope_tables_3d  # noqa: E402
from goal_force_tpu.schedulers.flow_match import make_schedule  # noqa: E402

OUT_PATH = os.environ.get("NS_INT8_OUT", "/root/repo/MEASURED_r05_INT8.json")
t_job0 = time.time()
DEADLINE = t_job0 + float(os.environ.get("NS_BUDGET_S", 3600))

RES = {"status": "setup", "compile_cache_dir": CACHE_DIR, "notes": {
    "what": "W8A8 full-depth streaming step: block linears int8 (per-out-channel"
            " weight scales, per-token dynamic activation scales), zero convs +"
            " small params bf16, all 45 blocks streamed host->HBM per step",
    "why": "v5e int8 MXU = 2x bf16 peak and int8 stream = 0.5x DMA bytes;"
           " the TPU-native analog of the reference's fp8 scaled_mm option",
}}


def save():
    tmp = OUT_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(RES, f, indent=1)
    os.replace(tmp, OUT_PATH)


save()

dev = jax.devices()[0]
on_tpu = dev.platform == "tpu"

cfg = WanDiTConfig(dim=5120, in_dim=36, ffn_dim=13824, out_dim=16, text_dim=4096,
                   freq_dim=256, num_heads=40, num_layers=40)
SEG = 5
N_DIT_SEG, N_CN_SEG = 8, 2
B, F, H, W = 2, 21, 60, 104
GRID = (F, H // 2, W // 2)
CFG_SCALE = 5.0
QPATHS = ("self_attn", "cross_attn", "ffn")

key = jax.random.PRNGKey(0)
k1, k2, key = jax.random.split(key, 3)
small = jax.jit(lambda k: wd.init_wan_dit(
    k, WanDiTConfig(dim=cfg.dim, in_dim=36, ffn_dim=cfg.ffn_dim, out_dim=16,
                    text_dim=4096, freq_dim=256, num_heads=40, num_layers=1),
    jnp.bfloat16))(k1)
del small["blocks"]
patch_in_cn = 16 * math.prod(cfg.patch_size)
cn_pe = {"w": jax.random.uniform(k2, (patch_in_cn, cfg.dim), jnp.bfloat16,
                                 -1 / math.sqrt(patch_in_cn), 1 / math.sqrt(patch_in_cn)),
         "b": jnp.zeros((cfg.dim,), jnp.bfloat16)}
tables = rope_tables_3d(cfg.head_dim, cfg.rope_max_len)
COS, SIN = assemble_rope(tables, *GRID)
sched = make_schedule(50, shift=5.0)

# int8 segment SHAPES: stack SEG blocks then quantize the linear tree
seg_shapes = jax.eval_shape(
    lambda k: quantize_linear_tree(
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[wd.init_block(kk, cfg, jnp.bfloat16)
              for kk in jax.random.split(k, SEG)]),
        paths=QPATHS),
    key)
PINNED = jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host") if on_tpu \
    else jax.sharding.SingleDeviceSharding(dev)


def host_seg():
    host = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, jax.dtypes.canonicalize_dtype(s.dtype)),
        seg_shapes)
    return jax.device_put(host, PINNED)


DIT_SEGS = [host_seg() for _ in range(N_DIT_SEG)]
CN_SEGS = [{"blocks": host_seg(),
            "zc_w": jax.device_put(np.zeros((SEG, cfg.dim, cfg.dim), jnp.bfloat16), PINNED),
            "zc_b": jax.device_put(np.zeros((SEG, cfg.dim), jnp.bfloat16), PINNED)}
           for _ in range(N_CN_SEG)]
DEVS = jax.sharding.SingleDeviceSharding(dev)
put = lambda p: jax.device_put(p, DEVS)
seg_bytes = sum(
    np.prod(s.shape) * jnp.dtype(s.dtype).itemsize
    for s in jax.tree_util.tree_leaves(seg_shapes))
RES["seg_gb_int8"] = round(seg_bytes / 2**30, 2)
RES["dma_gb_per_step"] = round(
    (N_DIT_SEG * seg_bytes + N_CN_SEG * (seg_bytes + SEG * cfg.dim * (cfg.dim + 1) * 2))
    / 2**30, 1)
RES["status"] = "segments staged"
save()


def make_fns(attn):
    @jax.jit
    def dit_seg(blocks, tokens, ctx, t_mod):
        out, _ = wd.run_blocks(blocks, tokens, ctx, t_mod, COS, SIN, cfg,
                               attn_impl=attn)
        return out

    @jax.jit
    def dit_seg_inj(blocks, tokens, ctx, t_mod, inj):
        out, _ = wd.run_blocks(blocks, tokens, ctx, t_mod, COS, SIN, cfg,
                               injections=inj, attn_impl=attn)
        return out

    @jax.jit
    def cn_seg_fn(seg, c_tokens, ctx, t_mod):
        def body(c, layer):
            p_blk, zw, zb = layer
            c = wd.dit_block(p_blk, c, ctx, t_mod, COS, SIN, cfg, attn)
            inj = jnp.matmul(c, zw.astype(c.dtype)) + zb.astype(c.dtype)
            return c, inj
        c_out, inj = jax.lax.scan(body, c_tokens,
                                  (seg["blocks"], seg["zc_w"], seg["zc_b"]))
        return c_out, inj

    return dit_seg, dit_seg_inj, cn_seg_fn


@jax.jit
def prologue(small_p, cn_pe_p, lat, ts, ctx_raw, y2, cl2):
    t, t_mod = wd.time_embed(small_p, cfg, ts)
    ctx = wd.text_embed(small_p, ctx_raw)
    x = jnp.concatenate([lat, lat], axis=0)
    x = jnp.concatenate([x, y2.astype(x.dtype)], axis=-1)
    tokens, _ = wd.patchify(small_p["patch_embedding"], x, cfg.patch_size)
    c_tokens, _ = wd.patchify(cn_pe_p, cl2, cfg.patch_size)
    return t, t_mod, ctx, tokens, c_tokens


@jax.jit
def epilogue(small_p, tokens, t, lat, sig, sig_next):
    out = wd.head(small_p["head"], tokens, t, cfg.eps)
    v = wd.unpatchify(out, GRID, cfg.patch_size, cfg.out_dim)
    vv = v[1:] + CFG_SCALE * (v[:1] - v[1:])
    return (lat.astype(jnp.float32)
            + (sig_next - sig) * vv.astype(jnp.float32)).astype(lat.dtype)


kk = jax.random.split(key, 4)
y2 = jax.random.normal(kk[1], (B, F, H, W, 20), jnp.bfloat16)
ctx_clip = jax.random.normal(key, (B, 512, 4096), jnp.bfloat16)
cl2 = jax.random.normal(kk[2], (B, F, H, W, 16), jnp.bfloat16)
sync = lambda a: float(a.astype(jnp.float32).reshape(-1)[0])


def full_step(fns, lat, ts_val, sig, sig_next):
    dit_seg, dit_seg_inj, cn_seg_fn = fns
    ts = jnp.full((B,), ts_val, jnp.float32)
    t, t_mod, ctx, tokens, c_tokens = prologue(small, cn_pe, lat, ts,
                                               ctx_clip, y2, cl2)
    for k in range(N_CN_SEG):
        w = put(CN_SEGS[k])
        c_tokens, inj = cn_seg_fn(w, c_tokens, ctx, t_mod)
        del w
        w = put(DIT_SEGS[k])
        tokens = dit_seg_inj(w, tokens, ctx, t_mod, inj)
        del w, inj
    nxt = put(DIT_SEGS[N_CN_SEG])
    for k in range(N_CN_SEG, N_DIT_SEG):
        cur, nxt = nxt, (put(DIT_SEGS[k + 1]) if k + 1 < N_DIT_SEG else None)
        tokens = dit_seg(cur, tokens, ctx, t_mod)
        del cur
    new_lat = epilogue(small, tokens, t, lat, sig, sig_next)
    del tokens
    return new_lat


VARIANTS = [("pallas", "int8_linears_bf16_attn"),
            ("pallas_int8", "int8_linears_int8_attn")] if on_tpu else \
           [("xla", "int8_linears_xla_attn_cpu_smoke")]
N_REPS = int(os.environ.get("NS_INT8_REPS", 5))

for attn, label in VARIANTS:
    if time.time() > DEADLINE - 300:
        RES[label] = "skipped on deadline"
        save()
        continue
    fns = make_fns(attn)
    lat = jax.random.normal(key, (1, F, H, W, 16), jnp.bfloat16)
    times = []
    for i in range(N_REPS):
        if time.time() > DEADLINE - 120:
            break
        sig, sig_next = float(sched.sigmas[i]), sched.sigma_next(i)
        s0 = time.time()
        lat = full_step(fns, lat, float(sched.timesteps[i]), sig, sig_next)
        sync(lat)
        times.append(time.time() - s0)
        if i == 0:
            RES[f"{label}_compile_plus_first_step_s"] = round(times[0], 2)
            save()
    if len(times) > 1:
        steady = times[1:]
        RES[f"{label}_step_s"] = round(min(steady), 3)
        RES[f"{label}_step_s_mean"] = round(float(np.mean(steady)), 3)
        RES[f"{label}_reps_s"] = [round(x, 3) for x in steady]
    RES["status"] = f"{label} measured"
    save()

RES["status"] = "complete"
RES["job_wall_s"] = round(time.time() - t_job0, 1)
save()
print(json.dumps(RES, indent=1))
