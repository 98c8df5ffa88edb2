"""Driver benchmark: denoise-step throughput for the goal-force denoiser on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

What it measures: wall-clock of the jitted denoiser forward (DiT blocks + ControlNet
side-stack + embeds/head) at the REAL Wan2.2-A14B layer geometry — dim 5120, 40 heads,
head_dim 128, ffn 13824, batch 2 (merged CFG), 32,760 tokens (81f x 832x480), bf16, Pallas
flash attention — at reduced depth (the full 40+10 blocks don't fit one 16 GB v5e chip),
then extrapolates linearly in block count to the full 40 DiT + 10 ControlNet stack to
report denoise steps/sec/chip. Depth extrapolation is sound because blocks are homogeneous
and scanned; the measured slope includes all per-block HBM traffic.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the denominator is an
analytic A100 model of the same computation: FLOPs / (312 TFLOP/s * 40% MFU) — a generous
estimate for the reference's eager-PyTorch + layer-offload path. value > 1.0 means faster
than that A100 estimate per step.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from goal_force_tpu.configs import ControlNetConfig, WanDiTConfig
    from goal_force_tpu.models import controlnet as cnm
    from goal_force_tpu.models import wan_dit
    from goal_force_tpu.pipelines.model_fn import denoise_forward

    on_tpu = jax.devices()[0].platform == "tpu"
    attn_impl = "pallas" if on_tpu else "xla"

    # Real A14B block geometry; depth reduced to fit one chip.
    full_layers, full_cn_layers = 40, 10
    if on_tpu:
        depths = [4, 8]  # 5 and 9 measured blocks: cleaner slope (fits since the scan-slice fix)
        b, f, hh, ww = 2, 21, 60, 104          # real 32,760-token clip, merged CFG
        text_len = 512
        dim, heads, ffn = 5120, 40, 13824
    else:  # smoke mode for CPU dev runs
        depths = [1, 2]
        b, f, hh, ww = 2, 3, 12, 16
        text_len = 32
        dim, heads, ffn = 512, 4, 1024

    times = {}
    for depth in depths:
        dit_cfg = WanDiTConfig(dim=dim, in_dim=36, ffn_dim=ffn, out_dim=16,
                               text_dim=4096, freq_dim=256, num_heads=heads,
                               num_layers=depth)
        cn_cfg = ControlNetConfig(num_layers=1, in_channels=16)
        key = jax.random.PRNGKey(0)
        dit = wan_dit.init_wan_dit(key, dit_cfg, jnp.bfloat16)
        cn = cnm.init_from_dit(key, dit, dit_cfg, cn_cfg, jnp.bfloat16)
        latents = jax.random.normal(key, (b, f, hh, ww, 16), jnp.bfloat16)
        y = jax.random.normal(key, (b, f, hh, ww, 20), jnp.bfloat16)
        cl = jax.random.normal(key, (b, f, hh, ww, 16), jnp.bfloat16)
        ctx = jax.random.normal(key, (b, text_len, 4096), jnp.bfloat16)
        t = jnp.full((b,), 900.0, jnp.bfloat16)

        # .mean() folded into the jit: a host-materialized scalar per rep is the only
        # reliable completion barrier on the axon runtime (block_until_ready can return
        # early, and identical dispatches are served from a cache).
        fn = jax.jit(lambda d, c, x, ts, cx, yy, cc: denoise_forward(
            d, dit_cfg, x, ts, cx, y=yy, controlnet_params=c, controlnet_cfg=cn_cfg,
            control_latents=cc, attn_impl=attn_impl).astype(jnp.float32).mean())
        float(fn(dit, cn, latents, t, ctx, y, cl))  # warm
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            float(fn(dit, cn, latents, t + i, ctx, y, cl))
        times[depth] = (time.perf_counter() - t0) / reps
        del dit, cn, fn

    d0, d1 = depths
    # blocks measured = dit depth + 1 controlnet block
    per_block = (times[d1] - times[d0]) / (d1 - d0)
    overhead = times[d0] - per_block * (d0 + 1)
    step_time = overhead + per_block * (full_layers + full_cn_layers)
    steps_per_sec = 1.0 / step_time

    # Analytic A100 baseline for the same computation (see module docstring).
    s_tokens = f * (hh // 2) * (ww // 2)
    flops_per_block = s_tokens * (16 * dim * dim + 4 * dim * ffn + 4 * s_tokens * dim
                                  + 4 * text_len * dim) * b
    total_flops = flops_per_block * (full_layers + full_cn_layers)
    a100_time = total_flops / (312e12 * 0.40)
    vs_baseline = a100_time / step_time

    print(json.dumps({
        "metric": "denoise_steps_per_sec_chip (A14B geometry, 32760 tok, merged CFG,"
                  " extrapolated 40+10 blocks)" if on_tpu else "denoise_steps_per_sec (cpu smoke)",
        "value": round(steps_per_sec, 5),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
