#!/usr/bin/env python
"""AOT memory proof at REAL A14B geometry (SURVEY.md §7 hard part 2).

Compiles the full-size sharded goal-force steps with the real TPU compiler against
an ABSTRACT topology (jax.experimental.topologies — no TPU chips are touched, only
libtpu's AOT compiler), then asserts the per-chip memory footprint fits HBM:

  * inference: merged-CFG denoise step, 32,760 tokens, dim 5120, 40 DiT blocks +
    10 ControlNet blocks, weights FSDP-sharded over all 8 chips (the active expert;
    the standby expert is host-staged by GoalForcePipeline.shard and costs no HBM).
  * training:  full train step (VAE+T5 encodes, remat'd denoiser, ControlNet grads,
    AdamW) at 81 frames 480x832 — the reference needs ZeRO-2 + optimizer CPU offload
    to fit this under 80 GB/GPU (reference README.md:210).

No weights are materialized: parameter trees come from jax.eval_shape and the step
is jit(...).lower(...).compile()'d from ShapeDtypeStructs. Exits non-zero if the
sharding regresses past the HBM budget, so CI can gate on it.

Usage: python scripts/aot_memcheck.py [--topology v5e:2x4] [--hbm-gb 16]
                                      [--skip-train] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPO_ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO_ROOT)

from goal_force_tpu import configs  # noqa: E402
from goal_force_tpu.models import controlnet as cnm  # noqa: E402
from goal_force_tpu.models import t5 as t5m  # noqa: E402
from goal_force_tpu.models import vae as vaem  # noqa: E402
from goal_force_tpu.models import wan_dit  # noqa: E402
from goal_force_tpu.parallel import fsdp_specs, use_mesh  # noqa: E402
from goal_force_tpu.pipelines.model_fn import denoise_forward  # noqa: E402
from goal_force_tpu.schedulers import flow_match as fm  # noqa: E402


def _with_shardings(shapes, specs, mesh):
    return jax.tree_util.tree_map(
        lambda s, p: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                          sharding=NamedSharding(mesh, p)),
        shapes, specs,
    )


def _replicated(shapes, mesh):
    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                       sharding=NamedSharding(mesh, P())),
        shapes,
    )


def _report(name, compiled, hbm_bytes):
    ma = compiled.memory_analysis()
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    rec = {
        "step": name,
        "argument_gb": ma.argument_size_in_bytes / 1e9,
        "output_gb": ma.output_size_in_bytes / 1e9,
        "temp_gb": ma.temp_size_in_bytes / 1e9,
        "alias_gb": ma.alias_size_in_bytes / 1e9,
        "peak_gb": total / 1e9,
        "hbm_gb": hbm_bytes / 1e9,
        "fits": bool(total <= hbm_bytes),
    }
    print(f"[{name}] args {rec['argument_gb']:.2f} GB + temp {rec['temp_gb']:.2f} GB "
          f"+ out {rec['output_gb']:.2f} GB - alias {rec['alias_gb']:.2f} GB "
          f"= {rec['peak_gb']:.2f} GB per chip (budget {rec['hbm_gb']:.1f} GB) "
          f"-> {'FITS' if rec['fits'] else 'DOES NOT FIT'}")
    return rec


def check_inference(mesh, dit_cfg, cn_cfg, hbm_bytes, attn_impl,
                    pp_microbatches=None, name="inference_denoise_step"):
    key = jax.random.PRNGKey(0)
    stage_fsdp = pp_microbatches is not None
    dit_shapes = jax.eval_shape(
        lambda k: wan_dit.init_wan_dit(k, dit_cfg, jnp.bfloat16), key)
    cn_shapes = jax.eval_shape(
        lambda k: cnm.init_controlnet(k, dit_cfg, cn_cfg, jnp.bfloat16), key)

    # FSDP over all mesh axes: the only layout where one 14B expert + 10-block
    # ControlNet fit a v5e-8 (TP-only leaves 14 GB/chip at tp=2). XLA all-gathers
    # one block's weights per scan iteration (~700 MB) over ICI.
    all_axes = tuple(mesh.axis_names)
    dit_abs = _with_shardings(
        dit_shapes,
        fsdp_specs(dit_shapes, mesh, axes=all_axes, pp_stage_fsdp=stage_fsdp),
        mesh)
    cn_abs = _with_shardings(
        cn_shapes,
        fsdp_specs(cn_shapes, mesh, axes=all_axes, pp_stage_fsdp=stage_fsdp,
                   pin_pp_layers=False),
        mesh)

    f, h2, w2 = 21, 60, 104  # latent geometry for 81 frames @ 832x480
    bf = jnp.bfloat16
    lat = jax.ShapeDtypeStruct((1, f, h2, w2, 16), bf,
                               sharding=NamedSharding(mesh, P()))
    ts = jax.ShapeDtypeStruct((1,), bf, sharding=NamedSharding(mesh, P()))
    ctx = jax.ShapeDtypeStruct((2, 512, dit_cfg.text_dim), bf,
                               sharding=NamedSharding(mesh, P("dp")))
    y2 = jax.ShapeDtypeStruct((2, f, h2, w2, 20), bf,
                              sharding=NamedSharding(mesh, P("dp")))
    cl2 = jax.ShapeDtypeStruct((2, f, h2, w2, 16), bf,
                               sharding=NamedSharding(mesh, P("dp")))
    sig = jax.ShapeDtypeStruct((), jnp.float32, sharding=NamedSharding(mesh, P()))

    def step(dit_p, cn_p, latents, timestep, sigma, sigma_next, ctx2, y2, cl2):
        b = latents.shape[0]
        x2 = jnp.concatenate([latents, latents], axis=0)
        t2 = jnp.concatenate([timestep, timestep], axis=0)
        v = denoise_forward(dit_p, dit_cfg, x2, t2, ctx2, y=y2,
                            controlnet_params=cn_p, controlnet_cfg=cn_cfg,
                            control_latents=cl2, attn_impl=attn_impl,
                            pp_microbatches=pp_microbatches)
        v = v[b:] + 5.0 * (v[:b] - v[b:])
        return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

    with use_mesh(mesh):
        compiled = (jax.jit(step, donate_argnums=(2,))
                    .lower(dit_abs, cn_abs, lat, ts, sig, sig, ctx, y2, cl2)
                    .compile())
    return _report(name, compiled, hbm_bytes)


def check_training(mesh, dit_cfg, t5_cfg, vae_cfg, cn_cfg, hbm_bytes, attn_impl,
                   pp_microbatches=None, name="train_step"):
    from goal_force_tpu.training import TrainState, make_optimizer, make_train_step

    key = jax.random.PRNGKey(0)
    all_axes = tuple(mesh.axis_names)
    # On HBM-tight pipelined topologies, FSDP the block weights within each
    # stage group too (pp alone leaves stage weights replicated over it).
    stage_fsdp = pp_microbatches is not None
    frozen_shapes = {
        "dit": jax.eval_shape(lambda k: wan_dit.init_wan_dit(k, dit_cfg, jnp.bfloat16), key),
        "t5": jax.eval_shape(lambda k: t5m.init_t5(k, t5_cfg, jnp.bfloat16), key),
        "vae": jax.eval_shape(lambda k: vaem.init_vae(k, vae_cfg, jnp.bfloat16), key),
    }
    frozen_abs = _with_shardings(
        frozen_shapes,
        fsdp_specs(frozen_shapes, mesh, axes=all_axes, pp_stage_fsdp=stage_fsdp),
        mesh)

    cn_shapes = jax.eval_shape(
        lambda k: cnm.init_controlnet(k, dit_cfg, cn_cfg, jnp.float32), key)
    opt = make_optimizer()
    opt_shapes = jax.eval_shape(opt.init, cn_shapes)
    cn_specs = fsdp_specs(cn_shapes, mesh, axes=all_axes, pp_stage_fsdp=stage_fsdp,
                          pin_pp_layers=False)
    state_abs = TrainState(
        _with_shardings(cn_shapes, cn_specs, mesh),
        jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, s.dtype,
                sharding=NamedSharding(
                    mesh,
                    fsdp_specs({"x": s}, mesh, axes=all_axes)["x"]
                    if hasattr(s, "shape") and np.prod(s.shape, dtype=np.int64) > 1
                    else P())),
            opt_shapes),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=NamedSharding(mesh, P())),
    )

    dp = mesh.shape["dp"]
    # pipelined runs need batch >= microbatches (each microbatch still dp-wide)
    b = dp * (pp_microbatches or 1)
    batch_abs = {
        "video": jax.ShapeDtypeStruct((b, 81, 480, 832, 3), jnp.float32,
                                      sharding=NamedSharding(mesh, P("dp"))),
        "control": jax.ShapeDtypeStruct((b, 81, 480, 832, 3), jnp.float32,
                                        sharding=NamedSharding(mesh, P("dp"))),
        "ids": jax.ShapeDtypeStruct((b, t5_cfg.text_len), jnp.int32,
                                    sharding=NamedSharding(mesh, P("dp"))),
        "mask": jax.ShapeDtypeStruct((b, t5_cfg.text_len), jnp.int32,
                                     sharding=NamedSharding(mesh, P("dp"))),
    }
    rng_abs = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))

    step = make_train_step(dit_cfg, t5_cfg, vae_cfg, cn_cfg, opt, num_frames=81,
                           attn_impl=attn_impl, pp_microbatches=pp_microbatches)
    with use_mesh(mesh):
        compiled = jax.jit(step).lower(state_abs, frozen_abs, batch_abs, rng_abs).compile()
    return _report(name, compiled, hbm_bytes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--topology", default="v5e:2x4",
                    help="abstract TPU topology (e.g. v5e:2x4)")
    ap.add_argument("--hbm-gb", type=float, default=16.0,
                    help="per-chip HBM budget in GB (v5e=16, v5p=95)")
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--sp", type=int, default=2)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--attn", default="pallas")
    ap.add_argument("--train-topology", default="v5p:2x2x2")
    ap.add_argument("--train-hbm-gb", type=float, default=95.0)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-inference", action="store_true")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline stages for the TRAIN check (pp>1: the DiT "
                         "trunk is GPipe-pipelined; lets A14B training fit "
                         "16 GB v5e chips, e.g. --pp 4 --train-topology "
                         "v5e:4x4 --train-hbm-gb 16)")
    ap.add_argument("--pp-microbatches", type=int, default=2)
    ap.add_argument("--pp-inference", type=int, default=0,
                    help="ALSO check the merged-CFG inference step pipelined "
                         "over a pp mesh (pp stages x sp) at full A14B "
                         "geometry — the flash kernel dispatches INSIDE the "
                         "stages via the nested shard_map (VERDICT r4 item 3); "
                         "e.g. --pp-inference 4 --topology v5e:2x4")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from jax.experimental import topologies

    from goal_force_tpu.parallel import make_mesh

    dit_cfg = configs.WAN22_A14B
    t5_cfg = configs.UMT5_XXL
    vae_cfg = configs.WAN21_VAE
    cn_cfg = configs.ControlNetConfig(num_layers=10, in_channels=16)
    hbm = args.hbm_gb * 1e9

    records = []
    if not args.skip_inference:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=args.topology)
        n = args.dp * args.sp * args.tp
        assert len(topo.devices) >= n, \
            f"topology has {len(topo.devices)} chips, need {n}"
        mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp,
                         devices=list(topo.devices))
        records.append(check_inference(mesh, dit_cfg, cn_cfg, hbm, args.attn))
    if args.pp_inference > 1:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name=args.topology)
        n_rest = max(1, len(topo.devices) // args.pp_inference)
        pmesh = make_mesh(dp=1, sp=n_rest, tp=1, pp=args.pp_inference,
                          devices=list(topo.devices))
        records.append(check_inference(
            pmesh, dit_cfg, cn_cfg, hbm, args.attn, pp_microbatches=2,
            name=f"inference_denoise_step_pp{args.pp_inference}"))
    if not args.skip_train:
        # without pp, training targets the v5p tier (95 GB HBM — the
        # A100-80GB-class pod the reference trains on); with --pp the trunk is
        # pipelined and 81-frame training fits 16 GB v5e chips.
        ttopo = topologies.get_topology_desc(platform="tpu",
                                             topology_name=args.train_topology)
        tmesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp, pp=args.pp,
                          devices=list(ttopo.devices))
        records.append(
            check_training(tmesh, dit_cfg, t5_cfg, vae_cfg, cn_cfg,
                           args.train_hbm_gb * 1e9, args.attn,
                           pp_microbatches=(args.pp_microbatches
                                            if args.pp > 1 else None),
                           name=f"train_step_pp{args.pp}" if args.pp > 1
                           else "train_step"))

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(records, fh, indent=2)
    if not all(r["fits"] for r in records):
        sys.exit(1)
    print("aot_memcheck: all steps fit")


if __name__ == "__main__":
    main()
