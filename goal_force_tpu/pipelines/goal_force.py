"""GoalForcePipeline — CSV row + image -> video frames.

The public contract mirrors WanVideoPipeline.__call__
(/root/reference/src/goal_force/wan_video_new.py:598-737): prompt (+fixed negative),
first-frame image, (F, H, W, 3) control-signal video, seed -> frames.

TPU-native structure replaces the reference's unit-runner + VRAM offload choreography:

  host:   tokenize, control-map render
  device: text encode (jit), VAE encodes (jit), ONE jitted denoise step reused for all 50
          steps and BOTH experts (identical param trees; the 0.875-boundary switch at
          reference :697-704 is just a static step index into the sigma table), VAE decode.

CFG runs merged as a batch of 2 (posi/nega) for MXU utilization — numerically the
cfg_merge path of the reference (:711-716).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu import configs
from goal_force_tpu.configs import (
    ControlNetConfig,
    PipelineConfig,
    T5Config,
    VAEConfig,
    WanDiTConfig,
)
from goal_force_tpu.models import t5 as t5m
from goal_force_tpu.models import vae as vaem
from goal_force_tpu.models.tokenizer import load_tokenizer
from goal_force_tpu.pipelines.model_fn import (
    denoise_forward,
    denoise_forward_skip,
    temporal_tiled_forward,
)
from goal_force_tpu.schedulers import flow_match as fm


def build_i2v_mask(num_frames: int, lat_f: int, lat_h: int, lat_w: int,
                   last_frame: bool = False) -> np.ndarray:
    """The 4-channel temporal mask (reference WanVideoUnit_ImageEmbedderVAE :899-910):
    frame 0 repeated 4x then zeros, regrouped (T+3)//4 x 4 -> latent-frame channels.
    last_frame=True marks the final frame too (first-last-frame conditioning, :904)."""
    msk = np.zeros((num_frames,), np.float32)
    msk[0] = 1.0
    if last_frame:
        msk[-1] = 1.0
    ext = np.concatenate([np.repeat(msk[:1], 4), msk[1:]])  # (T+3,)
    ext = ext.reshape(lat_f, 4)                              # frame 4l+c
    out = np.broadcast_to(ext[:, None, None, :], (lat_f, lat_h, lat_w, 4))
    return np.ascontiguousarray(out)


@dataclasses.dataclass
class GoalForcePipeline:
    dit_cfg: WanDiTConfig
    t5_cfg: T5Config
    vae_cfg: VAEConfig
    cn_cfg: Optional[ControlNetConfig]
    pipe_cfg: PipelineConfig
    params: Dict            # {dit, dit2, controlnet, controlnet2, t5, vae}
    tokenizer: object
    dtype: object = jnp.bfloat16
    attn_impl: str = "auto"
    vace_layers: tuple = ()             # DiT layers with VACE hints (when "vace" loaded)
    mesh: Optional[object] = None       # jax.sharding.Mesh; set via shard()
    pp_microbatches: Optional[int] = None   # pipeline-parallel microbatches (shard())
    _stager: Optional[object] = dataclasses.field(default=None, repr=False)
    _stager_low: bool = dataclasses.field(default=False, repr=False)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        high_noise_model,                 # safetensors path/glob/list (civitai naming)
        low_noise_model=None,
        t5_path: Optional[str] = None,    # .pth or .safetensors
        vae_path: Optional[str] = None,
        controlnet_checkpoint: Optional[str] = None,
        controlnet_num_layers: int = 10,
        controlnet_stride: Optional[int] = None,
        tokenizer_path: Optional[str] = None,
        vace_path: Optional[str] = None,              # VACE adapter weights
        vace_layers: Optional[tuple] = None,          # default: by DiT depth
        motion_controller_path: Optional[str] = None,  # speed-control MLP
        camera_adapter_path: Optional[str] = None,     # Fun-Camera SimpleAdapter
        dit_cfg: Optional[WanDiTConfig] = None,
        t5_cfg: Optional[T5Config] = None,
        vae_cfg: Optional[VAEConfig] = None,
        pipe_cfg: Optional[PipelineConfig] = None,
        dtype=jnp.bfloat16,
        seed: int = 0,
    ) -> "GoalForcePipeline":
        """Build the pipeline from reference-format weight files.

        Replaces ModelManager's hash-detection load path
        (/root/reference/diffsynth/models/model_manager.py:395-461) with explicit files.
        The ControlNet is initialized by slicing the expert DiTs (reference
        wan_video_new.py:558-571) and optionally overlaid with a trained checkpoint.
        """
        from goal_force_tpu.io import torch_convert as tc
        from goal_force_tpu.io.safetensors_io import (
            load_goalforce_controlnet,
            load_safetensors,
            load_torch_pth,
        )
        from goal_force_tpu.models import controlnet as cnm

        dit_cfg = dit_cfg or configs.WAN22_A14B
        t5_cfg = t5_cfg or configs.UMT5_XXL
        vae_cfg = vae_cfg or configs.WAN21_VAE
        pipe_cfg = pipe_cfg or PipelineConfig()
        cn_cfg = ControlNetConfig(num_layers=controlnet_num_layers, stride=controlnet_stride,
                                  in_channels=vae_cfg.z_dim)

        def _load_any(path):
            if path is None:
                return None
            if str(path).endswith(".pth") or str(path).endswith(".pt"):
                return load_torch_pth(path)
            return load_safetensors(path)

        def to_dev(tree):
            return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)

        params: Dict = {}
        key = jax.random.PRNGKey(seed)
        sd = _load_any(high_noise_model)
        params["dit"] = to_dev(tc.dit_params_from_torch(sd, dit_cfg))
        del sd
        if low_noise_model is not None:
            sd = _load_any(low_noise_model)
            params["dit2"] = to_dev(tc.dit_params_from_torch(sd, dit_cfg))
            del sd
        if t5_path is not None:
            params["t5"] = to_dev(tc.t5_params_from_torch(_load_any(t5_path), t5_cfg))
        if vae_path is not None:
            params["vae"] = to_dev(tc.vae_params_from_torch(_load_any(vae_path), vae_cfg))

        if controlnet_num_layers > 0:
            params["controlnet"] = cnm.init_from_dit(key, params["dit"], dit_cfg, cn_cfg, dtype)
            if "dit2" in params:
                # controlnet2 keeps zero-init zero-convs (identity): the reference loads
                # the trained checkpoint ONLY into the high-noise controlnet
                # (inference_goal_force.py:108; training covers the high-noise window only).
                params["controlnet2"] = cnm.init_from_dit(
                    key, params["dit2"], dit_cfg, cn_cfg, dtype
                )
            if controlnet_checkpoint is not None:
                params["controlnet"] = to_dev(
                    load_goalforce_controlnet(controlnet_checkpoint, cn_cfg)
                )

        resolved_vace_layers = ()
        if vace_path is not None:
            from goal_force_tpu.models.adapters import (
                VACE_LAYERS_14B,
                VACE_LAYERS_1_3B,
                vace_from_torch,
            )

            resolved_vace_layers = tuple(
                vace_layers if vace_layers is not None
                else (VACE_LAYERS_14B if dit_cfg.num_layers >= 40 else VACE_LAYERS_1_3B))
            params["vace"] = to_dev(
                vace_from_torch(_load_any(vace_path), dit_cfg, resolved_vace_layers))
        if motion_controller_path is not None:
            from goal_force_tpu.models.adapters import motion_controller_from_torch

            params["motion_controller"] = to_dev(
                motion_controller_from_torch(_load_any(motion_controller_path)))
        if camera_adapter_path is not None:
            from goal_force_tpu.models.camera_controller import (
                simple_adapter_params_from_torch,
            )

            sd_cam = _load_any(camera_adapter_path)
            # camera models carry the adapter inside the DiT state dict under
            # "control_adapter." (wan_video_dit.py:336-338); accept both layouts
            if any("control_adapter." in k for k in sd_cam):
                sd_cam = {k.split("control_adapter.", 1)[1]: v
                          for k, v in sd_cam.items() if "control_adapter." in k}
            params["camera_adapter"] = to_dev(simple_adapter_params_from_torch(sd_cam))

        tok = load_tokenizer(tokenizer_path, t5_cfg.vocab, t5_cfg.text_len)
        return cls(dit_cfg, t5_cfg, vae_cfg,
                   cn_cfg if controlnet_num_layers > 0 else None,
                   pipe_cfg, params, tok, dtype,
                   vace_layers=resolved_vace_layers)

    @classmethod
    def init_random(
        cls,
        key=None,
        dit_cfg: Optional[WanDiTConfig] = None,
        t5_cfg: Optional[T5Config] = None,
        vae_cfg: Optional[VAEConfig] = None,
        cn_cfg: Optional[ControlNetConfig] = ControlNetConfig(),
        pipe_cfg: Optional[PipelineConfig] = None,
        dtype=jnp.float32,
        tokenizer_path: Optional[str] = None,
    ) -> "GoalForcePipeline":
        """Randomly-initialized pipeline (tests, benches, identity-invariant checks)."""
        from goal_force_tpu.models import controlnet as cnm
        from goal_force_tpu.models import wan_dit

        key = key if key is not None else jax.random.PRNGKey(0)
        if dit_cfg is None and t5_cfg is None and vae_cfg is None:
            # Mutually consistent tiny configs (bare tiny_dit() mirrors A14B's
            # in_dim=36, which assumes the full z=16 VAE and cannot run e2e
            # against tiny_vae()'s z=4).
            dit_cfg, t5_cfg, vae_cfg, tiny_cn = configs.tiny_pipeline_configs()
            if cn_cfg == ControlNetConfig():   # untouched default: match the tiny VAE
                cn_cfg = tiny_cn
        dit_cfg = dit_cfg or configs.tiny_dit()
        t5_cfg = t5_cfg or configs.tiny_t5()
        vae_cfg = vae_cfg or configs.tiny_vae()
        pipe_cfg = pipe_cfg or PipelineConfig()
        ks = jax.random.split(key, 6)
        dit = wan_dit.init_wan_dit(ks[0], dit_cfg, dtype)
        dit2 = wan_dit.init_wan_dit(ks[1], dit_cfg, dtype)
        params = {
            "dit": dit,
            "dit2": dit2,
            "t5": t5m.init_t5(ks[2], t5_cfg, dtype),
            "vae": vaem.init_vae(ks[3], vae_cfg, dtype),
        }
        if cn_cfg is not None:
            params["controlnet"] = cnm.init_from_dit(ks[4], dit, dit_cfg, cn_cfg, dtype)
            params["controlnet2"] = cnm.init_from_dit(ks[5], dit2, dit_cfg, cn_cfg, dtype)
        tok = load_tokenizer(tokenizer_path, t5_cfg.vocab, t5_cfg.text_len,
                             quiet=True)   # random weights: hash ids are fine
        return cls(dit_cfg, t5_cfg, vae_cfg, cn_cfg, pipe_cfg, params, tok, dtype)

    # ------------------------------------------------------------------
    # Sharding
    # ------------------------------------------------------------------

    def shard(self, mesh, host_stage_experts: bool = False,
              pp_microbatches: Optional[int] = None) -> "GoalForcePipeline":
        """Place params over `mesh` and make it ambient for every jitted stage.

        DiT/ControlNet leaves get tensor-parallel NamedShardings (qkv/ffn-in column,
        o/ffn-out row over "tp"); everything else is replicated; activations are
        constrained inside the model ("sp" over tokens, heads over ("sp","tp") in
        attention) — this is the GSPMD replacement for the reference's
        initialize_usp/enable_usp monkeypatching
        (/root/reference/src/goal_force/wan_video_new.py:455-480).

        With host_stage_experts=True only the active expert (+its ControlNet) stays
        in device memory; the standby pair sits in pinned host memory and is swapped
        in exactly once when the denoise loop crosses the 0.875 boundary — the TPU
        equivalent of the reference's per-phase offload dance
        (wan_video_new.py:697-704, diffsynth/utils/__init__.py:94-114).

        pp_microbatches: with a mesh that has a "pp" axis > 1, the denoise trunk
        runs pipeline-parallel in this many microbatches (default 2 on pp meshes:
        the merged-CFG posi/nega batch feeds the pipeline as two microbatches).
        """
        from goal_force_tpu.parallel import inference_param_specs, place
        from goal_force_tpu.parallel.host_staging import ExpertStager

        self.mesh = mesh
        if (pp_microbatches is None and "pp" in mesh.axis_names
                and mesh.shape["pp"] > 1):
            pp_microbatches = 2
        self.pp_microbatches = pp_microbatches
        # The jitted step closures capture pp_microbatches/mesh state at first
        # access — drop any already-built ones so a pipeline used before
        # shard() (or re-sharded) rebuilds them against the new mesh.
        for name, attr in vars(type(self)).items():
            if isinstance(attr, functools.cached_property):
                self.__dict__.pop(name, None)
        if host_stage_experts and "dit2" in self.params:
            active = {"dit": self.params.pop("dit")}
            standby = {"dit": self.params.pop("dit2")}
            if "controlnet" in self.params:
                active["controlnet"] = self.params.pop("controlnet")
            if "controlnet2" in self.params:
                standby["controlnet"] = self.params.pop("controlnet2")

            def place_active(tree):
                return place(tree, mesh, inference_param_specs(tree, mesh))

            self._stager = ExpertStager(active, standby, device_place=place_active)
            self._stager_low = False
        self.params = place(self.params, mesh, inference_param_specs(self.params, mesh))
        return self

    def _expert(self, low_noise: bool):
        """(dit_params, controlnet_params) for the requested expert, swapping the
        host-staged pair at most once per boundary crossing."""
        if self._stager is None:
            if low_noise and "dit2" in self.params:
                return self.params["dit2"], self.params.get("controlnet2")
            return self.params["dit"], self.params.get("controlnet")
        if low_noise != self._stager_low:
            self._stager.swap()
            self._stager_low = low_noise
        a = self._stager.active
        return a["dit"], a.get("controlnet")

    # ------------------------------------------------------------------
    # Stages (jitted, cached per shape)
    # ------------------------------------------------------------------

    @functools.cached_property
    def _encode_text(self):
        cfg = self.t5_cfg

        @jax.jit
        def fn(t5_params, ids, mask):
            emb = t5m.t5_encode(t5_params, cfg, ids, mask)
            # zero past each sample's length (reference wan_prompter.py:107-108)
            return emb * (mask[..., None] > 0)

        return fn

    @functools.cached_property
    def _encode_vae(self):
        cfg = self.vae_cfg

        @jax.jit
        def fn(vae_params, video):
            return vaem.encode_video(vae_params, cfg, video)

        return fn

    @functools.cached_property
    def _decode_vae(self):
        cfg = self.vae_cfg

        @jax.jit
        def fn(vae_params, latents):
            return vaem.decode_video(vae_params, cfg, latents)

        return fn

    @staticmethod
    def _extra_kwargs(extra, vace_layers):
        """denoise_forward kwargs for the adapter conditionings dict.

        vace_layers rides as a STATIC jit argument on the step functions (not a
        closure) so a pipeline whose vace_layers change retraces instead of
        silently reusing the old injection points."""
        if not extra:
            return {}
        return dict(
            t_mod_offset=extra.get("t_mod_offset"),
            reference_latents=extra.get("reference_latents"),
            camera_embedding=extra.get("camera_embedding"),
            vace_params=extra.get("vace_params"),
            vace_context=extra.get("vace_context"),
            vace_scale=extra.get("vace_scale", 1.0),
            vace_layers=vace_layers,
        )

    @functools.cached_property
    def _denoise_step(self):
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches
        ek = self._extra_kwargs

        @functools.partial(jax.jit, static_argnames=("use_cn", "vace_layers"),
                           donate_argnums=(2,))
        def fn(dit_params, cn_params, latents, timestep, sigma, sigma_next,
               context2, y2, control_latents2, cfg_scale, use_cn, extra=None,
               vace_layers=()):
            """One Euler step with merged CFG. latents: (1, F, H, W, 16);
            *2 args are posi/nega batches of 2."""
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            v = denoise_forward(
                dit_params, dit_cfg, x2, t2, context2, y=y2,
                controlnet_params=cn_params if use_cn else None,
                controlnet_cfg=cn_cfg,
                control_latents=control_latents2 if use_cn else None,
                attn_impl=attn_impl, pp_microbatches=pp_micro,
                **ek(extra, vace_layers),
            )
            v_posi, v_nega = v[:b], v[b:]
            v = v_nega + cfg_scale * (v_posi - v_nega)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    @functools.cached_property
    def _denoise_phase(self):
        """Fused multi-step Euler loop over one expert phase (merged CFG):
        lax.scan over the phase's (timestep, sigma, sigma_next) triples runs
        the whole phase as ONE XLA computation — no per-step dispatch or host
        sync, and XLA overlaps the Euler update with the next step's first
        matmuls (bench.py's fused-loop measurement). Used by _generate when
        neither TeaCache nor sliding windows need host-side control flow."""
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches
        ek = self._extra_kwargs

        @functools.partial(jax.jit, static_argnames=("use_cn", "vace_layers"),
                           donate_argnums=(2,))
        def fn(dit_params, cn_params, latents, tsteps, sigmas, sigma_nexts,
               context2, y2, control_latents2, cfg_scale, use_cn, extra=None,
               vace_layers=()):
            """tsteps/sigmas/sigma_nexts: (K,) stacked per-step values."""
            b = latents.shape[0]

            def body(x, step):
                tval, sig, sig_n = step
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.broadcast_to(tval.astype(x.dtype), (2 * b,))
                v = denoise_forward(
                    dit_params, dit_cfg, x2, t2, context2, y=y2,
                    controlnet_params=cn_params if use_cn else None,
                    controlnet_cfg=cn_cfg,
                    control_latents=control_latents2 if use_cn else None,
                    attn_impl=attn_impl, pp_microbatches=pp_micro,
                    **ek(extra, vace_layers),
                )
                v = v[b:] + cfg_scale * (v[:b] - v[b:])
                return fm.euler_step(x, v.astype(x.dtype), sig, sig_n), None

            out, _ = jax.lax.scan(body, latents, (tsteps, sigmas, sigma_nexts))
            return out

        return fn

    @functools.cached_property
    def _denoise_phase_nocfg(self):
        """Fused multi-step loop, cfg_scale == 1 (single forward per step)."""
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches
        ek = self._extra_kwargs

        @functools.partial(jax.jit, static_argnames=("use_cn", "vace_layers"),
                           donate_argnums=(2,))
        def fn(dit_params, cn_params, latents, tsteps, sigmas, sigma_nexts,
               context, y, control_latents, use_cn, extra=None, vace_layers=()):
            b = latents.shape[0]

            def body(x, step):
                tval, sig, sig_n = step
                v = denoise_forward(
                    dit_params, dit_cfg, x,
                    jnp.broadcast_to(tval.astype(x.dtype), (b,)), context, y=y,
                    controlnet_params=cn_params if use_cn else None,
                    controlnet_cfg=cn_cfg,
                    control_latents=control_latents if use_cn else None,
                    attn_impl=attn_impl, pp_microbatches=pp_micro,
                    **ek(extra, vace_layers),
                )
                return fm.euler_step(x, v.astype(x.dtype), sig, sig_n), None

            out, _ = jax.lax.scan(body, latents, (tsteps, sigmas, sigma_nexts))
            return out

        return fn

    def _run_fused_phases(self, latents, schedule, switch_t, use_cn, step_fn):
        """Split the schedule at the expert boundary and run step_fn once per
        contiguous phase with stacked (timesteps, sigmas, sigma_nexts).
        Returns the final latents, or None when the schedule's expert
        assignment is not two contiguous phases (e.g. inverse timesteps) —
        callers then fall back to the per-step loop."""
        t_np = np.asarray(schedule.timesteps, np.float64)
        low_np = t_np < switch_t
        if not np.all(np.diff(low_np.astype(int)) >= 0):
            return None
        sig_np = np.asarray(schedule.sigmas, np.float64)
        sign_np = np.asarray([schedule.sigma_next(i)
                              for i in range(len(schedule))], np.float64)
        for phase_low in (False, True):
            idx = np.nonzero(low_np == phase_low)[0]
            if idx.size == 0:
                continue
            dit_p, cn_p = self._expert(low_noise=phase_low)
            cn_p = cn_p if use_cn else None
            latents = step_fn(dit_p, cn_p, latents,
                              jnp.asarray(t_np[idx], jnp.float32),
                              jnp.asarray(sig_np[idx], jnp.float32),
                              jnp.asarray(sign_np[idx], jnp.float32))
        return latents

    @functools.cached_property
    def _t_mod(self):
        dit_cfg = self.dit_cfg

        @jax.jit
        def fn(dit_params, timestep):
            from goal_force_tpu.models.wan_dit import time_embed

            return time_embed(dit_params, dit_cfg, timestep)[1]

        return fn

    @functools.cached_property
    def _denoise_step_tc_full(self):
        """Merged-CFG step that also returns the TeaCache token residual."""
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches

        ek = self._extra_kwargs

        @functools.partial(jax.jit, static_argnames=("use_cn", "vace_layers"))
        def fn(dit_params, cn_params, latents, timestep, sigma, sigma_next,
               context2, y2, control_latents2, cfg_scale, use_cn, extra=None,
               vace_layers=()):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            v, (pre, post) = denoise_forward(
                dit_params, dit_cfg, x2, t2, context2, y=y2,
                controlnet_params=cn_params if use_cn else None,
                controlnet_cfg=cn_cfg,
                control_latents=control_latents2 if use_cn else None,
                attn_impl=attn_impl, return_token_states=True,
                pp_microbatches=pp_micro,
                **ek(extra, vace_layers),
            )
            v = v[b:] + cfg_scale * (v[:b] - v[b:])
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next), post - pre

        return fn

    @functools.cached_property
    def _denoise_step_tc_skip(self):
        dit_cfg = self.dit_cfg

        @jax.jit
        def fn(dit_params, latents, timestep, sigma, sigma_next, y2, residual, cfg_scale):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            t2 = jnp.concatenate([timestep, timestep], axis=0)
            v = denoise_forward_skip(dit_params, dit_cfg, x2, t2, y2, residual)
            v = v[b:] + cfg_scale * (v[:b] - v[b:])
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    @functools.cached_property
    def _denoise_step_nocfg(self):
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches

        ek = self._extra_kwargs

        @functools.partial(jax.jit, static_argnames=("use_cn",), donate_argnums=(2,))
        def fn(dit_params, cn_params, latents, timestep, sigma, sigma_next,
               context, y, control_latents, use_cn, extra=None, vace_layers=()):
            v = denoise_forward(
                dit_params, dit_cfg, latents, timestep, context, y=y,
                controlnet_params=cn_params if use_cn else None,
                controlnet_cfg=cn_cfg,
                control_latents=control_latents if use_cn else None,
                attn_impl=attn_impl, pp_microbatches=pp_micro,
                **ek(extra, vace_layers),
            )
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    @functools.cached_property
    def _sliding_window_step(self):
        """Temporal sliding-window denoise step (reference TemporalTiler path at
        model_fn_wan_video :1381-1405). Unlike the reference — whose tile loop
        drops the ControlNet states — the side-stack runs INSIDE each window on
        the window's slice of the control latents."""
        dit_cfg, cn_cfg = self.dit_cfg, self.cn_cfg
        attn_impl = self.attn_impl
        pp_micro = self.pp_microbatches

        @functools.partial(jax.jit, static_argnames=("use_cn", "window", "stride"))
        def fn(dit_params, cn_params, latents, timestep, sigma, sigma_next,
               context2, y, control_latents, cfg_scale, use_cn, window, stride):
            t2 = jnp.concatenate([timestep, timestep], axis=0)

            def window_fn(lat_w, y_w, cl_w):
                b = lat_w.shape[0]
                x2 = jnp.concatenate([lat_w, lat_w], axis=0)
                y2 = None if y_w is None else jnp.concatenate([y_w, y_w], axis=0)
                cl2 = None if (cl_w is None or not use_cn) else \
                    jnp.concatenate([cl_w, cl_w], axis=0)
                v = denoise_forward(
                    dit_params, dit_cfg, x2, t2, context2, y=y2,
                    controlnet_params=cn_params if cl2 is not None else None,
                    controlnet_cfg=cn_cfg,
                    control_latents=cl2, attn_impl=attn_impl,
                    pp_microbatches=pp_micro,
                )
                return v[b:] + cfg_scale * (v[:b] - v[b:])

            v = temporal_tiled_forward(window_fn, latents, y, window, stride,
                                       control_latents if use_cn else None)
            return fm.euler_step(latents, v.astype(latents.dtype), sigma, sigma_next)

        return fn

    # ------------------------------------------------------------------
    # Conditioning
    # ------------------------------------------------------------------

    def encode_prompts(self, prompts) -> jnp.ndarray:
        ids, mask = self.tokenizer(prompts)
        return self._encode_text(self.params["t5"], jnp.asarray(ids), jnp.asarray(mask))


    # -- VAE entry points: tiled when the latent grid exceeds one tile -------

    def _vae_encode_px(self, x):
        """(B, F, H, W, 3) pixels in [-1,1] -> latents; tiled above one tile
        (reference tiled=True default)."""
        pc = self.pipe_cfg
        if pc.tiled and (x.shape[2] // 8 > pc.tile_size[0]
                         or x.shape[3] // 8 > pc.tile_size[1]):
            return vaem.encode_video_tiled(self.params["vae"], self.vae_cfg, x,
                                           pc.tile_size, pc.tile_stride)
        return self._encode_vae(self.params["vae"], x)

    def _vae_decode_full(self, latents):
        pc = self.pipe_cfg
        if pc.tiled and (latents.shape[2] > pc.tile_size[0]
                         or latents.shape[3] > pc.tile_size[1]):
            return vaem.decode_video_tiled(self.params["vae"], self.vae_cfg,
                                           latents, pc.tile_size, pc.tile_stride)
        return self._decode_vae(self.params["vae"], latents)

    def encode_first_frame(self, image: np.ndarray, num_frames: int,
                           end_image: Optional[np.ndarray] = None) -> jnp.ndarray:
        """image (H, W, 3) float in [0,1] -> y (1, L, h, w, 20).

        end_image enables first-last-frame conditioning (reference
        WanVideoUnit_ImageEmbedderVAE :901-907: last pixel frame filled, mask[-1]=1)."""
        h, w = image.shape[:2]
        img = jnp.asarray(image, jnp.float32)[None, None] * 2.0 - 1.0  # (1,1,H,W,3)
        if end_image is not None:
            end = jnp.asarray(end_image, jnp.float32)[None, None] * 2.0 - 1.0
            vae_in = jnp.concatenate(
                [img, jnp.zeros((1, num_frames - 2, h, w, 3), jnp.float32), end], axis=1
            )
        else:
            vae_in = jnp.concatenate(
                [img, jnp.zeros((1, num_frames - 1, h, w, 3), jnp.float32)], axis=1
            )
        cond = self._vae_encode_px(vae_in)
        lat_f = (num_frames - 1) // 4 + 1
        mask = build_i2v_mask(num_frames, lat_f, cond.shape[2], cond.shape[3],
                              last_frame=end_image is not None)
        y = jnp.concatenate([jnp.asarray(mask)[None], cond.astype(jnp.float32)], axis=-1)
        return y.astype(self.dtype)

    def encode_control_video(self, control_video: np.ndarray) -> jnp.ndarray:
        """(F, H, W, 3) in [0,1] -> latents (1, L, h, w, 16)
        (reference WanVideoUnit_ControlVideoEmbedder :791-805; values mapped to [-1,1]
        by the shared video preprocessing)."""
        x = jnp.asarray(control_video, jnp.float32)[None] * 2.0 - 1.0
        return self._vae_encode_px(x).astype(self.dtype)

    def _build_vace_context(self, vace_video, vace_video_mask, vace_reference_image,
                            num_frames: int, h: int, w: int) -> jnp.ndarray:
        """VACE conditioning tensor (1, F'(+1), h/8, w/8, 96): VAE-encoded
        inactive/reactive splits (32ch) ++ 8x8 pixel-shuffled mask latents (64ch),
        optionally with an encoded reference frame prepended
        (reference WanVideoUnit_VACE :1051-1100)."""
        if vace_video is not None and np.shape(vace_video)[0] != num_frames:
            raise ValueError(f"vace_video has {np.shape(vace_video)[0]} frames, "
                             f"expected num_frames={num_frames}")
        if vace_video_mask is not None and np.shape(vace_video_mask)[0] != num_frames:
            raise ValueError(f"vace_video_mask has {np.shape(vace_video_mask)[0]} "
                             f"frames, expected num_frames={num_frames}")
        if vace_video is None:
            # the reference's default is zeros in *preprocessed* ([-1,1]) space (:1068)
            vid = jnp.zeros((1, num_frames, h, w, 3), jnp.float32)
        else:
            vid = jnp.asarray(vace_video, jnp.float32)[None] * 2.0 - 1.0
        if vace_video_mask is None:
            mask_px = np.ones((num_frames, h, w), np.float32)
        else:
            mask_px = np.asarray(vace_video_mask, np.float32)
            if mask_px.ndim == 4:
                mask_px = mask_px[..., 0]
        m = jnp.asarray(mask_px)[None, ..., None]             # (1, F, H, W, 1)
        inactive = self._vae_encode_px(vid * (1.0 - m))
        reactive = self._vae_encode_px(vid * m)
        video_lat = jnp.concatenate([inactive, reactive], axis=-1)  # (1, f, h8, w8, 32)

        # mask latents: "T (H P) (W Q) -> (P Q) T H W" with P=Q=8, then nearest-exact
        # temporal resize T -> (T+3)//4 (reference :1082-1084)
        h8, w8 = h // 8, w // 8
        ml = mask_px.reshape(num_frames, h8, 8, w8, 8).transpose(2, 4, 0, 1, 3)
        ml = ml.reshape(64, num_frames, h8, w8)
        t_out = (num_frames + 3) // 4
        idx = np.minimum((np.floor((np.arange(t_out) + 0.5) * num_frames / t_out))
                         .astype(np.int64), num_frames - 1)
        ml = ml[:, idx].transpose(1, 2, 3, 0)[None]           # (1, t_out, h8, w8, 64)

        if vace_reference_image is not None:
            ref = jnp.asarray(vace_reference_image, jnp.float32)[None, None] * 2.0 - 1.0
            ref_lat = self._vae_encode_px(ref)                # (1, 1, h8, w8, 16)
            ref_lat = jnp.concatenate([ref_lat, jnp.zeros_like(ref_lat)], axis=-1)
            video_lat = jnp.concatenate([ref_lat, video_lat], axis=1)
            ml = np.concatenate([np.zeros_like(ml[:, :1]), ml], axis=1)
        return jnp.concatenate([video_lat, jnp.asarray(ml, video_lat.dtype)],
                               axis=-1).astype(self.dtype)

    def _build_extra_conditioning(self, reference_image, camera_control_direction,
                                  camera_control_speed, camera_control_origin,
                                  motion_bucket_id, vace_video, vace_video_mask,
                                  vace_reference_image, num_frames, h, w,
                                  vace_scale: float = 1.0) -> Dict:
        """Adapter conditionings dict for denoise_forward (the reference's
        SpeedControl / FunReference / FunCameraControl / VACE units)."""
        extra: Dict = {}
        if motion_bucket_id is not None:
            if "motion_controller" not in self.params:
                raise ValueError("motion_bucket_id requires motion_controller weights "
                                 "(from_pretrained(motion_controller_path=...))")
            from goal_force_tpu.models.adapters import motion_controller_apply

            mc = self.params["motion_controller"]
            off = motion_controller_apply(
                mc, jnp.asarray([float(motion_bucket_id)], jnp.float32),
                freq_dim=mc["fc0"]["w"].shape[0])
            extra["t_mod_offset"] = off.reshape(1, 6, -1)
        if reference_image is not None:
            ref = jnp.asarray(reference_image, jnp.float32)[None, None] * 2.0 - 1.0
            extra["reference_latents"] = self._vae_encode_px(ref)[:, 0].astype(self.dtype)
        if camera_control_direction is not None:
            if "camera_adapter" not in self.params:
                raise ValueError("camera control requires camera_adapter weights "
                                 "(from_pretrained(camera_adapter_path=...))")
            from goal_force_tpu.models.camera_controller import (
                DEFAULT_ORIGIN,
                camera_control_embedding,
                simple_adapter_apply,
            )

            origin = DEFAULT_ORIGIN if camera_control_origin is None else camera_control_origin
            emb = camera_control_embedding(camera_control_direction, num_frames, h, w,
                                           camera_control_speed, origin)  # (F, H, W, 6)
            # temporal grouping: frame 0 x4 then groups of 4 -> 24 channels, channel-major
            # (c, sub-frame) order (reference WanVideoUnit_FunCameraControl :1004-1012)
            lf = (num_frames - 1) // 4 + 1
            grouped = np.concatenate([np.repeat(emb[:1], 4, axis=0), emb[1:]], axis=0)
            grouped = grouped.reshape(lf, 4, h, w, 6).transpose(0, 2, 3, 4, 1)
            grouped = grouped.reshape(lf, h, w, 24)
            feats = simple_adapter_apply(self.params["camera_adapter"],
                                         jnp.asarray(grouped, self.dtype),
                                         stride=self.dit_cfg.patch_size[1])
            extra["camera_embedding"] = feats.reshape(1, -1, feats.shape[-1])
        if (vace_video is not None or vace_video_mask is not None
                or vace_reference_image is not None):
            if "vace" not in self.params:
                raise ValueError("VACE conditioning requires vace weights "
                                 "(from_pretrained(vace_path=...))")
            extra["vace_context"] = self._build_vace_context(
                vace_video, vace_video_mask, vace_reference_image, num_frames, h, w)
            extra["vace_params"] = self.params["vace"]
            extra["vace_scale"] = float(vace_scale)
        return extra

    # ------------------------------------------------------------------
    # Generation
    # ------------------------------------------------------------------

    def __call__(self, *args, **kwargs) -> np.ndarray:
        """Generate one clip (see _generate for the full signature). Runs with the
        pipeline's mesh ambient so activation constraints become GSPMD hints."""
        from goal_force_tpu.parallel import use_mesh

        with use_mesh(self.mesh):
            return self._generate(*args, **kwargs)

    def generate_batch(self, *args, **kwargs) -> np.ndarray:
        """Batched multi-clip generation (see _generate_batch); batch axis maps onto
        the mesh "dp" axis."""
        from goal_force_tpu.parallel import use_mesh

        with use_mesh(self.mesh):
            return self._generate_batch(*args, **kwargs)

    def _generate(
        self,
        prompt: str,
        input_image: Optional[np.ndarray] = None,  # (H, W, 3) float [0,1]; None = t2v
        control_signal_video: Optional[np.ndarray] = None,  # (F, H, W, 3) float [0,1]
        negative_prompt: Optional[str] = None,
        end_image: Optional[np.ndarray] = None,             # first-last-frame mode
        input_video: Optional[np.ndarray] = None,           # (F, H, W, 3) v2v mode
        fun_control_video: Optional[np.ndarray] = None,     # Fun-Control y-concat mode
        reference_image: Optional[np.ndarray] = None,       # (H, W, 3) Fun-Reference
        camera_control_direction: Optional[str] = None,     # Left/Right/Up/... (:989)
        camera_control_speed: float = 1 / 54,
        camera_control_origin=None,
        motion_bucket_id: Optional[float] = None,           # speed control (:1039-1047)
        vace_video: Optional[np.ndarray] = None,            # (F, H, W, 3) float [0,1]
        vace_video_mask: Optional[np.ndarray] = None,       # (F, H, W[, 1]) float [0,1]
        vace_reference_image: Optional[np.ndarray] = None,  # (H, W, 3) float [0,1]
        vace_scale: float = 1.0,
        denoising_strength: float = 1.0,
        seed: int = 0,
        height: Optional[int] = None,         # used when input_image is None (t2v)
        width: Optional[int] = None,
        num_frames: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        sigma_shift: Optional[float] = None,
        switch_dit_boundary: Optional[float] = None,
        controlnet: bool = True,
        tea_cache_l1_thresh: Optional[float] = None,
        tea_cache_model_id: str = "Wan2.1-I2V-14B-480P",
        sliding_window_size: Optional[int] = None,
        sliding_window_stride: Optional[int] = None,
        tiled: Optional[bool] = None,         # per-call VAE tiling override
        tile_size: Optional[tuple] = None,    # latent units (reference :649)
        tile_stride: Optional[tuple] = None,
        progress: bool = False,
    ) -> np.ndarray:
        """Returns (F, H, W, 3) float32 frames in [0, 1]."""
        if tiled is not None or tile_size is not None or tile_stride is not None:
            # per-call tiling override (reference __call__ tiled/tile_size/
            # tile_stride kwargs :648-650); the VAE entry points read pipe_cfg
            overrides = {k: v for k, v in
                         [("tiled", tiled), ("tile_size", tile_size),
                          ("tile_stride", tile_stride)] if v is not None}
            saved = self.pipe_cfg
            self.pipe_cfg = dataclasses.replace(saved, **overrides)
            try:
                return self._generate(
                    prompt, input_image, control_signal_video, negative_prompt,
                    end_image, input_video, fun_control_video, reference_image,
                    camera_control_direction, camera_control_speed,
                    camera_control_origin, motion_bucket_id, vace_video,
                    vace_video_mask, vace_reference_image, vace_scale,
                    denoising_strength, seed, height, width, num_frames,
                    num_inference_steps, cfg_scale, sigma_shift,
                    switch_dit_boundary, controlnet, tea_cache_l1_thresh,
                    tea_cache_model_id, sliding_window_size,
                    sliding_window_stride, progress=progress)
            finally:
                self.pipe_cfg = saved
        pc = self.pipe_cfg
        num_frames = num_frames or pc.num_frames
        steps = num_inference_steps or pc.num_inference_steps
        cfg_scale = pc.cfg_scale if cfg_scale is None else cfg_scale
        shift = sigma_shift or pc.sigma_shift
        boundary = switch_dit_boundary or pc.switch_dit_boundary
        negative_prompt = pc.negative_prompt if negative_prompt is None else negative_prompt

        schedule = fm.make_schedule(num_steps=steps, shift=shift, sigma_min=0.0,
                                    extra_one_step=True,
                                    denoising_strength=denoising_strength)

        # Conditioning
        ctx = self.encode_prompts([prompt, negative_prompt])  # (2, L, text_dim)
        if input_image is not None:
            y = self.encode_first_frame(input_image, num_frames, end_image=end_image)
            h, w = input_image.shape[:2]
        else:
            # t2v / VACE mode: no first-frame conditioning channels
            # (reference WanVideoUnit_ImageEmbedderVAE no-ops when input_image is None).
            if self.dit_cfg.in_dim != self.vae_cfg.z_dim and fun_control_video is None:
                raise ValueError(
                    "this DiT expects first-frame conditioning "
                    f"(in_dim {self.dit_cfg.in_dim} > z_dim {self.vae_cfg.z_dim}); "
                    "pass input_image")
            y = None
            if height is None or width is None:
                raise ValueError("height/width are required when input_image is None")
            h, w = height, width
        if fun_control_video is not None:
            # Fun-Control: control latents concat into y's leading channels
            # (reference WanVideoUnit_FunControl :942-963).
            if fun_control_video.shape[0] != num_frames:
                raise ValueError(
                    f"fun_control_video has {fun_control_video.shape[0]} frames, "
                    f"expected num_frames={num_frames}")
            fc = self.encode_control_video(fun_control_video)
            y_dim = self.dit_cfg.in_dim - self.vae_cfg.z_dim - fc.shape[-1]
            if y is None:
                # no first frame: zero conditioning channels (reference :958-960)
                y = jnp.zeros(fc.shape[:-1] + (y_dim,), fc.dtype)
            y = jnp.concatenate([fc, y[..., -y_dim:]], axis=-1)
        use_cn = controlnet and control_signal_video is not None and "controlnet" in self.params
        if use_cn and control_signal_video.shape[0] != num_frames:
            raise ValueError(
                f"control_signal_video has {control_signal_video.shape[0]} frames, "
                f"expected num_frames={num_frames}"
            )
        control_latents = (
            self.encode_control_video(control_signal_video) if use_cn else None
        )

        # Adapter conditionings (motion / Fun-Reference / camera / VACE)
        extra = self._build_extra_conditioning(
            reference_image, camera_control_direction, camera_control_speed,
            camera_control_origin, motion_bucket_id,
            vace_video, vace_video_mask, vace_reference_image,
            num_frames, h, w, vace_scale=vace_scale,
        )
        if extra and (sliding_window_size is not None or fun_control_video is not None
                      or tea_cache_l1_thresh is not None):
            raise NotImplementedError(
                "motion/reference/camera/VACE conditioning cannot combine with the "
                "sliding-window, Fun-Control, or TeaCache paths")
        if camera_control_direction is not None and input_image is not None:
            # Camera checkpoints (in_dim = 2*z) take a mask-less y: zeros with
            # frame 0 = the single-frame encode of the input image (reference
            # WanVideoUnit_FunCameraControl :1016-1022; the 4+z i2v y built above
            # is the reference's own fallback for in_dim = 4+2z models :1024-1034).
            z = self.vae_cfg.z_dim
            if self.dit_cfg.in_dim - z == z:
                img1 = self._vae_encode_px(
                    jnp.asarray(input_image, jnp.float32)[None, None] * 2.0 - 1.0)
                lf = (num_frames - 1) // 4 + 1
                y = jnp.zeros((1, lf) + img1.shape[2:], img1.dtype).at[:, :1].set(img1)
                y = y.astype(self.dtype)
        vace_ref = vace_reference_image is not None
        if vace_ref and y is not None:
            raise NotImplementedError(
                "vace_reference_image needs a t2v (no first-frame conditioning) model; "
                "omit input_image (reference runs VACE on Wan-T2V checkpoints)")

        # Noise (jax PRNG; the reference uses CPU torch.randn — RNG streams differ by
        # design, parity is checked with imported noise in tests)
        lat_f = (num_frames - 1) // 4 + 1 + (1 if vace_ref else 0)
        shape = (1, lat_f, h // 8, w // 8, self.vae_cfg.z_dim)
        latents = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32).astype(self.dtype)
        if vace_ref:
            # the reference rolls the last noise frame to the front for the
            # prepended VACE reference frame (WanVideoUnit_NoiseInitializer :761-762)
            latents = jnp.concatenate([latents[:, -1:], latents[:, :-1]], axis=1)
        if input_video is not None:
            # v2v: start from the noised input video at the first schedule sigma
            # (reference WanVideoUnit_InputVideoEmbedder :774-788).
            iv = jnp.asarray(input_video, jnp.float32)[None] * 2.0 - 1.0
            input_latents = self._encode_vae(self.params["vae"], iv).astype(self.dtype)
            if vace_ref:
                # prepend the encoded reference frame (reference :780-783)
                ref = jnp.asarray(vace_reference_image, jnp.float32)[None, None] * 2.0 - 1.0
                ref_lat = self._encode_vae(self.params["vae"], ref).astype(self.dtype)
                input_latents = jnp.concatenate([ref_lat, input_latents], axis=1)
            latents = fm.add_noise(input_latents, latents, schedule.sigmas[0])

        y2 = None if y is None else jnp.concatenate([y, y], axis=0)
        cl2 = jnp.concatenate([control_latents] * 2, axis=0) if use_cn else None
        # merged-CFG copies of the per-sample conditionings (vace params/scale broadcast)
        _batched = ("t_mod_offset", "reference_latents", "camera_embedding", "vace_context")
        extra2 = {k: (jnp.concatenate([v, v], axis=0) if k in _batched else v)
                  for k, v in extra.items()}

        tea_cache = None
        if tea_cache_l1_thresh is not None:
            from goal_force_tpu.pipelines.teacache import TeaCache

            tea_cache = TeaCache(steps, tea_cache_l1_thresh, tea_cache_model_id)

        switch_t = boundary * schedule.num_train_timesteps

        if sliding_window_size is None and tea_cache is None and not progress:
            # Fused production path: one lax.scan per expert phase (high-noise
            # steps, then low-noise) — the whole phase is a single XLA
            # computation, so per-step dispatch/host-sync overhead drops out
            # (bench.py's fused-loop saving). TeaCache and sliding windows
            # need host-side per-step control flow and keep the loop below;
            # progress=True also keeps it for per-step tqdm feedback.
            if cfg_scale != 1.0:
                step_fn = lambda dit_p, cn_p, lat, t, s, sn: self._denoise_phase(
                    dit_p, cn_p, lat, t, s, sn, ctx, y2, cl2, cfg_scale, use_cn,
                    extra2, vace_layers=self.vace_layers)
            else:
                step_fn = lambda dit_p, cn_p, lat, t, s, sn: self._denoise_phase_nocfg(
                    dit_p, cn_p, lat, t, s, sn, ctx[:1], y, control_latents,
                    use_cn, extra, vace_layers=self.vace_layers)
            fused = self._run_fused_phases(latents, schedule, switch_t, use_cn,
                                           step_fn)
            if fused is not None:
                latents = fused
                if vace_ref:
                    latents = latents[:, 1:]  # drop the VACE reference frame
                video = self._vae_decode_full(latents.astype(jnp.float32))
                return np.asarray((video[0] + 1.0) / 2.0, np.float32)

        it = range(len(schedule))
        if progress:
            import tqdm

            it = tqdm.tqdm(it)
        for i in it:
            t_val = float(schedule.timesteps[i])
            dit_p, cn_p = self._expert(low_noise=t_val < switch_t)
            cn_p = cn_p if use_cn else None
            tstep = jnp.full((latents.shape[0],), t_val, self.dtype)
            sig, sig_n = schedule.sigmas[i], schedule.sigma_next(i)

            if sliding_window_size is not None and sliding_window_stride is not None:
                latents = self._sliding_window_step(
                    dit_p, cn_p, latents, tstep, sig, sig_n, ctx, y, control_latents,
                    cfg_scale, use_cn, sliding_window_size, sliding_window_stride,
                )
                continue

            if tea_cache is not None and cfg_scale != 1.0:
                t_mod = self._t_mod(dit_p, jnp.concatenate([tstep, tstep]))
                if tea_cache.should_skip(t_mod) and tea_cache.residual is not None:
                    latents = self._denoise_step_tc_skip(
                        dit_p, latents, tstep, sig, sig_n, y2, tea_cache.residual, cfg_scale
                    )
                else:
                    latents, residual = self._denoise_step_tc_full(
                        dit_p, cn_p, latents, tstep, sig, sig_n, ctx, y2, cl2,
                        cfg_scale, use_cn, extra2, vace_layers=self.vace_layers,
                    )
                    tea_cache.residual = residual
                continue

            if cfg_scale != 1.0:
                latents = self._denoise_step(
                    dit_p, cn_p, latents, tstep, sig, sig_n, ctx, y2, cl2,
                    cfg_scale, use_cn, extra2, vace_layers=self.vace_layers,
                )
            else:
                latents = self._denoise_step_nocfg(
                    dit_p, cn_p, latents, tstep, sig, sig_n,
                    ctx[:1], y, control_latents, use_cn, extra,
                    vace_layers=self.vace_layers,
                )

        if vace_ref:
            latents = latents[:, 1:]  # drop the VACE reference frame (reference :726-727)
        video = self._vae_decode_full(latents.astype(jnp.float32))
        return np.asarray((video[0] + 1.0) / 2.0, np.float32)

    def _generate_batch(
        self,
        prompts,
        input_images,                       # (B, H, W, 3) float [0,1] or list
        control_signal_videos=None,         # (B, F, H, W, 3) or list, optional
        negative_prompt: Optional[str] = None,
        seeds=None,
        num_frames: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        sigma_shift: Optional[float] = None,
        controlnet: bool = True,
        progress: bool = False,
    ) -> np.ndarray:
        """Multi-clip batched generation: the batch axis maps onto the mesh "dp" axis —
        this replaces the reference's one-process-per-GPU CSV sharding
        (scripts/inference/utils.py:26-62) with a single jitted program.
        Returns (B, F, H, W, 3) float32 in [0, 1].

        Feature subset (throughput path): first-frame conditioning + ControlNet
        + merged CFG + the expert switch only. end_image, input_video, TeaCache,
        sliding-window denoising, and strided ControlNet are per-clip features —
        use __call__ for those (they either vary per clip or carry host-side
        state that does not batch)."""
        pc = self.pipe_cfg
        num_frames = num_frames or pc.num_frames
        steps = num_inference_steps or pc.num_inference_steps
        cfg_scale = pc.cfg_scale if cfg_scale is None else cfg_scale
        shift = sigma_shift or pc.sigma_shift
        negative_prompt = pc.negative_prompt if negative_prompt is None else negative_prompt

        images = np.stack([np.asarray(im, np.float32) for im in input_images])
        bsz = images.shape[0]
        assert len(prompts) == bsz
        seeds = seeds if seeds is not None else list(range(bsz))

        schedule = fm.make_schedule(num_steps=steps, shift=shift, sigma_min=0.0,
                                    extra_one_step=True)
        ctx_all = self.encode_prompts(list(prompts) + [negative_prompt])
        ctx2 = jnp.concatenate(
            [ctx_all[:bsz], jnp.repeat(ctx_all[bsz:], bsz, axis=0)], axis=0
        )  # (2B, L, D): posi rows then repeated negative
        y = jnp.concatenate(
            [self.encode_first_frame(images[i], num_frames) for i in range(bsz)], axis=0
        )
        use_cn = (controlnet and control_signal_videos is not None
                  and "controlnet" in self.params)
        cl = None
        if use_cn:
            cl = jnp.concatenate(
                [self.encode_control_video(np.asarray(cv, np.float32))
                 for cv in control_signal_videos], axis=0
            )
        h, w = images.shape[1:3]
        lat_f = (num_frames - 1) // 4 + 1
        latents = jnp.concatenate([
            jax.random.normal(jax.random.PRNGKey(int(s)),
                              (1, lat_f, h // 8, w // 8, self.vae_cfg.z_dim), jnp.float32)
            for s in seeds
        ], axis=0).astype(self.dtype)
        y2 = jnp.concatenate([y, y], axis=0)
        cl2 = jnp.concatenate([cl, cl], axis=0) if use_cn else None

        switch_t = pc.switch_dit_boundary * schedule.num_train_timesteps
        fused = None
        if not progress:
            fused = self._run_fused_phases(
                latents, schedule, switch_t, use_cn,
                lambda dit_p, cn_p, lat, t, s, sn: self._denoise_phase(
                    dit_p, cn_p, lat, t, s, sn, ctx2, y2, cl2, cfg_scale, use_cn))
        if fused is not None:
            latents = fused
        else:
            it = range(len(schedule))
            if progress:
                import tqdm

                it = tqdm.tqdm(it)
            for i in it:
                t_val = float(schedule.timesteps[i])
                dit_p, cn_p = self._expert(low_noise=t_val < switch_t)
                cn_p = cn_p if use_cn else None
                tstep = jnp.full((bsz,), t_val, self.dtype)
                latents = self._denoise_step(
                    dit_p, cn_p, latents, tstep, schedule.sigmas[i],
                    schedule.sigma_next(i), ctx2, y2, cl2, cfg_scale, use_cn,
                )
        video = self._vae_decode_full(latents.astype(jnp.float32))
        return np.asarray((video + 1.0) / 2.0, np.float32)
