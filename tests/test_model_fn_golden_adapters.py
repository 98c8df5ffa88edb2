"""Golden parity for the COMPOSED adapter paths of denoise_forward against the
reference's own model_fn_wan_video (/root/reference/src/goal_force/
wan_video_new.py:1349-1591) — run directly via import-time stubs for the
reference's unavailable CUDA-era deps (modelscope/torchvision/sentencepiece/
ftfy; read-only behavioral study).

The per-adapter modules have their own golden tests (test_adapters.py,
test_camera_controller.py); what only this file catches is composition drift:
the ref-token prepend + (f+1)-frame rope layout, the camera features' landing
spot relative to patchify, the motion t_mod offset point, and the VACE
segment execution between injection layers.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib.machinery
    import sys
    import types

    def _fake(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _ident = lambda *a, **k: (lambda x: x)
    _fake("modelscope", snapshot_download=lambda *a, **k: None)
    _tv = _fake("torchvision")
    _tvt = _fake("torchvision.transforms", Compose=lambda fns: (lambda x: x),
                 Resize=_ident, CenterCrop=_ident, ToTensor=_ident,
                 Normalize=_ident, GaussianBlur=_ident,
                 InterpolationMode=types.SimpleNamespace(BICUBIC=3))
    _tv.transforms = _tvt
    _fake("sentencepiece", SentencePieceProcessor=object)
    _fake("ftfy", fix_text=lambda s: s)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    ref_pipe = pytest.importorskip("src.goal_force.wan_video_new")

from goal_force_tpu.configs import WanDiTConfig
from goal_force_tpu.io.torch_convert import dit_params_from_torch
from goal_force_tpu.models.adapters import (
    motion_controller_apply,
    motion_controller_from_torch,
    vace_from_torch,
)
from goal_force_tpu.models.camera_controller import (
    simple_adapter_apply,
    simple_adapter_params_from_torch,
)
from goal_force_tpu.pipelines.model_fn import denoise_forward

F_LAT, H_LAT, W_LAT, Z = 3, 4, 4, 16
L_TXT = 7


def _dit_cfg(in_dim=Z):
    return WanDiTConfig(dim=96, in_dim=in_dim, ffn_dim=128, out_dim=Z,
                        text_dim=32, freq_dim=32, num_heads=4, num_layers=2,
                        rope_max_len=64)


def _make_dit(cfg, seed=0, **kw):
    import torch

    torch.manual_seed(seed)
    return ref_pipe.WanModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, has_image_input=False, **kw,
    ).eval().float()


def _params(dit_t, cfg):
    sd = {k: v.detach().numpy() for k, v in dit_t.state_dict().items()}
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                  dit_params_from_torch(sd, cfg))


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    lat = rng.normal(size=(1, F_LAT, H_LAT, W_LAT, Z)).astype(np.float32) * 0.4
    ctx = rng.normal(size=(1, L_TXT, 32)).astype(np.float32) * 0.4
    ts = np.array([421.0], np.float32)
    return lat, ctx, ts


def _torch_lat(lat):
    import torch

    return torch.from_numpy(np.ascontiguousarray(lat.transpose(0, 4, 1, 2, 3)))


def test_reference_latents_composition_golden():
    """Fun-Reference: ref_conv token prepend + (f+1)-frame rope + strip."""
    import torch

    cfg = _dit_cfg()
    dit_t = _make_dit(cfg, seed=0, has_ref_conv=True)
    params = _params(dit_t, cfg)
    lat, ctx, ts = _inputs(0)
    rl = np.random.default_rng(1).normal(size=(1, H_LAT, W_LAT, Z)).astype(np.float32) * 0.4

    with torch.no_grad():
        ref = ref_pipe.model_fn_wan_video(
            dit_t, latents=_torch_lat(lat), timestep=torch.from_numpy(ts),
            context=torch.from_numpy(ctx),
            reference_latents=torch.from_numpy(
                np.ascontiguousarray(rl.transpose(0, 3, 1, 2))),
        ).numpy().transpose(0, 2, 3, 4, 1)

    got = denoise_forward(params, cfg, jnp.asarray(lat), jnp.asarray(ts),
                          jnp.asarray(ctx), reference_latents=jnp.asarray(rl))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-4)


def test_camera_adapter_composition_golden():
    """Fun-Camera: SimpleAdapter features land on the patch embedding."""
    import torch

    cfg = _dit_cfg(in_dim=2 * Z)
    dit_t = _make_dit(cfg, seed=2, add_control_adapter=True,
                      in_dim_control_adapter=24)
    params = _params(dit_t, cfg)
    cam_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        simple_adapter_params_from_torch(
            {k.split("control_adapter.", 1)[1]: v.detach().numpy()
             for k, v in dit_t.state_dict().items() if "control_adapter." in k}))

    lat, ctx, ts = _inputs(2)
    rng = np.random.default_rng(3)
    y = rng.normal(size=(1, F_LAT, H_LAT, W_LAT, Z)).astype(np.float32) * 0.4
    # camera latents at pixel resolution (B, f, H*8, W*8, 24)
    cam = rng.normal(size=(F_LAT, H_LAT * 8, W_LAT * 8, 24)).astype(np.float32) * 0.2

    with torch.no_grad():
        ref = ref_pipe.model_fn_wan_video(
            dit_t, latents=_torch_lat(lat), timestep=torch.from_numpy(ts),
            context=torch.from_numpy(ctx), y=_torch_lat(y),
            control_camera_latents_input=torch.from_numpy(
                np.ascontiguousarray(cam.transpose(3, 0, 1, 2)))[None],
        ).numpy().transpose(0, 2, 3, 4, 1)

    feats = simple_adapter_apply(cam_params, jnp.asarray(cam),
                                 stride=cfg.patch_size[1])
    camera_embedding = feats.reshape(1, -1, feats.shape[-1])
    got = denoise_forward(params, cfg, jnp.asarray(lat), jnp.asarray(ts),
                          jnp.asarray(ctx), y=jnp.asarray(y),
                          camera_embedding=camera_embedding)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-4)


def test_motion_bucket_composition_golden():
    """SpeedControl: motion-controller offset added to t_mod before the blocks."""
    import torch

    cfg = _dit_cfg()
    dit_t = _make_dit(cfg, seed=4)
    params = _params(dit_t, cfg)
    torch.manual_seed(5)
    mc_t = ref_pipe.WanMotionControllerModel(freq_dim=32, dim=cfg.dim).eval().float()
    for p in mc_t.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    mc = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        motion_controller_from_torch(
            {k: v.detach().numpy() for k, v in mc_t.state_dict().items()}))

    lat, ctx, ts = _inputs(4)
    mb = np.array([42.0], np.float32)
    with torch.no_grad():
        ref = ref_pipe.model_fn_wan_video(
            dit_t, motion_controller=mc_t, latents=_torch_lat(lat),
            timestep=torch.from_numpy(ts), context=torch.from_numpy(ctx),
            motion_bucket_id=torch.from_numpy(mb),
        ).numpy().transpose(0, 2, 3, 4, 1)

    off = motion_controller_apply(mc, jnp.asarray(mb), freq_dim=32)
    got = denoise_forward(params, cfg, jnp.asarray(lat), jnp.asarray(ts),
                          jnp.asarray(ctx),
                          t_mod_offset=off.reshape(1, 6, cfg.dim))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-4)


def test_vace_composition_golden():
    """VACE: hint stack computed from the main tokens, injected after the
    configured layers with the scale, segments executed in between."""
    import torch

    cfg = _dit_cfg()
    layers = (0, 1)
    vace_in = 8
    dit_t = _make_dit(cfg, seed=6)
    params = _params(dit_t, cfg)
    torch.manual_seed(7)
    vace_t = ref_pipe.VaceWanModel(
        vace_layers=layers, vace_in_dim=vace_in, patch_size=cfg.patch_size,
        has_image_input=False, dim=cfg.dim, num_heads=cfg.num_heads,
        ffn_dim=cfg.ffn_dim, eps=cfg.eps,
    ).eval().float()
    vp = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        vace_from_torch({k: v.detach().numpy()
                         for k, v in vace_t.state_dict().items()}, cfg, layers))

    lat, ctx, ts = _inputs(6)
    vc = np.random.default_rng(7).normal(
        size=(1, F_LAT, H_LAT, W_LAT, vace_in)).astype(np.float32) * 0.4
    with torch.no_grad():
        ref = ref_pipe.model_fn_wan_video(
            dit_t, vace=vace_t, latents=_torch_lat(lat),
            timestep=torch.from_numpy(ts), context=torch.from_numpy(ctx),
            vace_context=torch.from_numpy(
                np.ascontiguousarray(vc.transpose(0, 4, 1, 2, 3))),
            vace_scale=0.7,
        ).numpy().transpose(0, 2, 3, 4, 1)

    got = denoise_forward(params, cfg, jnp.asarray(lat), jnp.asarray(ts),
                          jnp.asarray(ctx), vace_params=vp,
                          vace_context=jnp.asarray(vc), vace_scale=0.7,
                          vace_layers=layers)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-4)
