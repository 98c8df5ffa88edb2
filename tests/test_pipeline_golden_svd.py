"""Pipeline-LEVEL golden parity for the SVD video family.

SVD has the most intricate loop composition in the zoo: EDM continuous-ODE
scheduler (diffsynth/schedulers/continuous_ode.py), per-frame linear CFG
ramp, noise-augmented VAE image conditioning concatenated per frame,
add_time_id conditioning, post-normalize + contrast enhancement, and a
temporal-mix VAE decoder (diffsynth/pipelines/svd_video.py:111-190). None of
the per-model tests covered the ODE scheduler or the SVD VAE decoder; this
drives the reference's own scheduler + SVDUNet + SVDVAEDecoder blocks on
tiny weights against `SVDVideoPipeline.__call__` with identical converted
weights, conditioning, and initial noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

from goal_force_tpu.models.svd_unet import svd_unet_params_from_torch, tiny_svd_plan
from goal_force_tpu.models.svd_vae import svd_vae_decoder_params_from_torch
from goal_force_tpu.pipelines.svd_video import SVDVideoPipeline

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

T_FRAMES, HW, STEPS, SEED = 4, 64, 5, 3
DEC_PLAN = (("res", 8, 8), ("tres", 8), ("vattn", 8),
            ("res", 8, 8), ("tres", 8), ("up", 8),
            ("res", 8, 8), ("tres", 8))


def _torch_tiny_decoder():
    """Tiny SVDVAEDecoder matching DEC_PLAN (reference svd_vae_decoder.py:
    71-121 structure at groups=4/dim 8)."""
    import torch

    ref_svd_vae = Z.refmodels("svd_vae_decoder")
    ref_sd_unet = Z.refmodels("sd_unet")

    torch.manual_seed(5)
    blocks = []
    for spec in DEC_PLAN:
        kind = spec[0]
        if kind == "res":
            blocks.append(ref_sd_unet.ResnetBlock(spec[1], spec[2], None,
                                                  groups=4, eps=1e-6))
        elif kind == "tres":
            blocks.append(ref_svd_vae.TemporalResnetBlock(spec[1], spec[1],
                                                          groups=4, eps=1e-6))
        elif kind == "vattn":
            blocks.append(ref_svd_vae.VAEAttentionBlock(
                1, spec[1], spec[1], 1, norm_num_groups=4, eps=1e-6))
        elif kind == "up":
            blocks.append(ref_sd_unet.UpSampler(spec[1]))

    m = ref_svd_vae.SVDVAEDecoder.__new__(ref_svd_vae.SVDVAEDecoder)
    torch.nn.Module.__init__(m)
    m.scaling_factor = 0.18215
    m.conv_in = torch.nn.Conv2d(4, 8, 3, padding=1)
    m.blocks = torch.nn.ModuleList(blocks)
    m.conv_norm_out = torch.nn.GroupNorm(num_channels=8, num_groups=4,
                                         eps=1e-5)
    m.conv_act = torch.nn.SiLU()
    m.conv_out = torch.nn.Conv2d(8, 3, 3, padding=1)
    m.time_conv_out = torch.nn.Conv3d(3, 3, kernel_size=(3, 1, 1),
                                      padding=(1, 0, 0))
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.1
    return m.eval().float()


def test_svd_pipeline_matches_reference_loop():
    import torch

    from test_svd_unet import _torch_tiny_svd

    ref_sched_mod = load_reference_module(
        "diffsynth/schedulers/continuous_ode.py", "ref_continuous_ode")

    plan = tiny_svd_plan()
    unet_t = _torch_tiny_svd(plan)
    dec_t = _torch_tiny_decoder()

    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    unet_p = jax.tree_util.tree_map(
        jnp.asarray, svd_unet_params_from_torch(sd(unet_t), plan))
    dec_p = jax.tree_util.tree_map(
        jnp.asarray, svd_vae_decoder_params_from_torch(sd(dec_t), DEC_PLAN))

    # fixed conditioning shared by both sides (the CLIP tower and VAE encoder
    # have their own golden tests; here they are injected callables)
    rng = np.random.default_rng(0)
    clip_emb = rng.normal(size=(1, 16)).astype(np.float32)
    img_lat = rng.normal(size=(1, HW // 8, HW // 8, 4)).astype(np.float32)
    image = rng.uniform(-1, 1, (HW, HW, 3)).astype(np.float32)

    pipe = SVDVideoPipeline(
        unet=unet_p, vae_decoder=dec_p, plan=plan, vae_dec_plan=DEC_PLAN,
        groups=4, vae_groups=4, clip_dim=16,
        encode_image=lambda img: clip_emb,
        encode_image_latent=lambda img: img_lat,
    )
    ours = pipe(image, num_frames=T_FRAMES, height=HW, width=HW,
                min_cfg_scale=1.0, max_cfg_scale=3.0, fps=7,
                motion_bucket_id=127, noise_aug_strength=0.0,
                num_inference_steps=STEPS, seed=SEED)

    # --- reference loop (svd_video.py:111-190), its scheduler + modules ---
    # the pipeline draws its latent noise from the FIRST split of the seed
    # key (svd_video.py __call__: k1, k2 = split(key))
    k1, _ = jax.random.split(jax.random.PRNGKey(SEED))
    noise = np.asarray(jax.random.normal(
        k1, (T_FRAMES, HW // 8, HW // 8, 4), jnp.float32))
    lat = torch.tensor(noise.transpose(0, 3, 1, 2))
    img_lat_t = torch.tensor(np.broadcast_to(
        img_lat.transpose(0, 3, 1, 2), (T_FRAMES, 4, HW // 8, HW // 8)).copy())
    clip_t = torch.tensor(clip_emb)
    zeros_lat, zeros_clip = torch.zeros_like(img_lat_t), torch.zeros_like(clip_t)
    cfg = torch.linspace(1.0, 3.0, T_FRAMES).reshape(T_FRAMES, 1, 1, 1)
    add_id = torch.tensor([7 - 1, 127, 0.0])

    sched = ref_sched_mod.ContinuousODEScheduler()
    sched.set_timesteps(STEPS)
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            posi = unet_t(torch.cat([lat, img_lat_t], dim=1), t, clip_t,
                          add_id)
            nega = unet_t(torch.cat([lat, zeros_lat], dim=1), t, zeros_clip,
                          add_id)
            eps = nega + cfg * (posi - nega)
            lat = sched.step(eps, t, lat)
        # post_process_latents (:102-108) + decode_video (single tiny tile ==
        # forward; the blend mask is 1 everywhere when every bound is an edge)
        mean, std = lat.mean(), lat.std()
        lat = (lat - lat.mean(dim=[1, 2, 3], keepdim=True)) \
            / lat.std(dim=[1, 2, 3], keepdim=True) * std + mean
        lat = lat * 1.2
        # decode_video == forward for a single tile (build_mask is 1 at every
        # bound), and its H*8 accumulator hardcodes the real x8 upsampling —
        # the tiny plan upsamples x2, so call forward directly
        video = dec_t(lat.permute(1, 0, 2, 3))
    ref = ((video.numpy().transpose(1, 2, 3, 0) + 1.0) / 2.0).clip(0.0, 1.0)

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-2)
