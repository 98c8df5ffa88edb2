"""WanS2V parity vs the reference torch implementation (tiny config, f32, CPU).

Motion tokens are exercised with drop_motion_frames semantics (the reference's forward
default); the FramePackMotioner pack path has structural tests only this round.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from goal_force_tpu.models import s2v as js2v

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refmodels", None, is_package=True)
    )
    pkg.__path__ = ["/root/reference/diffsynth/models"]
    sys.modules.setdefault("refmodels", pkg)
    ref_s2v = importlib.import_module("refmodels.wan_video_dit_s2v")


@pytest.fixture(scope="module")
def tiny():
    import torch

    torch.manual_seed(0)
    cfg = js2v.tiny_s2v(num_layers=2)
    model = ref_s2v.WanS2VModel(
        dim=cfg.dim, in_dim=cfg.in_dim, ffn_dim=cfg.ffn_dim, out_dim=cfg.out_dim,
        text_dim=cfg.text_dim, freq_dim=cfg.freq_dim, eps=cfg.eps,
        patch_size=cfg.patch_size, num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        cond_dim=cfg.cond_dim, audio_dim=cfg.audio_dim,
        num_audio_token=cfg.num_audio_token,
        audio_inject_layers=list(cfg.audio_inject_layers),
    ).float().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                    js2v.s2v_params_from_torch(sd, cfg))
    return cfg, model, params


def test_audio_encoder_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, cfg.audio_encoder_layers, cfg.audio_dim, 83)).astype(np.float32)
    with torch.no_grad():
        ref_g, ref_l = model.casual_audio_encoder(torch.from_numpy(audio))
    got_g, got_l = js2v.causal_audio_encoder_apply(
        params["audio_encoder"], jnp.asarray(audio), cfg.num_audio_token, True
    )
    np.testing.assert_allclose(np.asarray(got_g), ref_g.numpy(), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_l), ref_l.numpy(), rtol=3e-4, atol=3e-4)


def test_s2v_forward_matches_reference(tiny):
    import torch

    cfg, model, params = tiny
    rng = np.random.default_rng(1)
    # latents: ref frame + 2 video frames; grid (2,2,3) -> seq_len_x 12, audio frames 2
    latents = rng.normal(size=(1, cfg.in_dim, 3, 4, 6)).astype(np.float32)
    ctx = rng.normal(size=(1, 8, cfg.text_dim)).astype(np.float32)
    audio = rng.normal(size=(1, cfg.audio_encoder_layers, cfg.audio_dim, 10)).astype(np.float32)
    motion = rng.normal(size=(16, 2, 8, 8)).astype(np.float32)  # dropped by default
    t = np.array([700.0], dtype=np.float32)

    with torch.no_grad():
        ref = model(
            torch.from_numpy(latents), torch.from_numpy(t), torch.from_numpy(ctx),
            torch.from_numpy(audio), [torch.from_numpy(motion)], None,
        ).numpy()

    got = js2v.wan_s2v_forward(
        params, cfg,
        jnp.asarray(np.moveaxis(latents, 1, -1)),
        jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(audio),
        motion_latents=None, pose_cond=None, attn_impl="xla",
    )
    got_cf = np.moveaxis(np.asarray(got), -1, 1)
    assert got_cf.shape == ref.shape
    np.testing.assert_allclose(got_cf, ref, rtol=5e-4, atol=5e-4)


def test_frame_pack_shapes(tiny):
    cfg, _, params = tiny
    motion = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 8, 8, 16)).astype(np.float32))
    toks = js2v.frame_pack_motion(params["frame_packer"], cfg, motion)
    # buckets: post 1f @1x -> 4x4=16 tok; 2x 2f -> 1x2x2=4 tok; 4x 16f -> 4x1x1=4 tok
    assert toks.shape == (1, 16 + 4 + 4, cfg.dim)


def test_motion_bucket_rope_matches_reference(tiny):
    """FramePack pack-path: our bucket cos/sin tables vs reference rope_precompute for
    x + ref + 1x/2x/4x motion buckets (negative time offsets -> conjugated angles)."""
    import torch

    cfg, model, params = tiny
    lh = lw = 8
    f, h, w = 2, 2, 3
    rf, rh, rw = 1, 2, 3
    # reference: grid_sizes for x + ref, then motion buckets from the frame packer
    grid_x = model.get_grid_sizes((f, h, w), (rf, rh, rw))
    zb = model.frame_packer.zip_frame_buckets  # [1, 2, 16]
    gs = []
    s0 = -int(zb[:1].sum())
    gs.append([torch.tensor([s0, 0, 0]).unsqueeze(0),
               torch.tensor([s0 + int(zb[0]), lh // 2, lw // 2]).unsqueeze(0),
               torch.tensor([int(zb[0]), lh // 2, lw // 2]).unsqueeze(0)])
    s1 = -int(zb[:2].sum())
    gs.append([torch.tensor([s1, 0, 0]).unsqueeze(0),
               torch.tensor([s1 + int(zb[1]) // 2, lh // 4, lw // 4]).unsqueeze(0),
               torch.tensor([int(zb[1]), lh // 2, lw // 2]).unsqueeze(0)])
    s2 = -int(zb[:3].sum())
    gs.append([torch.tensor([s2, 0, 0]).unsqueeze(0),
               torch.tensor([s2 + int(zb[2]) // 4, lh // 8, lw // 8]).unsqueeze(0),
               torch.tensor([int(zb[2]), lh // 2, lw // 2]).unsqueeze(0)])
    grid_all = grid_x + gs

    n_tok = (f * h * w + rf * rh * rw
             + (lh // 2) * (lw // 2) + (lh // 4) * (lw // 4) + 4 * (lh // 8) * (lw // 8))
    x = torch.zeros(1, n_tok, cfg.num_heads, cfg.head_dim)
    ref_freqs = ref_s2v.rope_precompute(x, grid_all, model.freqs, start=None)
    # reference output: complex rotation factors per token (1, S, 1-or-n, head_dim//2)
    ref_cos = ref_freqs.real.numpy()[0, :, 0]
    ref_sin = ref_freqs.imag.numpy()[0, :, 0]

    cos, sin = js2v.s2v_rope_tables(cfg, (f, h, w), (rf, rh, rw), motion_grid=(lh, lw))
    assert cos.shape[0] == n_tok
    np.testing.assert_allclose(np.asarray(cos), ref_cos, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sin), ref_sin, rtol=2e-5, atol=2e-5)
