"""Pipeline-LEVEL golden parity for the FLAGSHIP goal-force/Wan family.

The per-model golden tests (wan_dit/vae/t5/flow_match) can't catch loop
composition drift — unit ordering, the I2V y/mask layout, CFG combination,
the 0.875 expert switch, scheduler indexing, decode scaling. This drives the
reference's full I2V denoise semantics (src/goal_force/wan_video_new.py:
663-737 with WanVideoUnit_ImageEmbedderVAE :887-917 and the WanPrompter
zero-out :105-108) using the REFERENCE'S OWN torch modules — FlowMatch
scheduler, WanModel x2 experts, WanVideoVAE core, WanTextEncoder — against
`GoalForcePipeline.__call__` with the SAME converted weights, token ids, and
initial noise, comparing final decoded frames.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import load_reference_module, reference_available

import zoo_ckpts as Z

from goal_force_tpu import configs
from goal_force_tpu.io.torch_convert import (dit_params_from_torch,
                                             t5_params_from_torch,
                                             vae_params_from_torch)
from goal_force_tpu.pipelines import GoalForcePipeline
from goal_force_tpu.pipelines.goal_force import PipelineConfig

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

H, W, FRAMES, STEPS, CFG, SHIFT, SEED, BOUNDARY = 32, 48, 9, 6, 3.0, 5.0, 7, 0.875


class _FixedTokenizer:
    """Deterministic ids shared with the reference side; real padding so the
    per-sample zero-out path is exercised."""

    def __init__(self, text_len=16, vocab=128):
        self.text_len, self.vocab = text_len, vocab

    def ids_for(self, prompt):
        rng = np.random.default_rng(abs(hash(prompt)) % (2**32))
        seq = 9 if "neg" not in prompt else 5
        ids = np.zeros((self.text_len,), np.int32)
        ids[:seq] = rng.integers(2, self.vocab, seq)
        mask = (ids != 0).astype(np.int32)
        return ids, mask

    def __call__(self, prompts):
        pairs = [self.ids_for(p) for p in prompts]
        return (np.stack([p[0] for p in pairs]),
                np.stack([p[1] for p in pairs]))


@pytest.fixture(scope="module")
def setup():
    import torch

    dit_cfg, t5_cfg, vae_cfg, _ = configs.tiny_pipeline_configs(num_layers=2)
    ref_dit_mod = Z.refmodels("wan_video_dit")
    ref_t5_mod = Z.refmodels("wan_video_text_encoder")
    ref_vae_mod = Z.refmodels("wan_video_vae")

    def make_dit(seed):
        torch.manual_seed(seed)
        return ref_dit_mod.WanModel(
            dim=dit_cfg.dim, in_dim=dit_cfg.in_dim, ffn_dim=dit_cfg.ffn_dim,
            out_dim=dit_cfg.out_dim, text_dim=dit_cfg.text_dim,
            freq_dim=dit_cfg.freq_dim, eps=dit_cfg.eps,
            patch_size=dit_cfg.patch_size, num_heads=dit_cfg.num_heads,
            num_layers=dit_cfg.num_layers, has_image_input=False,
        ).eval().float()

    dit_t, dit2_t = make_dit(0), make_dit(1)
    torch.manual_seed(2)
    te_t = ref_t5_mod.WanTextEncoder(
        vocab=t5_cfg.vocab, dim=t5_cfg.dim, dim_attn=t5_cfg.dim_attn,
        dim_ffn=t5_cfg.dim_ffn, num_heads=t5_cfg.num_heads,
        num_layers=t5_cfg.num_layers, num_buckets=t5_cfg.num_buckets,
        shared_pos=False, dropout=0.0,
    ).eval().float()
    torch.manual_seed(3)
    vae_t = ref_vae_mod.VideoVAE_(
        dim=vae_cfg.dim, z_dim=vae_cfg.z_dim, dim_mult=list(vae_cfg.dim_mult),
        num_res_blocks=vae_cfg.num_res_blocks,
        temperal_downsample=list(vae_cfg.temporal_downsample),
    ).eval().float()

    sd = lambda m: {k: v.detach().numpy() for k, v in m.state_dict().items()}
    params = {
        "dit": dit_params_from_torch(sd(dit_t), dit_cfg),
        "dit2": dit_params_from_torch(sd(dit2_t), dit_cfg),
        "t5": t5_params_from_torch(sd(te_t), t5_cfg),
        "vae": vae_params_from_torch(sd(vae_t), vae_cfg),
    }
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                    params)
    tok = _FixedTokenizer(text_len=t5_cfg.text_len, vocab=t5_cfg.vocab)
    pipe = GoalForcePipeline(dit_cfg, t5_cfg, vae_cfg, None, PipelineConfig(),
                             params, tok, jnp.float32)
    return pipe, tok, (dit_t, dit2_t, te_t, vae_t), (dit_cfg, t5_cfg, vae_cfg)


def test_goal_force_pipeline_matches_reference_loop(setup):
    import torch

    pipe, tok, (dit_t, dit2_t, te_t, vae_t), (dit_cfg, t5_cfg, vae_cfg) = setup
    ref_sched_mod = load_reference_module("diffsynth/schedulers/flow_match.py",
                                          "ref_flow_match_wan_pipe")

    rng = np.random.default_rng(0)
    image = rng.uniform(size=(H, W, 3)).astype(np.float32)
    prompt, negative = "a ball rolls right", "neg static blurry"

    ours = pipe(prompt, image, negative_prompt=negative, controlnet=False,
                seed=SEED, num_frames=FRAMES, num_inference_steps=STEPS,
                cfg_scale=CFG, sigma_shift=SHIFT)

    # ---- reference side: its scheduler + its torch modules, same inputs ----
    scale = [torch.zeros(vae_cfg.z_dim), torch.ones(vae_cfg.z_dim)]

    # prompt embeddings with per-sample zero-out (wan_prompter.py:99-108)
    def encode(p):
        ids, mask = tok.ids_for(p)
        ids_t = torch.tensor(ids[None].astype(np.int64))
        mask_t = torch.tensor(mask[None].astype(np.int64))
        with torch.no_grad():
            emb = te_t(ids_t, mask_t)
        emb[:, int(mask.sum()):] = 0
        return emb

    ctx_p, ctx_n = encode(prompt), encode(negative)

    # I2V y = [mask, vae([img, zeros])] (WanVideoUnit_ImageEmbedderVAE
    # :887-917): first latent frame replicated 4x into the 4 mask channels
    img_t = torch.tensor(image.transpose(2, 0, 1)[:, None] * 2.0 - 1.0)
    vae_in = torch.cat(
        [img_t, torch.zeros(3, FRAMES - 1, H, W)], dim=1)[None]
    with torch.no_grad():
        y_lat = vae_t.encode(vae_in, scale)[0]
    msk = torch.ones(1, FRAMES, H // 8, W // 8)
    msk[:, 1:] = 0
    msk = torch.cat([torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1),
                     msk[:, 1:]], dim=1)
    msk = msk.view(1, msk.shape[1] // 4, 4, H // 8, W // 8).transpose(1, 2)[0]
    y = torch.cat([msk, y_lat])[None]

    # same initial noise as the pipeline's jax PRNG stream
    lat_f = (FRAMES - 1) // 4 + 1
    noise = np.asarray(jax.random.normal(
        jax.random.PRNGKey(SEED), (1, lat_f, H // 8, W // 8, vae_cfg.z_dim),
        jnp.float32))
    lat = torch.tensor(noise.transpose(0, 4, 1, 2, 3))

    sched = ref_sched_mod.FlowMatchScheduler(shift=5, sigma_min=0.0,
                                             extra_one_step=True)
    sched.set_timesteps(STEPS, shift=SHIFT)
    with torch.no_grad():
        for i, t in enumerate(sched.timesteps):
            # expert switch (wan_video_new.py:699-704)
            model = dit2_t if t.item() < BOUNDARY * 1000 else dit_t
            tt = t.reshape(1).float()
            xin = torch.cat([lat, y], dim=1)  # (model_fn :1457-1464)
            posi = model(xin, tt, ctx_p)
            nega = model(xin, tt, ctx_n)
            pred = nega + CFG * (posi - nega)   # (:710-716)
            lat = sched.step(pred, sched.timesteps[i], lat)
        dit2_used = sched.timesteps[-1].item() < BOUNDARY * 1000
        assert dit2_used, "test must exercise the expert switch"
        # WanVideoVAE.decode clamps to [-1, 1] (wan_video_vae.py:1215)
        video = vae_t.decode(lat, scale).clamp_(-1, 1)
    ref = (video[0].numpy().transpose(1, 2, 3, 0) + 1.0) / 2.0

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-3, rtol=3e-2)


def test_goal_force_merged_cfg_is_default_composition(setup):
    """The merged-CFG batch (our default) must equal the reference's two
    separate posi/nega calls — guaranteed above, but assert the posi/nega
    rows actually differ so the CFG comparison has teeth."""
    pipe, tok, _, _ = setup
    ids, mask = tok(["a ball rolls right", "neg static blurry"])
    ctx = pipe.encode_prompts(["a ball rolls right", "neg static blurry"])
    assert not np.allclose(np.asarray(ctx[0]), np.asarray(ctx[1]))
    # padding zero-out applied per sample (wan_prompter.py:105-108)
    assert np.all(np.asarray(ctx[0][int(mask[0].sum()):]) == 0)
    assert np.all(np.asarray(ctx[1][int(mask[1].sum()):]) == 0)
