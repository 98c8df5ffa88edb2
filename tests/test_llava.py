"""LLaVA multimodal encoder golden parity vs the reference module.

The reference HunyuanVideoMLLMEncoder subclasses
transformers.LlavaForConditionalGeneration and returns
hidden_states[-(skip+1)] (hunyuan_video_text_encoder.py:52-68). transformers
>= 4.52 requires the `<image>` placeholder PRE-expanded to one token per patch
feature; the reference prompter (and our llava_encode) feeds ONE `<image>`
token and expands inside the encoder — equivalent sequences, so the torch
side of the parity drive expands the ids itself.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

IMG_TOKEN = 99


def _tiny_torch_llava():
    import torch
    import transformers

    vision_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_attention_heads=2,
        num_hidden_layers=3, image_size=28, patch_size=14)
    text_cfg = transformers.LlamaConfig(
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=4, vocab_size=256,
        rms_norm_eps=1e-5, rope_theta=500000.0)
    cfg = transformers.LlavaConfig(
        vision_config=vision_cfg, text_config=text_cfg,
        image_token_index=IMG_TOKEN, projector_hidden_act="gelu",
        vision_feature_layer=-2, vision_feature_select_strategy="default")
    torch.manual_seed(0)
    m = transformers.LlavaForConditionalGeneration(cfg).eval().float()
    for p in m.parameters():
        p.data = torch.randn_like(p.data) * 0.05
    return m


def _tiny_jax_cfg():
    from goal_force_tpu.models.clip import CLIPConfig
    from goal_force_tpu.models.llava import LlavaConfig
    from goal_force_tpu.models.text_encoders import LlamaConfig

    return LlavaConfig(
        text=LlamaConfig(hidden_size=32, num_layers=4, num_heads=4,
                         num_kv_heads=2, intermediate_size=64, vocab=256,
                         rope_theta=500000.0),
        vision=CLIPConfig(image_size=28, patch_size=14, vision_dim=32,
                          vision_heads=2, vision_layers=3,
                          hidden_act="quick_gelu"),
        image_token_id=IMG_TOKEN,
    )


@pytest.mark.parametrize("skip", [2, 0])
def test_llava_encoder_golden_parity(skip):
    import torch

    from goal_force_tpu.models.llava import llava_encode, llava_params_from_torch

    m = _tiny_torch_llava()
    cfg = _tiny_jax_cfg()
    params = llava_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)

    rng = np.random.default_rng(0)
    b, s = 2, 24
    n_img = cfg.num_image_tokens                     # (28/14)^2 = 4
    ids = rng.integers(1, 90, (b, s)).astype(np.int64)
    img_pos = [5, 3]
    mask = np.ones((b, s), np.int64)
    mask[0, 20:] = 0                                 # right padding
    for i, p in enumerate(img_pos):
        ids[i, p] = IMG_TOKEN

    pixels = rng.normal(size=(b, 3, 28, 28)).astype(np.float32)

    # torch side: pre-expand <image> into n_img placeholder tokens
    ids_t, mask_t = [], []
    for i, p in enumerate(img_pos):
        ids_t.append(np.concatenate(
            [ids[i, :p], np.full(n_img, IMG_TOKEN, np.int64), ids[i, p + 1:]]))
        mask_t.append(np.concatenate(
            [mask[i, :p], np.ones(n_img, np.int64), mask[i, p + 1:]]))
    with torch.no_grad():
        out = m(input_ids=torch.from_numpy(np.stack(ids_t)),
                attention_mask=torch.from_numpy(np.stack(mask_t)),
                pixel_values=torch.from_numpy(pixels),
                output_hidden_states=True)
    want = out.hidden_states[-(skip + 1)].numpy()

    got = llava_encode(params, cfg, ids,
                       jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                       mask, hidden_state_skip_layer=skip)
    assert got.shape == want.shape == (b, s - 1 + n_img, 32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def _ref_prompter_module():
    """Load the reference hunyuan_video_prompter with its relative imports
    stubbed out (base_prompter pulls in the whole ModelManager zoo; only the
    crop logic of encode_prompt_using_mllm is under test here)."""
    import importlib.util
    import sys
    import types

    spec = importlib.util.spec_from_file_location(
        "ref_hv_prompter",
        "/root/reference/diffsynth/prompters/hunyuan_video_prompter.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("diffsynth", types.ModuleType("diffsynth"))
    bp = types.ModuleType("diffsynth.prompters.base_prompter")
    bp.BasePrompter = type("BasePrompter", (), {})
    models = types.ModuleType("diffsynth.models")
    sd3 = types.ModuleType("diffsynth.models.sd3_text_encoder")
    sd3.SD3TextEncoder1 = type("SD3TextEncoder1", (), {})
    hv = types.ModuleType("diffsynth.models.hunyuan_video_text_encoder")
    hv.HunyuanVideoLLMEncoder = type("HunyuanVideoLLMEncoder", (), {})
    hv.HunyuanVideoMLLMEncoder = type("HunyuanVideoMLLMEncoder", (), {})
    pr = types.ModuleType("diffsynth.prompters")
    pr.__path__ = ["/root/reference/diffsynth/prompters"]
    sys.modules["diffsynth.prompters"] = pr
    sys.modules["diffsynth.prompters.base_prompter"] = bp
    sys.modules["diffsynth.models"] = models
    sys.modules["diffsynth.models.sd3_text_encoder"] = sd3
    sys.modules["diffsynth.models.hunyuan_video_text_encoder"] = hv
    mod.__package__ = "diffsynth.prompters"
    spec.loader.exec_module(mod)
    return mod


# tiny analogue of the dit-llm-encode-video-i2v template: 6 scaffold tokens
# with <image> at position 2 (so image_emb_start=2, and with 4 patch tokens
# image_emb_end=6), then the user text, then the 4-token assistant header and
# the double-return token (id 42) that anchors the assistant crop
TINY_TPL = {
    "template": "sysA sysB <image> sysC sysD sysE {} hdrA hdrB hdrC hdrD <ret>",
    "crop_start": 6,
    "image_emb_start": 2,
    "image_emb_end": 6,
    "image_emb_len": 4,
    "double_return_token_id": 42,
}

# text-only analogue (the non-i2v template the LLaVA encoder falls back to)
TINY_TPL_TEXT = {"template": "sysA sysB sysC {} tail", "crop_start": 3}


def _word_ids(text):
    table = {"<image>": IMG_TOKEN, "<ret>": 42}
    ids = []
    for w in text.split():
        if w not in table:
            table[w] = 100 + (sum(map(ord, w)) % 100)
        ids.append(table[w])
    return ids


def _fake_text_tokenizer(length):
    from goal_force_tpu.prompters import TextTokenizer

    return TextTokenizer(_word_ids, length, pad_id=0)


@pytest.mark.parametrize("interleave", [4, 1])
def test_mllm_prompt_encoder_golden_vs_reference_crop(interleave):
    """Our make_llava_prompt_encoder vs the reference's own
    encode_prompt_using_mllm (hunyuan_video_prompter.py:156-236) driving the
    same tiny torch LLaVA, same fake tokenizer, same template constants."""
    import torch

    from goal_force_tpu.models.llava import llava_params_from_torch
    from goal_force_tpu.pipelines.hunyuan_video import (
        make_llava_prompt_encoder,
    )

    ref = _ref_prompter_module()
    m = _tiny_torch_llava()
    cfg = _tiny_jax_cfg()
    n_img = cfg.num_image_tokens
    txt_len = 20
    length = txt_len + TINY_TPL["crop_start"]
    prompt = "a red ball rolls left"
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    # ---- reference side: duck-typed prompter over the torch model --------
    class FakeHFTokenizer:
        def __call__(self, text, return_tensors, padding, max_length,
                     truncation):
            ids = _word_ids(text)[:max_length]
            mask = [1] * len(ids) + [0] * (max_length - len(ids))
            ids = ids + [0] * (max_length - len(ids))
            import types as _t

            return _t.SimpleNamespace(
                input_ids=torch.tensor([ids]),
                attention_mask=torch.tensor([mask]))

    def shim_encoder(input_ids, attention_mask, hidden_state_skip_layer,
                     pixel_values):
        # HunyuanVideoMLLMEncoder.forward on transformers>=4.52: pre-expand
        # the single <image> placeholder to one token per patch feature
        # (model-level equivalence proven in test_llava_encoder_golden_parity)
        ids = input_ids[0].tolist()
        pos = ids.index(IMG_TOKEN)
        ids2 = ids[:pos] + [IMG_TOKEN] * n_img + ids[pos + 1:]
        mask2 = attention_mask[0].tolist()
        mask2 = mask2[:pos] + [1] * n_img + mask2[pos + 1:]
        with torch.no_grad():
            out = m(input_ids=torch.tensor([ids2]),
                    attention_mask=torch.tensor([mask2]),
                    pixel_values=pixel_values,
                    output_hidden_states=True)
        return out.hidden_states[-(hidden_state_skip_layer + 1)]

    import types as _types

    fake_self = _types.SimpleNamespace(
        tokenizer_2=FakeHFTokenizer(),
        text_encoder_2=shim_encoder,
        processor=lambda images, return_tensors: {
            "pixel_values": torch.from_numpy(pixels)},
        prompt_template_video=TINY_TPL,
    )
    formated = TINY_TPL["template"].format(prompt)
    want_emb, want_mask = ref.HunyuanVideoPrompter.encode_prompt_using_mllm(
        fake_self, formated, ["img"], txt_len, "cpu",
        TINY_TPL["crop_start"], hidden_state_skip_layer=2,
        image_embed_interleave=interleave)

    # ---- our side ---------------------------------------------------------
    params = llava_params_from_torch(
        {k: v.numpy() for k, v in m.state_dict().items()}, cfg)
    # bypass image preprocessing (the torch side got raw pixels too); the
    # encoder closure binds clip_preprocess_image at build time, so patch
    # the module BEFORE building it
    import goal_force_tpu.models.llava as L

    orig = L.clip_preprocess_image
    L.clip_preprocess_image = lambda im, size: pixels[0].transpose(1, 2, 0)
    try:
        enc = make_llava_prompt_encoder(
            params, cfg, None, None, txt_len,
            tokenize_llama=_fake_text_tokenizer(txt_len),
            template=TINY_TPL, image_embed_interleave=interleave)
        emb, mask, _ = enc(prompt, images="img")
    finally:
        L.clip_preprocess_image = orig

    np.testing.assert_array_equal(np.asarray(mask)[0],
                                  want_mask[0].numpy())
    np.testing.assert_allclose(np.asarray(emb), want_emb.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_i2v_pipeline_with_llava_image_prompt():
    """input_images flows through the LLaVA encoder into the HunyuanVideo
    pipeline (reference hunyuan_video.py:105-107,163-190): the i2v emb
    carries image tokens (longer than the text-only emb), CFG pads the
    posi/nega rows to one length, and the DiT consumes the non-txt_len
    sequence."""
    import jax

    from goal_force_tpu.models.hunyuan_video_dit import HunyuanVideoDiTConfig
    from goal_force_tpu.models.llava import init_llava
    from goal_force_tpu.pipelines.hunyuan_video import (
        HunyuanVideoPipeline,
        make_llava_prompt_encoder,
    )

    cfg = _tiny_jax_cfg()
    params = init_llava(jax.random.PRNGKey(1), cfg)
    txt_len = 20
    pixels = np.random.default_rng(5).uniform(0, 1, (28, 28, 3)) \
        .astype(np.float32)

    # the REAL clip_preprocess_image runs here — it resizes any input to the
    # vision tower's 28px geometry (the pipeline feeds it the 16x16 i2v image)
    enc = make_llava_prompt_encoder(
        params, cfg, None, None, txt_len,
        tokenize_llama=_fake_text_tokenizer(txt_len), template=TINY_TPL,
        text_template=TINY_TPL_TEXT)

    emb_t, mask_t, _ = enc("a cat")
    emb_i, mask_i, _ = enc("a cat", images=pixels)
    assert emb_t.shape[1] == txt_len
    assert emb_i.shape[1] == cfg.num_image_tokens // 4 + txt_len - 4
    assert np.abs(np.asarray(emb_i)).max() > 0

    dit_cfg = HunyuanVideoDiTConfig(
        dim=144, num_double_blocks=2, num_single_blocks=2,
        text_dim=cfg.text.hidden_size, pooled_dim=cfg.text.hidden_size,
        rope_dims=(2, 2, 2), txt_len=txt_len)
    pipe = HunyuanVideoPipeline.init_random(jax.random.PRNGKey(0),
                                            dit_cfg=dit_cfg)
    pipe.encode_prompt = enc

    def fake_encode(v, **tk):
        import jax.numpy as jnp

        b, t, h, w, _ = v.shape
        lt = (t - 1) // 4 + 1
        z = jax.image.resize(v.mean(-1), (b, lt, h // 8, w // 8), "linear")
        return jnp.tile(z[..., None], (1, 1, 1, 1, 16))

    pipe.encode_video = fake_encode
    img = np.random.default_rng(1).uniform(0, 1, (16, 16, 3)) \
        .astype(np.float32)
    kw = dict(height=16, width=16, num_frames=5, num_inference_steps=2,
              seed=0)
    # positive gets the image-conditioned prompt; text-only run must differ
    out_i = pipe("a cat", input_images=img, **kw)
    assert np.isfinite(np.asarray(out_i)).all()
    # CFG: posi row is image-conditioned (longer), nega is text-only — the
    # merged batch pads to one length
    out_cfg = pipe("a cat", negative_prompt="ugly", cfg_scale=3.0,
                   input_images=img, **kw)
    assert np.isfinite(np.asarray(out_cfg)).all()
    assert np.abs(np.asarray(out_cfg) - np.asarray(out_i)).max() > 1e-6


def test_llava_from_pretrained_detection(tmp_path):
    """A LLaVA checkpoint routes llama_path to the MLLM encoder: detection,
    config inference from shapes, and the loud refusal of image prompts
    without a real tokenizer."""
    import torch  # noqa: F401  (tiny torch llava builds the checkpoint)

    from goal_force_tpu.io.detect import detect_model_kind
    from goal_force_tpu.io.safetensors_io import save_safetensors
    from goal_force_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline
    from zoo_ckpts import build_clip_text_encoder, build_hunyuan_video_dit

    m = _tiny_torch_llava()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    assert detect_model_kind(sd) == "llava"

    dit_sd, dit_cfg = build_hunyuan_video_dit()
    clip_sd, _ = build_clip_text_encoder("sd", dim=768, layers=1, seed=9)
    dit_path = str(tmp_path / "dit.safetensors")
    llava_path = str(tmp_path / "llava.safetensors")
    clip_path = str(tmp_path / "clip.safetensors")
    save_safetensors(dit_sd, dit_path)
    save_safetensors(sd, llava_path)
    save_safetensors(clip_sd, clip_path)

    pipe = HunyuanVideoPipeline.from_pretrained(
        dit_path, llama_path=llava_path, clip_path=clip_path,
        txt_len=dit_cfg.txt_len, dtype=jnp.float32, llama_num_heads=4,
        clip_num_heads=4,
        num_heads=dit_cfg.num_heads, rope_dims=dit_cfg.rope_dims)
    # text-only generation works through the llava tower's llama core
    lat = pipe("a dancing robot", num_frames=5, height=16, width=16,
               num_inference_steps=2)
    assert np.isfinite(np.asarray(lat)).all()
    # image conditioning without a tokenizer dir refuses loudly
    img = np.zeros((16, 16, 3), np.float32)
    pipe.encode_video = lambda v, **tk: jnp.zeros((1, 2, 2, 2, 16))
    with pytest.raises(ValueError, match="tokenizer"):
        pipe("a cat", input_images=img, num_frames=5, height=16, width=16,
             num_inference_steps=2)


def test_clip_preprocess_matches_hf_processor():
    from transformers import CLIPImageProcessor

    from goal_force_tpu.models.llava import clip_preprocess_image

    proc = CLIPImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28},
        do_resize=True, do_center_crop=True, do_rescale=True,
        do_normalize=True, resample=3)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
    want = proc(img, return_tensors="np")["pixel_values"][0]  # (3, 28, 28)
    got = clip_preprocess_image(img, size=28)                  # (28, 28, 3)
    np.testing.assert_allclose(got.transpose(2, 0, 1), want, rtol=2e-5,
                               atol=2e-5)


# 4-double-return analogue of the real i2v templates: 3 scaffold <ret> tokens
# BEFORE the user text + the assistant <ret> at the end (the real templates'
# structure: system \n\n, eot \n\n, user \n\n, assistant \n\n)
TINY_TPL_4RET = {
    "template": "sysA <ret> sysB <image> sysC <ret> sysD <ret> {} hdrA hdrB hdrC hdrD <ret>",
    "crop_start": 8,
    "image_emb_start": 3,
    "image_emb_end": 7,
    "image_emb_len": 4,
    "double_return_token_id": 42,
}


def test_mllm_crop_truncated_prompt_matches_reference():
    """ADVICE r4 item 2: an over-long prompt truncates away the assistant
    '\\n\\n' but keeps the 3 scaffold double-returns; the reference detects
    3-of-4 hits and anchors the assistant crop at sequence end
    (hunyuan_video_prompter.py:184-192) — the crop must not anchor at the
    last scaffold token."""
    import torch

    from goal_force_tpu.models.llava import llava_params_from_torch
    from goal_force_tpu.pipelines.hunyuan_video import make_llava_prompt_encoder

    ref = _ref_prompter_module()
    m = _tiny_torch_llava()
    cfg = _tiny_jax_cfg()
    n_img = cfg.num_image_tokens
    txt_len = 12
    # 20 words >> txt_len: tokenization truncates inside the user text
    prompt = " ".join(f"w{i}" for i in range(20))
    rng = np.random.default_rng(7)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

    class FakeHFTokenizer:
        def __call__(self, text, return_tensors, padding, max_length,
                     truncation):
            ids = _word_ids(text)[:max_length]
            mask = [1] * len(ids) + [0] * (max_length - len(ids))
            ids = ids + [0] * (max_length - len(ids))
            import types as _t

            return _t.SimpleNamespace(
                input_ids=torch.tensor([ids]),
                attention_mask=torch.tensor([mask]))

    def shim_encoder(input_ids, attention_mask, hidden_state_skip_layer,
                     pixel_values):
        ids = input_ids[0].tolist()
        pos = ids.index(IMG_TOKEN)
        ids2 = ids[:pos] + [IMG_TOKEN] * n_img + ids[pos + 1:]
        mask2 = attention_mask[0].tolist()
        mask2 = mask2[:pos] + [1] * n_img + mask2[pos + 1:]
        with torch.no_grad():
            out = m(input_ids=torch.tensor([ids2]),
                    attention_mask=torch.tensor([mask2]),
                    pixel_values=pixel_values,
                    output_hidden_states=True)
        return out.hidden_states[-(hidden_state_skip_layer + 1)]

    import types as _types

    fake_self = _types.SimpleNamespace(
        tokenizer_2=FakeHFTokenizer(),
        text_encoder_2=shim_encoder,
        processor=lambda images, return_tensors: {
            "pixel_values": torch.from_numpy(pixels)},
        prompt_template_video=TINY_TPL_4RET,
    )
    formated = TINY_TPL_4RET["template"].format(prompt)
    # precondition: the truncated ids really contain exactly the 3 scaffold
    # double-returns (the reference's fallback trigger)
    ids_chk = _word_ids(formated)[:txt_len + TINY_TPL_4RET["crop_start"]]
    assert ids_chk.count(42) == 3
    want_emb, want_mask = ref.HunyuanVideoPrompter.encode_prompt_using_mllm(
        fake_self, formated, ["img"], txt_len, "cpu",
        TINY_TPL_4RET["crop_start"], hidden_state_skip_layer=2,
        image_embed_interleave=1)

    import goal_force_tpu.models.llava as L

    orig = L.clip_preprocess_image
    L.clip_preprocess_image = lambda im, size: pixels[0].transpose(1, 2, 0)
    try:
        enc = make_llava_prompt_encoder(
            params := llava_params_from_torch(
                {k: v.numpy() for k, v in m.state_dict().items()}, cfg),
            cfg, None, None, txt_len,
            tokenize_llama=_fake_text_tokenizer(txt_len),
            template=TINY_TPL_4RET, image_embed_interleave=1)
        emb, mask, _ = enc(prompt, images="img")
    finally:
        L.clip_preprocess_image = orig

    np.testing.assert_array_equal(np.asarray(mask)[0], want_mask[0].numpy())
    np.testing.assert_allclose(np.asarray(emb), want_emb.numpy(),
                               rtol=3e-4, atol=3e-4)
