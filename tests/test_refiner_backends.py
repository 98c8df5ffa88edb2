"""Runnable prompt-refiner LM backends (VERDICT round-4 missing #1).

Covers: (a) the greedy KV-cached decode loop itself vs transformers'
generate(do_sample=False) on converted tiny Qwen2 AND Llama checkpoints,
(b) chat-template parity vs transformers' jinja rendering of the real Qwen2 /
Llama-3 templates, (c) the full QwenPrompt refined-prompt flow vs the
reference QwenPrompt class (prompt_refiners.py:57-110) on identical tiny
weights + tokenizer, (d) the loud gates for unported backbones.
"""

import ast
import json
import os

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

QWEN2_JINJA = (
    "{% for message in messages %}"
    "{% if loop.first and messages[0]['role'] != 'system' %}"
    "{{ '<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n' }}"
    "{% endif %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}")

LLAMA3_JINJA = (
    "{% set loop_messages = messages %}{% for message in loop_messages %}"
    "{% set content = '<|start_header_id|>' + message['role'] "
    "+ '<|end_header_id|>\n\n'+ message['content'] | trim + '<|eot_id|>' %}"
    "{% if loop.index0 == 0 %}{% set content = bos_token + content %}"
    "{% endif %}{{ content }}{% endfor %}"
    "{% if add_generation_prompt %}"
    "{{ '<|start_header_id|>assistant<|end_header_id|>\n\n' }}{% endif %}")


def _byte_level_tokenizer(tmp_path, specials, chat_template, eos_token,
                          bos_token=None):
    """A byte-level BPE tokenizer (encodes ANY text) + HF config files."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers

    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    tok.add_special_tokens(list(specials))
    d = tmp_path / "ckpt"
    d.mkdir(exist_ok=True)
    tok.save(str(d / "tokenizer.json"))
    cfg = {"tokenizer_class": "PreTrainedTokenizerFast",
           "chat_template": chat_template, "eos_token": eos_token}
    if bos_token:
        cfg["bos_token"] = bos_token
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump(cfg, f)
    return d, tok.get_vocab_size()


def _tiny_qwen2(vocab):
    cfg = transformers.Qwen2Config(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=1e6,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    return transformers.Qwen2ForCausalLM(cfg).eval().float(), cfg


def _tiny_llama(vocab):
    cfg = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=5e5, attention_bias=False,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    return transformers.LlamaForCausalLM(cfg).eval().float(), cfg


def _convert(model, num_heads):
    from goal_force_tpu.io.auto import infer_qwen_vl_text_config
    from goal_force_tpu.models.qwen_vl import qwen_vl_text_params_from_torch

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = infer_qwen_vl_text_config(sd, num_heads=num_heads)
    import dataclasses

    cfg = dataclasses.replace(cfg, rope_theta=float(model.config.rope_theta))
    return qwen_vl_text_params_from_torch(sd, cfg), cfg


@pytest.mark.parametrize("family", ["qwen2", "llama"])
def test_generate_loop_matches_transformers(family):
    """The greedy KV-cached decode loop (qwen_vl_text_generate) produces the
    exact token sequence transformers' generate(do_sample=False) does —
    for Qwen2 (qkv biases) AND Llama (no biases: the Omost stack)."""
    from goal_force_tpu.models.qwen_vl import qwen_vl_text_generate

    model, _ = _tiny_qwen2(300) if family == "qwen2" else _tiny_llama(300)
    params, cfg = _convert(model, num_heads=4)
    prompt = [[5, 17, 91, 203, 44, 7]]
    with torch.no_grad():
        ref = model.generate(torch.tensor(prompt), max_new_tokens=12,
                             do_sample=False, eos_token_id=None,
                             pad_token_id=0)
    ref_new = ref[0, len(prompt[0]):].tolist()
    got = qwen_vl_text_generate(params, cfg, np.asarray(prompt), 12)
    assert got == ref_new, (got, ref_new)


def test_generate_loop_stops_at_eos():
    from goal_force_tpu.models.qwen_vl import qwen_vl_text_generate

    model, _ = _tiny_qwen2(300)
    params, cfg = _convert(model, num_heads=4)
    prompt = [[5, 17, 91, 203, 44, 7]]
    full = qwen_vl_text_generate(params, cfg, np.asarray(prompt), 12)
    # use the 3rd generated token as a pretend-eos: output must stop before it
    eos = full[2]
    got = qwen_vl_text_generate(params, cfg, np.asarray(prompt), 12,
                                eos_ids=(eos,))
    assert got == full[:2]


def test_qwen2_chat_template_matches_transformers(tmp_path):
    from goal_force_tpu.prompts.lm_backends import qwen2_chat_template

    d, _ = _byte_level_tokenizer(tmp_path, ["<|im_start|>", "<|im_end|>"],
                                 QWEN2_JINJA, "<|im_end|>")
    tok = transformers.AutoTokenizer.from_pretrained(str(d))
    for messages in (
        [{"role": "system", "content": "You translate."},
         {"role": "user", "content": "一只猫"}],
        [{"role": "user", "content": "hello there"}],
    ):
        ref = tok.apply_chat_template(messages, tokenize=False,
                                      add_generation_prompt=True)
        assert qwen2_chat_template(messages) == ref


def test_llama3_chat_template_matches_transformers(tmp_path):
    from goal_force_tpu.prompts.lm_backends import llama3_chat_template

    d, _ = _byte_level_tokenizer(
        tmp_path, ["<|begin_of_text|>", "<|start_header_id|>",
                   "<|end_header_id|>", "<|eot_id|>"],
        LLAMA3_JINJA, "<|eot_id|>", bos_token="<|begin_of_text|>")
    tok = transformers.AutoTokenizer.from_pretrained(str(d))
    messages = [{"role": "system", "content": "  compose images\n"},
                {"role": "user", "content": "a cat in a forest"}]
    ref = tok.apply_chat_template(messages, tokenize=False,
                                  add_generation_prompt=True)
    assert llama3_chat_template(messages) == ref


def _load_reference_qwen_prompt():
    """ast-extract the reference QwenPrompt class (its module imports
    modelscope/xfuser-era deps at top level)."""
    path = os.path.join(REFERENCE_ROOT, "diffsynth/prompters/prompt_refiners.py")
    tree = ast.parse(open(path).read())
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == "QwenPrompt")
    ns = {"torch": torch, "AutoTokenizer": transformers.AutoTokenizer,
          "ModelManager": object}
    mod = ast.Module(body=[cls], type_ignores=[])
    exec(compile(mod, "ref_prompt_refiners", "exec"), ns)
    return ns["QwenPrompt"]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_qwen_refined_prompt_parity_vs_reference(tmp_path):
    """End-to-end refiner parity: same tiny Qwen2 weights + tokenizer ->
    QwenPromptRefiner (chat template + greedy decode loop) returns the same
    refined prompt the reference QwenPrompt.__call__ does."""
    from goal_force_tpu.io.safetensors_io import save_safetensors
    from goal_force_tpu.prompts.refiners import QwenPromptRefiner, qwen_prompt

    d, vocab = _byte_level_tokenizer(
        tmp_path, ["<|im_start|>", "<|im_end|>", "<|endoftext|>"],
        QWEN2_JINJA, "<|im_end|>")
    model, hf_cfg = _tiny_qwen2(vocab)

    # reference flow
    RefQwenPrompt = _load_reference_qwen_prompt()
    ref = RefQwenPrompt(tokenizer_path=str(d), model=model,
                        system_prompt="You are an English image describer.")
    tok = transformers.AutoTokenizer.from_pretrained(str(d))
    # the reference relies on the model's generation_config eos; pin it to
    # the tokenizer's so both sides stop on the same ids
    model.generation_config.eos_token_id = tok.convert_tokens_to_ids("<|im_end|>")
    model.generation_config.pad_token_id = 0
    model.generation_config.do_sample = False
    ref_out = ref("一只猫在月光下奔跑", positive=True)

    # our flow over a real checkpoint dir (refiner-checkpoint load path)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"num_attention_heads": hf_cfg.num_attention_heads,
                   "rope_theta": hf_cfg.rope_theta}, f)
    refiner = QwenPromptRefiner.from_checkpoint(str(d))
    # reference system prompt differs from ours above — drive the same one
    got = qwen_prompt("一只猫在月光下奔跑",
                      lambda msgs: refiner.backend.generate_chat(
                          [{"role": "system",
                            "content": "You are an English image describer."},
                           msgs[-1]]),
                      positive=True)
    assert got == ref_out.strip()
    # negative prompts pass through unchanged (reference :106-108)
    assert refiner("neg", positive=False) == "neg"


def test_omost_backend_runs_llama_checkpoint(tmp_path):
    """load_omost_backend: tiny Llama checkpoint dir -> generate_chat runs the
    llama3 template + bos + greedy decode and matches transformers."""
    from goal_force_tpu.io.safetensors_io import save_safetensors
    from goal_force_tpu.prompts.lm_backends import load_omost_backend

    d, vocab = _byte_level_tokenizer(
        tmp_path, ["<|begin_of_text|>", "<|start_header_id|>",
                   "<|end_header_id|>", "<|eot_id|>", "<|end_of_text|>"],
        LLAMA3_JINJA, "<|eot_id|>", bos_token="<|begin_of_text|>")
    model, hf_cfg = _tiny_llama(vocab)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"num_attention_heads": hf_cfg.num_attention_heads,
                   "rope_theta": hf_cfg.rope_theta}, f)
    backend = load_omost_backend(str(d), max_new_tokens=10)

    messages = [{"role": "system", "content": "compose images"},
                {"role": "user", "content": "a cat"}]
    tok = transformers.AutoTokenizer.from_pretrained(str(d))
    ids = tok.apply_chat_template(messages, return_tensors="pt",
                                  add_generation_prompt=True)
    with torch.no_grad():
        ref = model.generate(ids, max_new_tokens=10, do_sample=False,
                             eos_token_id=tok.convert_tokens_to_ids("<|eot_id|>"),
                             pad_token_id=0)
    ref_text = tok.batch_decode(ref[:, ids.shape[1]:],
                                skip_special_tokens=True)[0]
    assert backend.generate_chat(messages) == ref_text


# ---------------------------------------------------------------------------
# BLOOM (BeautifulPrompt backbone)
# ---------------------------------------------------------------------------

def _tiny_bloom(vocab):
    cfg = transformers.BloomConfig(
        vocab_size=vocab, hidden_size=32, n_layer=2, n_head=4,
        use_cache=True)
    torch.manual_seed(2)
    return transformers.BloomForCausalLM(cfg).eval().float(), cfg


def _convert_bloom(model):
    from goal_force_tpu.models.bloom import (BloomConfig, infer_bloom_config,
                                             bloom_params_from_torch)
    import dataclasses

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg = infer_bloom_config(sd)
    cfg = dataclasses.replace(cfg, num_heads=model.config.n_head)
    return bloom_params_from_torch(sd, cfg), cfg


def test_bloom_forward_matches_transformers():
    """Full-sequence BLOOM causal-LM logits match BloomForCausalLM (ALiBi
    bias, fused per-head QKV, tanh-gelu MLP, tied lm_head)."""
    from goal_force_tpu.models.bloom import bloom_forward

    model, _ = _tiny_bloom(300)
    params, cfg = _convert_bloom(model)
    ids = [[5, 17, 91, 203, 44, 7, 120, 8]]
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(bloom_forward(params, cfg, np.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def test_bloom_generate_matches_transformers():
    """The KV-cached BLOOM decode loop == transformers generate greedy."""
    from goal_force_tpu.models.bloom import bloom_generate

    model, _ = _tiny_bloom(300)
    params, cfg = _convert_bloom(model)
    prompt = [[5, 17, 91, 203, 44, 7]]
    with torch.no_grad():
        ref = model.generate(torch.tensor(prompt), max_new_tokens=12,
                             do_sample=False, eos_token_id=None,
                             pad_token_id=0)
    ref_new = ref[0, len(prompt[0]):].tolist()
    got = bloom_generate(params, cfg, np.asarray(prompt), 12)
    assert got == ref_new, (got, ref_new)


def test_bloom_sampling_recipe_runs():
    """The reference BeautifulPrompt sampling recipe (do_sample, temp 0.9,
    top_k 50, top_p 0.95, repetition_penalty 1.1 — prompt_refiners.py:37-45)
    produces a bounded, reproducible token stream."""
    from goal_force_tpu.models.bloom import bloom_generate

    model, _ = _tiny_bloom(300)
    params, cfg = _convert_bloom(model)
    prompt = np.asarray([[5, 17, 91]])
    a = bloom_generate(params, cfg, prompt, 8, sample=True, seed=7,
                       repetition_penalty=1.1)
    b = bloom_generate(params, cfg, prompt, 8, sample=True, seed=7,
                       repetition_penalty=1.1)
    assert a == b and 0 < len(a) <= 8
    assert all(0 <= t < 300 for t in a)


def test_load_model_detects_refiner_backbones():
    """io.auto.load_model structurally detects + converts the refiner LM
    checkpoints (the reference routes these through ModelManager's MD5 hash
    table; here the BLOOM post-embedding LayerNorm and the Marian shared
    seq2seq layout are the signatures)."""
    from goal_force_tpu.io.auto import load_model
    from goal_force_tpu.models.bloom import bloom_forward
    from goal_force_tpu.models.marian import marian_decode, marian_encode

    model, _ = _tiny_bloom(300)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    got = load_model(sd, num_heads=model.config.n_head)
    assert got["kind"] == "bloom"
    ids = [[5, 17, 91, 203]]
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(
        np.asarray(bloom_forward(got["params"], got["config"],
                                 np.asarray(ids))), ref, atol=2e-4, rtol=2e-4)

    mmodel, _ = _tiny_marian(120, pad=117)
    msd = {k: v.detach().numpy() for k, v in mmodel.state_dict().items()}
    hf = {"encoder_attention_heads": mmodel.config.encoder_attention_heads,
          "max_position_embeddings": mmodel.config.max_position_embeddings,
          "scale_embedding": mmodel.config.scale_embedding}
    mgot = load_model(msd, hf=hf)
    assert mgot["kind"] == "marian"
    src, dec = [[5, 17, 91, 0]], [[117, 8, 23]]
    with torch.no_grad():
        mref = mmodel(input_ids=torch.tensor(src),
                      decoder_input_ids=torch.tensor(dec)).logits.numpy()
    enc = marian_encode(mgot["params"], mgot["config"], np.asarray(src))
    np.testing.assert_allclose(
        np.asarray(marian_decode(mgot["params"], mgot["config"],
                                 np.asarray(dec), enc)),
        mref, atol=2e-4, rtol=2e-4)


def _load_reference_refiner(name):
    """ast-extract a reference prompt_refiners class (the module imports
    modelscope/xfuser-era deps at top level)."""
    path = os.path.join(REFERENCE_ROOT, "diffsynth/prompters/prompt_refiners.py")
    tree = ast.parse(open(path).read())
    cls = next(n for n in tree.body
               if isinstance(n, ast.ClassDef) and n.name == name)
    ns = {"torch": torch, "AutoTokenizer": transformers.AutoTokenizer,
          "ModelManager": object}
    mod = ast.Module(body=[cls], type_ignores=[])
    exec(compile(mod, "ref_prompt_refiners", "exec"), ns)
    return ns[name]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_beautiful_prompt_parity_vs_reference(tmp_path):
    """End-to-end BeautifulPrompt parity: identical tiny BLOOM weights +
    tokenizer -> the checkpoint-loaded backend (template + KV-cached decode)
    returns the same refined prompt the reference BeautifulPrompt.__call__
    does (greedy pinned on both sides — sampling RNGs differ by design)."""
    from goal_force_tpu.io.safetensors_io import save_safetensors
    from goal_force_tpu.prompts.lm_backends import load_beautiful_prompt_backend
    from goal_force_tpu.prompts.refiners import (
        BEAUTIFUL_PROMPT_TEMPLATE_V2, beautiful_prompt)

    d, vocab = _byte_level_tokenizer(tmp_path, ["<s>", "</s>"], None, "</s>")
    model, hf_cfg = _tiny_bloom(vocab)
    tok = transformers.AutoTokenizer.from_pretrained(str(d))
    eos = tok.convert_tokens_to_ids("</s>")

    class GreedyPin(torch.nn.Module):
        """The reference __call__ hardcodes do_sample=True
        (prompt_refiners.py:37-45); RNGs differ across frameworks by design,
        so pin greedy on BOTH sides and bound the generation length — the
        template application, token slicing, strip and concat under test are
        unchanged."""

        def __init__(self, m):
            super().__init__()
            self.m = m

        @property
        def device(self):
            return next(self.m.parameters()).device

        def generate(self, input_ids, **kw):
            kw.update(do_sample=False, temperature=None, top_k=None,
                      top_p=None, max_new_tokens=24, eos_token_id=eos,
                      pad_token_id=0)
            return self.m.generate(input_ids, **kw)

    RefBeautifulPrompt = _load_reference_refiner("BeautifulPrompt")
    ref = RefBeautifulPrompt(tokenizer_path=str(d), model=GreedyPin(model),
                             template=BEAUTIFUL_PROMPT_TEMPLATE_V2)
    ref_out = ref("a cat", positive=True)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"n_head": hf_cfg.n_head, "eos_token_id": eos}, f)
    # the reference passes repetition_penalty=1.1 (kept by GreedyPin — it
    # applies under greedy too); our backend always drives 1.1
    backend = load_beautiful_prompt_backend(str(d), sample=False,
                                            max_new_tokens=24)
    got = beautiful_prompt("a cat", backend.generate, positive=True, version=2)
    assert got == ref_out
    assert beautiful_prompt("neg", backend.generate, positive=False) == "neg"


# ---------------------------------------------------------------------------
# Marian (Translator backbone)
# ---------------------------------------------------------------------------

def _tiny_marian(vocab, pad, eos=0):
    cfg = transformers.MarianConfig(
        vocab_size=vocab, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=True, activation_function="swish",
        pad_token_id=pad, eos_token_id=eos, decoder_start_token_id=pad,
        bos_token_id=None, forced_eos_token_id=eos, share_encoder_decoder_embeddings=True)
    torch.manual_seed(3)
    return transformers.MarianMTModel(cfg).eval().float(), cfg


def _convert_marian(model):
    from goal_force_tpu.models.marian import (infer_marian_config,
                                              marian_params_from_torch)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    hf = {"encoder_attention_heads": model.config.encoder_attention_heads,
          "max_position_embeddings": model.config.max_position_embeddings,
          "scale_embedding": model.config.scale_embedding}
    cfg = infer_marian_config(sd, hf)
    return marian_params_from_torch(sd, cfg), cfg


def test_marian_forward_matches_transformers():
    """Teacher-forced seq2seq logits match MarianMTModel (rebuilt sinusoidal
    positions, scaled shared embeddings, post-LN blocks, final_logits_bias)."""
    from goal_force_tpu.models.marian import marian_decode, marian_encode

    model, hf_cfg = _tiny_marian(120, pad=117)
    params, cfg = _convert_marian(model)
    src = [[5, 17, 91, 103, 44, 0]]
    dec = [[117, 8, 23, 54]]
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(src),
                    decoder_input_ids=torch.tensor(dec)).logits.numpy()
    enc = marian_encode(params, cfg, np.asarray(src))
    got = np.asarray(marian_decode(params, cfg, np.asarray(dec), enc))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("num_beams", [1, 4])
def test_marian_generate_matches_transformers(num_beams):
    """Greedy AND beam-search generation match transformers' generate on the
    checkpoint's own knobs (bad_words_ids bans pad, forced eos at max_length,
    length_penalty 1.0) — the reference Translator calls model.generate with
    these defaults (prompt_refiners.py:128-133)."""
    from goal_force_tpu.models.marian import marian_generate

    model, hf_cfg = _tiny_marian(120, pad=117)
    params, cfg = _convert_marian(model)
    src = [[5, 17, 91, 103, 44, 0]]
    with torch.no_grad():
        ref = model.generate(torch.tensor(src), max_length=16,
                             num_beams=num_beams, do_sample=False,
                             bad_words_ids=[[117]], length_penalty=1.0,
                             early_stopping=False)
    got = marian_generate(params, cfg, np.asarray(src), max_length=16,
                          num_beams=num_beams, decoder_start_token_id=117,
                          eos_token_id=0, pad_token_id=117,
                          bad_words_ids=[[117]], length_penalty=1.0,
                          early_stopping=False)
    assert got == ref[0].tolist(), (got, ref[0].tolist())


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_translator_parity_vs_reference(tmp_path):
    """End-to-end Translator parity: identical tiny Marian weights + fast
    tokenizer -> MarianBackend.generate returns the same translation the
    reference Translator.__call__ does (beam search, num_beams=4)."""
    from goal_force_tpu.io.safetensors_io import save_safetensors
    from goal_force_tpu.prompts.lm_backends import load_translator_backend

    from tokenizers import processors

    d, vocab = _byte_level_tokenizer(tmp_path, ["<pad>", "</s>"], None, "</s>")
    # MarianTokenizer appends </s>; give the fast tokenizer the same
    # post-processor so the reference flow sees identical input_ids
    from tokenizers import Tokenizer

    tok_raw = Tokenizer.from_file(str(d / "tokenizer.json"))
    eos_id = tok_raw.token_to_id("</s>")
    pad_id = tok_raw.token_to_id("<pad>")
    tok_raw.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", eos_id)])
    tok_raw.save(str(d / "tokenizer.json"))

    model, hf_cfg = _tiny_marian(vocab, pad=pad_id, eos=eos_id)
    RefTranslator = _load_reference_refiner("Translator")
    ref = RefTranslator(tokenizer_path=str(d), model=model)
    model.generation_config.max_length = 16
    model.generation_config.num_beams = 4
    model.generation_config.bad_words_ids = [[pad_id]]
    model.generation_config.decoder_start_token_id = pad_id
    model.generation_config.eos_token_id = eos_id
    model.generation_config.pad_token_id = pad_id
    model.generation_config.forced_eos_token_id = eos_id
    ref_out = ref("ein kleines haus")

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    save_safetensors(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"encoder_attention_heads": hf_cfg.encoder_attention_heads,
                   "max_position_embeddings": hf_cfg.max_position_embeddings,
                   "scale_embedding": True, "max_length": 16, "num_beams": 4,
                   "bad_words_ids": [[pad_id]],
                   "decoder_start_token_id": pad_id, "eos_token_id": eos_id,
                   "pad_token_id": pad_id}, f)
    backend = load_translator_backend(str(d))
    assert backend.generate("ein kleines haus") == ref_out
