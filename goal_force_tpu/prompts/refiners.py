"""Prompt refiners: BeautifulPrompt / QwenPrompt / Translator templates.

Behavioral parity with /root/reference/diffsynth/prompters/prompt_refiners.py:
each refiner wraps a causal LM with a fixed template/system prompt and returns
the refined positive prompt (negative prompts pass through unchanged). The LM
is pluggable — `generate(text) -> completion` — so any backend (a JAX LM from
this framework or a host-side HF model) can serve it.
"""

from __future__ import annotations

from typing import Callable, Dict, List

BEAUTIFUL_PROMPT_TEMPLATE_V1 = (
    "Instruction: Give a simple description of the image to generate a "
    "drawing prompt.\nInput: {raw_prompt}\nOutput:")

BEAUTIFUL_PROMPT_TEMPLATE_V2 = (
    "Converts a simple image description into a prompt. Prompts are formatted "
    "as multiple related tags separated by commas, plus you can use () to "
    "increase the weight, [] to decrease the weight, or use a number to "
    "specify the weight. You should add appropriate words to make the images "
    "described in the prompt more aesthetically pleasing, but make sure there "
    "is a correlation between the input and output.\n"
    "### Input: {raw_prompt}\n### Output:")

QWEN_PROMPT_SYSTEM = (
    "You are an English image describer. Here are some example image "
    "styles:\n\n1. Extreme close-up: Clear focus on a single object with a "
    "blurred background, highlighted under natural sunlight.\n2. Vintage: A "
    "photograph of a historical scene, using techniques such as Daguerreotype "
    "or cyanotype.\n3. Anime: A stylized cartoon image, emphasizing "
    "hyper-realistic portraits and luminous brushwork.\n4. Candid: A natural, "
    "unposed shot capturing spontaneous moments, often with cinematic "
    "qualities.\n5. Landscape: A photorealistic image of natural scenery, "
    "such as a sunrise over the sea.\n6. Design: Colorful and detailed "
    "illustrations, often in the style of 2D game art or botanical "
    "illustrations.\n7. Urban: An ultrarealistic scene in a modern setting, "
    "possibly a cityscape viewed from indoors.\n\nYour task is to translate a "
    "given Chinese image description into a concise and precise English "
    "description. Ensure that the imagery is vivid and descriptive, and "
    "include stylistic elements to enrich the description.\nPlease note the "
    "following points:\n\n1. Capture the essence and mood of the Chinese "
    "description without including direct phrases or words from the examples "
    "provided.\n2. You should add appropriate words to make the images "
    "described in the prompt more aesthetically pleasing. If the Chinese "
    "description does not specify a style, you need to add some stylistic "
    "descriptions based on the essence of the Chinese text.\n3. The generated "
    "English description should not exceed 200 words.\n\n")


def beautiful_prompt(raw_prompt: str, generate: Callable[[str], str],
                     positive: bool = True, version: int = 2) -> str:
    """BeautifulPrompt (reference :6-54): template, generate, append."""
    if not positive:
        return raw_prompt
    template = BEAUTIFUL_PROMPT_TEMPLATE_V2 if version == 2 \
        else BEAUTIFUL_PROMPT_TEMPLATE_V1
    completion = generate(template.format(raw_prompt=raw_prompt)).strip()
    return raw_prompt + ", " + completion


def qwen_prompt(raw_prompt: str,
                generate_chat: Callable[[List[Dict]], str],
                positive: bool = True) -> str:
    """QwenPrompt translator (reference :57-110): zh -> styled en."""
    if not positive:
        return raw_prompt
    conversation = [{"role": "system", "content": QWEN_PROMPT_SYSTEM},
                    {"role": "user", "content": raw_prompt}]
    return generate_chat(conversation).strip()


class QwenPromptRefiner:
    """The reference QwenPrompt (prompt_refiners.py:57-110) with a RUNNABLE
    backend: chat-template application + the greedy KV-cached decode loop
    (models/qwen_vl.py::qwen_vl_text_generate) over a converted Qwen2
    checkpoint. ``from_checkpoint`` is the refiner-checkpoint load path."""

    def __init__(self, backend):
        self.backend = backend

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, dtype=None,
                        max_new_tokens: int = 512) -> "QwenPromptRefiner":
        from goal_force_tpu.prompts.lm_backends import load_qwen_chat_backend

        return cls(load_qwen_chat_backend(ckpt_dir, dtype=dtype,
                                          max_new_tokens=max_new_tokens))

    def __call__(self, raw_prompt: str, positive: bool = True) -> str:
        return qwen_prompt(raw_prompt, self.backend.generate_chat, positive)


class OmostRefiner:
    """The reference OmostPromter (omost.py:235-300) with a runnable Llama-3
    chat backend on the same decode loop; returns the parsed Canvas dict."""

    def __init__(self, backend):
        self.backend = backend

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, dtype=None,
                        max_new_tokens: int = 4096) -> "OmostRefiner":
        from goal_force_tpu.prompts.lm_backends import load_omost_backend

        return cls(load_omost_backend(ckpt_dir, dtype=dtype,
                                      max_new_tokens=max_new_tokens))

    def __call__(self, raw_prompt: str):
        from goal_force_tpu.prompts.omost import omost_compose

        return omost_compose(raw_prompt, self.backend.generate_chat)
