"""NexusGen text-to-image pipeline: Qwen2.5-VL AR image embeddings -> Flux.

Mirrors the reference composition (/root/reference/diffsynth/pipelines/
flux_image_new.py:791-812 NexusGenUnit + /root/reference/diffsynth/models/
nexus_gen.py:101-153): the prompt is run through the AR backbone with the
learned 81-entry image-prefill table teacher-forced into the target slot, the
vision-head outputs become the image embeddings, the generation adapter
projects them to the Flux text width, and Flux denoises with that as its
prompt embedding (text ids zero, i.e. the default Flux rope path).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from goal_force_tpu.models.nexus_gen import (
    nexus_ar_image_positions,
    nexus_gen_adapter_forward,
    nexus_gen_target_embeddings,
)
from goal_force_tpu.models.qwen_vl import QwenVLTextConfig


@dataclasses.dataclass
class NexusGenPipeline:
    ar_params: Dict                # qwen_vl text stack (stacked blocks)
    ar_cfg: QwenVLTextConfig
    heads: Dict                    # {"vision_head", "image_prefill"}
    wte: jnp.ndarray               # (vocab, hidden) token embedding table
    adapter: Dict                  # NexusGenAdapter params
    flux: object                   # FluxPipeline
    grid_thw: Tuple[int, int, int] = (1, 18, 18)
    spatial_merge_size: int = 2
    tokenize: Optional[Callable] = None

    @classmethod
    def init_random(cls, key=None, dtype=jnp.float32) -> "NexusGenPipeline":
        from goal_force_tpu.models.qwen_vl import init_qwen_vl_text
        from goal_force_tpu.pipelines.flux import FluxPipeline

        key = jax.random.PRNGKey(0) if key is None else key
        ks = jax.random.split(key, 8)
        cfg = QwenVLTextConfig(hidden_size=32, num_layers=2, num_heads=4,
                               num_kv_heads=2, intermediate_size=48, vocab=64,
                               mrope_section=(1, 1, 2))
        flux = FluxPipeline.init_random(ks[0], dtype=dtype)
        td = flux.dit_cfg.text_dim
        n = lambda k, *s: jax.random.normal(k, s, dtype) * 0.05
        h = cfg.hidden_size
        adapter = {
            "fc0": {"w": n(ks[1], h, td), "b": jnp.zeros((td,), dtype)},
            "ln0": {"scale": jnp.ones((td,), dtype),
                    "bias": jnp.zeros((td,), dtype)},
            "fc1": {"w": n(ks[2], td, td), "b": jnp.zeros((td,), dtype)},
            "ln1": {"scale": jnp.ones((td,), dtype),
                    "bias": jnp.zeros((td,), dtype)},
        }
        # tiny 3x3 target grid -> 9 image tokens
        return cls(
            ar_params=init_qwen_vl_text(ks[3], cfg, dtype),
            ar_cfg=cfg,
            heads={"vision_head": {"w": n(ks[4], h, h)},
                   "image_prefill": n(ks[5], 9, h)},
            wte=n(ks[6], cfg.vocab, h),
            adapter=adapter, flux=flux, grid_thw=(1, 6, 6))

    def _prompt_embeds(self, prompt: str):
        """[text ids..., <vision_start>] embeddings + teacher-forced prefill
        tail, with text/grid M-RoPE position ids."""
        from goal_force_tpu.pipelines.flux import _hash_ids

        ids = np.asarray(self.tokenize(prompt)) if self.tokenize is not None \
            else _hash_ids(prompt, self.wte.shape[0], 12)
        text = jnp.asarray(self.wte)[jnp.asarray(ids, jnp.int32)][None]
        p_len = text.shape[1]                  # includes <vision_start> slot
        table = self.heads["image_prefill"]
        embeds = jnp.concatenate(
            [text, table[None].astype(text.dtype)], axis=1)
        n_img = table.shape[0]
        text_pos = np.tile(np.arange(p_len, dtype=np.int32)[None, None],
                           (3, 1, 1))
        img_pos = nexus_ar_image_positions(p_len, self.grid_thw,
                                           self.spatial_merge_size)
        pos = jnp.asarray(np.concatenate([text_pos, img_pos], axis=2))
        return embeds, pos, n_img

    def __call__(self, prompt: str, **flux_kwargs) -> np.ndarray:
        embeds, pos, n_img = self._prompt_embeds(prompt)
        image_emb = nexus_gen_target_embeddings(
            self.ar_params, self.ar_cfg, self.heads, embeds, pos, n_img)
        ctx = nexus_gen_adapter_forward(self.adapter, image_emb)
        return self.flux(prompt, prompt_emb_override=np.asarray(ctx),
                         **flux_kwargs)
