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
    def from_pretrained(
        cls,
        ar_path,                          # Qwen2.5-VL text stack (+wte)
        heads_path=None,                  # vision_head + image_prefill table
        adapter_path=None,                # adapter.{0,1,3,4} MLP
        flux=None,                        # a FluxPipeline (build it via
        #   FluxPipeline.from_pretrained for the generation backbone)
        grid_thw=(1, 18, 18),
        tokenizer_dir=None,
        dtype=jnp.float32,
        ar_num_heads=None,
    ) -> "NexusGenPipeline":
        """NexusGen 'load weights, generate' (reference ModelManager NexusGen
        rows: the AR Qwen2.5-VL model with its vision head + prefill table,
        the embedding adapter, over a Flux backbone)."""
        from goal_force_tpu.io.auto import load_model, load_weights
        from goal_force_tpu.models.nexus_gen import (
            nexus_gen_adapter_params_from_torch,
            nexus_gen_ar_heads_from_torch,
        )
        from goal_force_tpu.pipelines.flux import FluxPipeline

        to_dev = lambda tree: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), tree)
        r = load_model(ar_path, num_heads=ar_num_heads)
        if r["kind"] not in ("qwen_vl_text", "llama"):
            raise ValueError(f"{ar_path} detected as {r['kind']!r}")
        ar_sd = load_weights(ar_path)
        wte_key = "model.embed_tokens.weight" \
            if "model.embed_tokens.weight" in ar_sd else "embed_tokens.weight"
        heads_sd = load_weights(heads_path) if heads_path is not None else ar_sd
        adapter_sd = load_weights(adapter_path) if adapter_path is not None else ar_sd
        tok = None
        if tokenizer_dir is not None:
            from goal_force_tpu.prompters import load_text_tokenizer

            tok = load_text_tokenizer(tokenizer_dir, 64).encode
        return cls(
            ar_params=to_dev(r["params"]), ar_cfg=r["config"],
            heads=to_dev(nexus_gen_ar_heads_from_torch(heads_sd)),
            wte=jnp.asarray(np.asarray(ar_sd[wte_key]), dtype),
            adapter=to_dev(nexus_gen_adapter_params_from_torch(adapter_sd)),
            flux=flux if flux is not None else FluxPipeline.init_random(dtype=dtype),
            grid_thw=tuple(grid_thw), tokenize=tok,
        )

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

    def edit(self, prompt: str, ref_image_embeds, ref_grid_thw,
             merger: Dict, merger_cfg, height: int = 1024, width: int = 1024,
             **flux_kwargs) -> np.ndarray:
        """Image editing (reference flux_image_new.py:800-835 + nexus_gen.py:
        93-116): the AR sequence interleaves [text, reference-image slot,
        text, target slot]; the teacher-forced target embeddings and the
        reference vision-tower embeddings go through the editing merger, and
        Flux denoises with spatial text ids (target grid scaled onto the
        latent grid, reference grid on rope axis-0=1)."""
        from goal_force_tpu.models.nexus_gen import (
            nexus_editing_rope_tables,
            nexus_gen_merger_forward,
        )
        from goal_force_tpu.models.qwen_vl import get_rope_index
        from goal_force_tpu.pipelines.flux import _hash_ids

        ref = jnp.asarray(ref_image_embeds)
        table = self.heads["image_prefill"]
        n_img, h = table.shape
        s_ref = ref.shape[1]
        merge = self.spatial_merge_size

        vocab = self.wte.shape[0]
        ids_a = _hash_ids(prompt, vocab, 4)
        ids_b = _hash_ids("assistant:" + prompt, vocab, 4)
        img_id = vocab  # sentinel outside the text vocab
        ids = np.concatenate([
            ids_a, np.full(s_ref, img_id), ids_b, np.full(n_img, img_id),
        ])[None].astype(np.int64)
        # grids are UNMERGED (h, w); s_ref/n_img are merged token counts
        pos = get_rope_index(ids, [tuple(ref_grid_thw), tuple(self.grid_thw)],
                             img_id, -1, merge)

        wte = jnp.asarray(self.wte)
        text_a = wte[jnp.asarray(ids_a, jnp.int32)][None]
        text_b = wte[jnp.asarray(ids_b, jnp.int32)][None]
        embeds = jnp.concatenate(
            [text_a, ref.astype(text_a.dtype), text_b,
             table[None].astype(text_a.dtype)], axis=1)

        target_emb = nexus_gen_target_embeddings(
            self.ar_params, self.ar_cfg, self.heads, embeds,
            jnp.asarray(pos), n_img)
        ctx = nexus_gen_merger_forward(merger, merger_cfg, target_emb,
                                       self.grid_thw, ref, ref_grid_thw)

        # latent grid after VAE + 2x2 patchify
        gh = height // self.flux.vae_factor // 2
        gw = width // self.flux.vae_factor // 2
        tables = nexus_editing_rope_tables(
            gh, gw, (self.grid_thw[1], self.grid_thw[2]),
            (ref_grid_thw[1], ref_grid_thw[2]),
            tuple(self.flux.dit_cfg.axes_dim), self.flux.dit_cfg.rope_theta)
        return self.flux(prompt, prompt_emb_override=np.asarray(ctx),
                         rope_tables_override=tables, height=height,
                         width=width, **flux_kwargs)
