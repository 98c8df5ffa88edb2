"""LoRA format converters: kohya/civitai <-> PEFT/diffsynth naming, and fusing
deltas into torch-format state dicts before pytree conversion.

Parity targets (all in /root/reference/diffsynth/models/lora.py):
  - LoRAFromCivitai.convert_state_dict_up_down (:30-51) / convert_state_dict_AB
    (:53-74): kohya `lora_up/lora_down` or PEFT `lora_A/lora_B` pairs -> dense
    deltas alpha * up @ down under the model's own key naming.
  - SD/SDXL/Flux special-key tables (:125-198) that undo kohya's `_`-flattening.
  - FluxLoRAConverter.align_to_opensource_format / align_to_diffsynth_format
    (:275-370): diffsynth PEFT keys <-> kohya double/single-block keys.

TPU design: instead of mutating nn.Modules, deltas are fused into the TORCH-format
state dict (the reference's `load` adds into model.state_dict() the same way,
:76-97) and the result flows through the existing family converters
(flux_dit_params_from_torch, sd_unet_params_from_civitai, ...), so every model
family gets LoRA loading without per-family apply code.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import numpy as np

# Reference lora.py:125-150 (SDLoRAFromCivitai.special_keys)
SD_SPECIAL_KEYS = {
    "down.blocks": "down_blocks",
    "up.blocks": "up_blocks",
    "mid.block": "mid_block",
    "proj.in": "proj_in",
    "proj.out": "proj_out",
    "transformer.blocks": "transformer_blocks",
    "to.q": "to_q",
    "to.k": "to_k",
    "to.v": "to_v",
    "to.out": "to_out",
    "text.model": "text_model",
    "self.attn.q.proj": "self_attn.q_proj",
    "self.attn.k.proj": "self_attn.k_proj",
    "self.attn.v.proj": "self_attn.v_proj",
    "self.attn.out.proj": "self_attn.out_proj",
    "input.blocks": "model.diffusion_model.input_blocks",
    "middle.block": "model.diffusion_model.middle_block",
    "output.blocks": "model.diffusion_model.output_blocks",
}

# Reference lora.py:152-178 (SDXL adds the conditioner.embedders prefixes)
SDXL_SPECIAL_KEYS = dict(SD_SPECIAL_KEYS)
SDXL_SPECIAL_KEYS.update({
    "text.model": "conditioner.embedders.0.transformer.text_model",
    "2conditioner.embedders.0.transformer.text_model.encoder.layers":
        "text_model.encoder.layers",
})

# Reference lora.py:181-198 (FluxLoRAFromCivitai.special_keys)
FLUX_SPECIAL_KEYS = {
    "single.blocks": "single_blocks",
    "double.blocks": "double_blocks",
    "img.attn": "img_attn",
    "img.mlp": "img_mlp",
    "img.mod": "img_mod",
    "txt.attn": "txt_attn",
    "txt.mlp": "txt_mlp",
    "txt.mod": "txt_mod",
}

_PREFIX_TABLES = {"sd": SD_SPECIAL_KEYS, "sdxl": SDXL_SPECIAL_KEYS,
                  "flux": FLUX_SPECIAL_KEYS, "wan": {}}


def civitai_lora_deltas(lora_sd: Mapping[str, np.ndarray],
                        lora_prefix: str = "lora_unet_",
                        alpha: float = 1.0,
                        special_keys: Optional[Dict[str, str]] = None,
                        renamed_prefix: str = "") -> Dict[str, np.ndarray]:
    """kohya (`lora_up/lora_down`) or PEFT (`lora_A/lora_B`) state dict ->
    {model key: dense delta} (reference convert_state_dict dispatch :23-74)."""
    if any(".lora_up" in k for k in lora_sd):
        return _deltas_up_down(lora_sd, lora_prefix, alpha, special_keys or {},
                               renamed_prefix)
    return _deltas_ab(lora_sd, lora_prefix, alpha)


def _mm(up: np.ndarray, down: np.ndarray, alpha: float) -> np.ndarray:
    if up.ndim == 4:  # 1x1 conv LoRA: squeeze, matmul, unsqueeze (:41-43)
        w = alpha * (up[..., 0, 0].astype(np.float32)
                     @ down[..., 0, 0].astype(np.float32))
        return w[..., None, None]
    return alpha * (up.astype(np.float32) @ down.astype(np.float32))


def _deltas_up_down(lora_sd, lora_prefix, alpha, special_keys, renamed_prefix):
    out = {}
    for key in lora_sd:
        if ".lora_up" not in key or not key.startswith(lora_prefix):
            continue
        up = np.asarray(lora_sd[key])
        down = np.asarray(lora_sd[key.replace(".lora_up", ".lora_down")])
        target = (key.split(".")[0].replace(lora_prefix, renamed_prefix)
                  .replace("_", ".") + ".weight")
        for sk, repl in special_keys.items():
            target = target.replace(sk, repl)
        out[target] = _mm(up, down, alpha)
    return out


def _deltas_ab(lora_sd, lora_prefix, alpha):
    out = {}
    for key in lora_sd:
        if ".lora_B." not in key or not key.startswith(lora_prefix):
            continue
        up = np.asarray(lora_sd[key])
        down = np.asarray(lora_sd[key.replace(".lora_B.", ".lora_A.")])
        keys = key.split(".")
        keys.pop(keys.index("lora_B"))
        target = ".".join(keys)[len(lora_prefix):]
        out[target] = _mm(up, down, alpha)
    return out


def fuse_deltas(sd: Dict[str, np.ndarray], deltas: Mapping[str, np.ndarray]) -> int:
    """W += delta for every matching key; returns the number of tensors updated
    (reference load() :87-96). Unmatched delta keys are left alone so callers can
    try several naming conventions."""
    n = 0
    for name, delta in deltas.items():
        if name in sd:
            base = np.asarray(sd[name])
            sd[name] = base + delta.reshape(base.shape).astype(base.dtype)
            n += 1
    return n


# ---------------------------------------------------------------------------
# Flux kohya <-> diffsynth-PEFT (reference FluxLoRAConverter :275-370)
# ---------------------------------------------------------------------------

_FLUX_MIDDLE = {
    "norm.linear": "modulation_lin",
    "to_qkv_mlp": "linear1",
    "proj_out": "linear2",
    "norm1_a.linear": "img_mod_lin",
    "norm1_b.linear": "txt_mod_lin",
    "attn.a_to_qkv": "img_attn_qkv",
    "attn.b_to_qkv": "txt_attn_qkv",
    "attn.a_to_out": "img_attn_proj",
    "attn.b_to_out": "txt_attn_proj",
    "ff_a.0": "img_mlp_0",
    "ff_a.2": "img_mlp_2",
    "ff_b.0": "txt_mlp_0",
    "ff_b.2": "txt_mlp_2",
}
_FLUX_MIDDLE_INV = {v: k for k, v in _FLUX_MIDDLE.items()}


def flux_lora_to_kohya(state_dict: Mapping[str, np.ndarray],
                       alpha: Optional[float] = None) -> Dict[str, np.ndarray]:
    """diffsynth-PEFT Flux LoRA keys -> kohya opensource format, adding per-pair
    `alpha` scalars (reference align_to_opensource_format :279-322)."""
    prefix_rename = {"single_blocks": "lora_unet_single_blocks",
                     "blocks": "lora_unet_double_blocks"}
    suffix_rename = {"lora_B.weight": "lora_up.weight",
                     "lora_A.weight": "lora_down.weight"}
    out = {}
    for name, param in state_dict.items():
        names = name.split(".")
        if names[-2] != "lora_A" and names[-2] != "lora_B":
            names.pop(-2)  # drop the '.default.' adapter name
        prefix, block_id = names[0], names[1]
        middle = ".".join(names[2:-2])
        suffix = ".".join(names[-2:])
        if middle not in _FLUX_MIDDLE or prefix not in prefix_rename:
            continue
        rename = (prefix_rename[prefix] + "_" + block_id + "_"
                  + _FLUX_MIDDLE[middle] + "." + suffix_rename[suffix])
        out[rename] = np.asarray(param)
        if rename.endswith("lora_up.weight"):
            lora_alpha = alpha if alpha is not None else param.shape[-1]
            out[rename.replace("lora_up.weight", "alpha")] = np.float32(lora_alpha)
    return out


def flux_lora_from_kohya(state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """kohya Flux LoRA keys -> diffsynth-PEFT keys (reference
    align_to_diffsynth_format :324-369). Unrecognized keys pass through."""
    updown = {"lora_down": "lora_A", "lora_up": "lora_B"}
    out = {}
    for name, param in state_dict.items():
        parsed = _parse_kohya_flux(name)
        if parsed is None:
            out[name] = np.asarray(param)
            continue
        stream, block_id, middle, ud = parsed
        prefix = "single_blocks" if stream == "single" else "blocks"
        out[f"{prefix}.{block_id}.{_FLUX_MIDDLE_INV[middle]}."
            f"{updown[ud]}.default.weight"] = np.asarray(param)
    return out


def _parse_kohya_flux(name: str):
    for stream in ("single", "double"):
        pre = f"lora_unet_{stream}_blocks_"
        if not name.startswith(pre):
            continue
        rest = name[len(pre):]
        block_id, _, tail = rest.partition("_")
        if not block_id.isdigit():
            continue
        middle, _, suffix = tail.partition(".")
        if suffix.startswith("lora_down"):
            return stream, block_id, middle, "lora_down"
        if suffix.startswith("lora_up"):
            return stream, block_id, middle, "lora_up"
    return None


def fuse_flux_lora(sd: Dict[str, np.ndarray], lora_sd: Mapping[str, np.ndarray],
                   alpha: float = 1.0) -> int:
    """Fuse a Flux LoRA (kohya or diffsynth-PEFT format) into a diffsynth-format
    FluxDiT state dict; returns tensors updated. Use before
    flux_dit_params_from_torch."""
    if any(_parse_kohya_flux(k) for k in lora_sd):
        lora_sd = flux_lora_from_kohya(lora_sd)
    # strip PEFT adapter names (lora_A.default.weight -> lora_A.weight)
    lora_sd = {k.replace(".default.", "."): v for k, v in lora_sd.items()}
    deltas = _deltas_ab(lora_sd, "", alpha)
    return fuse_deltas(sd, deltas)
