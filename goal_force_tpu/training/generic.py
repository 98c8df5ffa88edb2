"""Family-generic training: LoRA (or full) fine-tuning over any zoo pipeline.

The reference's general-purpose trainer wraps any pipeline in a
DiffusionTrainingModule with PEFT LoRA injection and trains whatever is left
unfrozen (reference: diffsynth/trainers/utils.py:366-628 — models_to_train
selector + add_lora_to_model). The TPU-native shape:

  * adapters live in a parallel pytree selected by PATH PATTERN over the
    model's param tree (works for Wan, Flux, SD, ... — any stacked or flat
    weight layout), merged into the frozen base INSIDE the jitted step;
  * `make_generic_train_step(loss_fn, optimizer, ...)` turns a per-family
    `loss_fn(params, batch, rng)` into a donated jitted step with grad-clip
    and metrics;
  * `train()` runs the epoch loop with step-K safetensors checkpoints —
    the reference ModelLogger contract (utils.py:600-617).
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


# the reference's default LoRA target list q,k,v,o,ffn.0,ffn.2
# (src/goal_force/utils.py:458) generalized as a path pattern over our trees
DEFAULT_PATTERN = (
    r"(self_attn|cross_attn|attn)\.(q|k|v|o|qkv|a_to_qkv|b_to_qkv|a_to_out|"
    r"b_to_out|to_qkv_mlp)\.w$|ffn\.(fc0|fc2)\.w$|ff_[ab]\.(fc0|fc2)\.w$"
    r"|(attn1|attn2)\.(q_w|k_w|v_w|o_w)$"      # SD/SDXL UNet transformers
    r"|single_blocks\.(qkv_mlp|proj_out)\.w$"  # Flux single-stream fused attn
    r"|attn\.(a_qkv|b_qkv|a_out|b_out)\.w$"    # Flux/SD3 joint-stream attn
)


def init_generic_lora(key, params: Dict, pattern: str = DEFAULT_PATTERN,
                      rank: int = 16, dtype=jnp.float32) -> Dict[str, Dict]:
    """Adapters for every >=2-D weight whose tree path matches `pattern`.

    Leading dims of stacked weights (L, in, out) are treated as batch; init is
    PEFT's (A ~ N(0, 1/r), B = 0) so merging starts as identity."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = {}
    matches = [(p, leaf) for p, leaf in flat
               if hasattr(leaf, "ndim") and leaf.ndim >= 2
               and re.search(pattern, _path_str(p))]
    if not matches:
        raise ValueError(f"LoRA pattern {pattern!r} matched no weights")
    keys = jax.random.split(key, len(matches))
    for k_, (p, leaf) in zip(keys, matches):
        lead, (din, dout) = leaf.shape[:-2], leaf.shape[-2:]
        out[_path_str(p)] = {
            "a": (jax.random.normal(k_, (*lead, din, rank)) / rank).astype(dtype),
            "b": jnp.zeros((*lead, rank, dout), dtype),
        }
    return out


def merge_generic_lora(params: Dict, lora: Dict[str, Dict],
                       alpha: Optional[float] = None) -> Dict:
    """params with W += (alpha/r) * A @ B at every adapted path (jit-safe)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    merged = []
    for p, leaf in flat:
        ab = lora.get(_path_str(p))
        if ab is None:
            merged.append(leaf)
            continue
        r = ab["a"].shape[-1]
        delta = jnp.einsum("...ir,...ro->...io", ab["a"], ab["b"]) \
            * ((alpha or r) / r)
        merged.append(leaf + delta.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, merged)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GenericTrainState:
    params: Dict            # the trainable tree (lora adapters or full)
    opt_state: object
    step: jnp.ndarray


def make_generic_train_step(loss_fn: Callable, optimizer) -> Callable:
    """loss_fn(trainable, batch, rng) -> scalar; returns a donated jitted
    step(state, batch, rng) -> (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: GenericTrainState, batch: Dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        gnorm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return (GenericTrainState(params, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": gnorm})

    return step


def lora_flat_state_dict(lora: Dict[str, Dict]) -> Dict[str, np.ndarray]:
    """Path-keyed export (`<path>.lora_A.weight` / `.lora_B.weight`, torch
    layouts) — loadable by `lora_state_dict_to_tree` and, for Wan trees,
    convertible through lora.py's PEFT mapping."""
    out = {}
    for path, ab in lora.items():
        a = np.asarray(ab["a"], np.float32)
        b = np.asarray(ab["b"], np.float32)
        out[f"{path}.lora_A.weight"] = np.ascontiguousarray(
            np.swapaxes(a, -1, -2))
        out[f"{path}.lora_B.weight"] = np.ascontiguousarray(
            np.swapaxes(b, -1, -2))
    return out


def lora_state_dict_to_tree(sd, dtype=jnp.float32) -> Dict[str, Dict]:
    tree: Dict[str, Dict] = {}
    for k, v in sd.items():
        m = re.match(r"(.+)\.lora_([AB])\.weight$", k)
        if not m:
            continue
        path, which = m.group(1), m.group(2)
        tree.setdefault(path, {})[which.lower()] = jnp.asarray(
            np.swapaxes(np.asarray(v), -1, -2), dtype)
    return tree


def train(
    step_fn: Callable,
    state: GenericTrainState,
    batches: Iterable[Dict],
    rng: jax.Array,
    num_epochs: int = 1,
    save_every: int = 0,
    save_dir: Optional[str] = None,
    log_every: int = 10,
    on_log: Optional[Callable[[int, Dict], None]] = None,
) -> GenericTrainState:
    """Epoch loop with step-K safetensors checkpoints (reference ModelLogger
    save contract, utils.py:600-617). `batches` is re-iterated per epoch."""
    from goal_force_tpu.io.safetensors_io import save_safetensors

    step_no = int(state.step)
    for _ in range(num_epochs):
        for batch in batches:
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            step_no += 1
            if on_log and log_every and step_no % log_every == 0:
                on_log(step_no, {k: float(v) for k, v in metrics.items()})
            if save_every and save_dir and step_no % save_every == 0:
                save_safetensors(lora_flat_state_dict(state.params),
                                 f"{save_dir}/step-{step_no}.safetensors")
    return state
