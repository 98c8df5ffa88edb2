"""Converter key-coverage audit (VERDICT round-2 #9).

Two guarantees per family, the closest real-weights-readiness proof available
in a zero-egress environment:

1. **Full consumption**: running the converter over a reference-format state
   dict consumes EVERY key (tracked via a recording dict) — no silently
   dropped weights.
2. **Key-set fidelity** (families whose reference class hardcodes the released
   geometry and is assembled via __new__ in zoo_ckpts): the fixture's key set
   equals the real class's `meta`-device key set up to block indices — so the
   audit in (1) covers the real checkpoint layout, not a subset.
"""

import re

import numpy as np
import pytest

from conftest import reference_available

import zoo_ckpts as Z

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")


class Tracker(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        self.consumed.add(k)
        return super().get(k, default)

    def __contains__(self, k):
        return super().__contains__(k)


def _audit(sd, run, ignore=()):
    tr = Tracker(sd)
    run(tr)
    missed = {k for k in sd if k not in tr.consumed
              and not any(re.search(p, k) for p in ignore)}
    assert not missed, f"converter ignored {len(missed)} keys: {sorted(missed)[:8]}"


# ---------------------------------------------------------------------------
# 1. Full-consumption audits over every family converter
# ---------------------------------------------------------------------------

def _load(kind=None, **kw):
    from goal_force_tpu.io.auto import load_model

    return lambda sd: load_model(sd, kind=kind, **kw)


CASES = [
    ("flux_dit", Z.build_flux_dit, {"num_heads": 4, "axes_dim": (4, 6, 6)}, ()),
    ("sd3_dit", Z.build_sd3_dit, {}, ()),
    ("hunyuan_video_dit", Z.build_hunyuan_video_dit,
     {"num_heads": 24, "rope_dims": (2, 2, 2)}, ()),
    ("qwen_image_dit", Z.build_qwen_image_dit, {"axes_dim": (4, 6, 6)}, ()),
    ("cog_dit", Z.build_cog_dit, {"rope_dim": 16}, ()),
    ("stepvideo_dit", Z.build_stepvideo_dit, {}, ()),
    ("hunyuan_dit", Z.build_hunyuan_dit, {"num_heads": 4}, ()),
    ("chatglm", Z.build_chatglm, {"num_heads": 4},
     (r"rotary_pos_emb", r"output_layer")),   # derived / LM-head, unused by
    # the encoder the pipeline runs (reference kolors uses hidden states only)
    ("t5_encoder", Z.build_t5, {"num_heads": 4}, ()),
]


@pytest.mark.parametrize("name,build,kw,ignore", CASES,
                         ids=[c[0] for c in CASES])
def test_converter_consumes_all_keys(name, build, kw, ignore):
    sd, _ = build()
    _audit(sd, _load(**kw), ignore=ignore)


def test_omnigen_converter_consumes_all_keys():
    from test_omnigen import LONG, SHORT

    sd, cfg = Z.build_omnigen()
    _audit(sd, _load(num_heads=cfg.num_heads,
                     original_max_positions=cfg.original_max_positions,
                     max_positions=cfg.max_positions,
                     rope_short_factor=SHORT, rope_long_factor=LONG,
                     pos_embed_max_size=cfg.pos_embed_max_size),
           # HF Phi-3 rotary inv_freq buffers are derived, not weights;
           # pos_embed is the 2D sin-cos table our forward computes on the fly
           # (golden parity in test_omnigen proves the computed table matches)
           ignore=(r"rotary_emb", r"llm\.norm", r"norm\.weight$",
                   r"^pos_embed$"))


def test_clip_and_unet_converters_consume_all_keys():
    for variant in ("sd", "sdxl1", "sdxl2"):
        sd, _ = Z.build_clip_text_encoder(variant)
        # position_ids is a buffer in some exports; absent here
        _audit(sd, _load(num_heads=4), ignore=(r"position_ids",))
    sd, meta = Z.build_sdxl_unet()
    _audit(sd, _load(plan=meta["plan"]))
    sd, plan = Z.build_svd_unet()
    _audit(sd, _load(kind="svd_unet", plan=plan))


def test_vae_converters_consume_all_keys():
    enc, dec, plans = Z.build_sd3_vae_pair()
    _audit(enc, _load(plan=plans[0]))
    _audit(dec, _load(plan=plans[1]))
    enc, dec, plans = Z.build_sd_vae_pair()
    _audit(enc, _load(plan=plans[0]))
    _audit(dec, _load(plan=plans[1]))
    sd, cfg = Z.build_stepvideo_vae()
    _audit(sd, _load(vae_cfg=cfg))


def test_llama_family_converters_consume_all_keys():
    sd, _ = Z.build_llama()
    # the final norm is not part of the skip-2 hidden-state contract
    _audit(sd, _load(num_heads=4), ignore=(r"^norm\.weight$", r"rotary",))
    sd, _ = Z.build_qwen_vl_text()
    _audit(sd, _load(num_heads=4),
           ignore=(r"rotary", r"model\.norm\.weight$"))
    sd, _ = Z.build_bert()
    _audit(sd, _load(num_heads=4), ignore=(r"position_ids",))


# ---------------------------------------------------------------------------
# 2. Fixture key sets match the REAL hardcoded classes (meta device)
# ---------------------------------------------------------------------------

def _canon(keys):
    return {re.sub(r"\.\d+\.", ".N.", k) for k in keys}


def test_flux_fixture_keys_match_real_class():
    import torch

    ref_flux = Z.refmodels("flux_dit")
    with torch.device("meta"):
        real = ref_flux.FluxDiT()
    sd, _ = Z.build_flux_dit()
    assert _canon(sd) == _canon(real.state_dict().keys())


def test_qwen_image_fixture_keys_match_real_class():
    import torch

    ref_qwen = Z.refmodels("qwen_image_dit")
    with torch.device("meta"):
        real = ref_qwen.QwenImageDiT()
    sd, _ = Z.build_qwen_image_dit()
    assert _canon(sd) == _canon(real.state_dict().keys())


def test_cog_fixture_keys_match_real_class():
    import torch

    ref_cog = Z.refmodels("cog_dit")
    with torch.device("meta"):
        real = ref_cog.CogDiT()
    sd, _ = Z.build_cog_dit()
    assert _canon(sd) == _canon(real.state_dict().keys())


def test_hunyuan_dit_fixture_keys_match_real_class():
    import torch

    ref_hy = Z.refmodels("hunyuan_dit")
    with torch.device("meta"):
        real = ref_hy.HunyuanDiT()
    sd, _ = Z.build_hunyuan_dit()
    assert _canon(sd) == _canon(real.state_dict().keys())
