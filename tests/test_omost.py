"""Omost canvas parity vs the reference Canvas implementation."""

import numpy as np
import pytest

from goal_force_tpu.prompts.omost import Canvas, closest_name, omost_compose

from conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

if reference_available():
    import importlib
    import importlib.machinery
    import sys

    pkg = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refprompters", None, is_package=True))
    pkg.__path__ = ["/root/reference/diffsynth/prompters"]
    sys.modules.setdefault("refprompters", pkg)
    # omost imports ..models.model_manager — stub the parents
    par = importlib.util.module_from_spec(
        importlib.machinery.ModuleSpec("refparent", None, is_package=True))
    par.__path__ = ["/root/reference/diffsynth"]


BOT = """Here you go:
```python
canvas = Canvas()
canvas.set_global_description(
    description='A misty forest at dawn',
    detailed_descriptions=['Tall pines fade into fog', 'Soft golden light'],
    tags='forest, mist, dawn',
    HTML_web_color_name='darkslategray',
)
canvas.add_local_description(
    location='on the left',
    offset='slightly to the lower',
    area='a medium-sized vertical area',
    distance_to_viewer=2.5,
    description='A deer standing quietly',
    detailed_descriptions=['Alert ears', 'Dew on its coat'],
    tags='deer, wildlife',
    atmosphere='serene',
    style='photorealistic',
    quality_meta='high detail',
    HTML_web_color_name='saddle brown',
)
canvas.add_local_description(
    location='on the top-right',
    offset='no offset',
    area='a small square area',
    distance_to_viewer=9.0,
    description='The rising sun',
    detailed_descriptions=['Rays through branches'],
    tags='sun',
    atmosphere='hopeful',
    style='soft focus',
    quality_meta='hdr',
    HTML_web_color_name='goldenrod',
)
```"""


def _ref_canvas():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_omost_canvas", "/root/reference/diffsynth/prompters/omost.py")
    # the module imports heavy deps; extract only what we need by executing
    # with stubs for the relative import
    import types

    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("diffsynth", types.ModuleType("diffsynth"))
    models_stub = types.ModuleType("diffsynth.models")
    mm_stub = types.ModuleType("diffsynth.models.model_manager")

    class _MM:  # noqa: N801
        pass

    mm_stub.ModelManager = _MM
    sys.modules["diffsynth.models"] = models_stub
    sys.modules["diffsynth.models.model_manager"] = mm_stub
    mod.__package__ = "diffsynth.prompters"
    prompters_stub = types.ModuleType("diffsynth.prompters")
    prompters_stub.__path__ = ["/root/reference/diffsynth/prompters"]
    sys.modules.setdefault("diffsynth.prompters", prompters_stub)
    spec.loader.exec_module(mod)
    return mod


def test_canvas_parity_with_reference():
    ref = _ref_canvas()
    ref_canvas = ref.Canvas.from_bot_response(BOT)
    ref_out = ref_canvas.process()

    ours = Canvas.from_bot_response(BOT)
    out = ours.process()

    np.testing.assert_array_equal(out["initial_latent"],
                                  ref_out["initial_latent"])
    assert len(out["bag_of_conditions"]) == len(ref_out["bag_of_conditions"])
    for a, b in zip(out["bag_of_conditions"], ref_out["bag_of_conditions"]):
        np.testing.assert_array_equal(a["mask"], b["mask"])
        assert a["prefixes"] == b["prefixes"]
        assert a["suffixes"] == b["suffixes"]


def test_omost_compose_end_to_end():
    out = omost_compose("a forest", lambda conv: BOT)
    assert out["initial_latent"].shape == (90, 90, 3)
    assert len(out["prompts"]) == 2
    assert all(m.shape == (90, 90, 3) for m in out["masks"])
    # fuzzy color names resolve ('saddle brown' -> saddlebrown)
    assert closest_name("saddle brown", {"saddlebrown": 1}) == "saddlebrown"
