"""Omost canvas prompt composer.

Behavioral parity with /root/reference/diffsynth/prompters/omost.py: an LLM
emits python code driving a `Canvas` DSL; the canvas resolves fuzzy color /
location / offset / area names (difflib closest match over fixed vocabularies
:98-108), rasterizes components into a 90x90 color sketch sorted far-to-near
(:198-210), and yields per-region masks + composed prompts (:212-232,
:296-310). The LLM itself is pluggable (`generate` callable) — the reference
wraps an HF causal LM the same way (:270-294).
"""

from __future__ import annotations

import difflib
import re
from typing import Callable, Dict, List, Optional

import numpy as np

# Standard HTML web color table (CSS3 named colors).
_COLOR_TABLE = """
aliceblue:240,248,255 antiquewhite:250,235,215 aqua:0,255,255
aquamarine:127,255,212 azure:240,255,255 beige:245,245,220 bisque:255,228,196
black:0,0,0 blanchedalmond:255,235,205 blue:0,0,255 blueviolet:138,43,226
brown:165,42,42 burlywood:222,184,135 cadetblue:95,158,160
chartreuse:127,255,0 chocolate:210,105,30 coral:255,127,80
cornflowerblue:100,149,237 cornsilk:255,248,220 crimson:220,20,60
cyan:0,255,255 darkblue:0,0,139 darkcyan:0,139,139 darkgoldenrod:184,134,11
darkgray:169,169,169 darkgrey:169,169,169 darkgreen:0,100,0
darkkhaki:189,183,107 darkmagenta:139,0,139 darkolivegreen:85,107,47
darkorange:255,140,0 darkorchid:153,50,204 darkred:139,0,0
darksalmon:233,150,122 darkseagreen:143,188,143 darkslateblue:72,61,139
darkslategray:47,79,79 darkslategrey:47,79,79 darkturquoise:0,206,209
darkviolet:148,0,211 deeppink:255,20,147 deepskyblue:0,191,255
dimgray:105,105,105 dimgrey:105,105,105 dodgerblue:30,144,255
firebrick:178,34,34 floralwhite:255,250,240 forestgreen:34,139,34
fuchsia:255,0,255 gainsboro:220,220,220 ghostwhite:248,248,255
gold:255,215,0 goldenrod:218,165,32 gray:128,128,128 grey:128,128,128
green:0,128,0 greenyellow:173,255,47 honeydew:240,255,240
hotpink:255,105,180 indianred:205,92,92 indigo:75,0,130 ivory:255,255,240
khaki:240,230,140 lavender:230,230,250 lavenderblush:255,240,245
lawngreen:124,252,0 lemonchiffon:255,250,205 lightblue:173,216,230
lightcoral:240,128,128 lightcyan:224,255,255
lightgoldenrodyellow:250,250,210 lightgray:211,211,211
lightgrey:211,211,211 lightgreen:144,238,144 lightpink:255,182,193
lightsalmon:255,160,122 lightseagreen:32,178,170 lightskyblue:135,206,250
lightslategray:119,136,153 lightslategrey:119,136,153
lightsteelblue:176,196,222 lightyellow:255,255,224 lime:0,255,0
limegreen:50,205,50 linen:250,240,230 magenta:255,0,255 maroon:128,0,0
mediumaquamarine:102,205,170 mediumblue:0,0,205 mediumorchid:186,85,211
mediumpurple:147,112,219 mediumseagreen:60,179,113
mediumslateblue:123,104,238 mediumspringgreen:0,250,154
mediumturquoise:72,209,204 mediumvioletred:199,21,133
midnightblue:25,25,112 mintcream:245,255,250 mistyrose:255,228,225
moccasin:255,228,181 navajowhite:255,222,173 navy:0,0,128 navyblue:0,0,128
oldlace:253,245,230 olive:128,128,0 olivedrab:107,142,35 orange:255,165,0
orangered:255,69,0 orchid:218,112,214 palegoldenrod:238,232,170
palegreen:152,251,152 paleturquoise:175,238,238 palevioletred:219,112,147
papayawhip:255,239,213 peachpuff:255,218,185 peru:205,133,63
pink:255,192,203 plum:221,160,221 powderblue:176,224,230 purple:128,0,128
rebeccapurple:102,51,153 red:255,0,0 rosybrown:188,143,143
royalblue:65,105,225 saddlebrown:139,69,19 salmon:250,128,114
sandybrown:244,164,96 seagreen:46,139,87 seashell:255,245,238
sienna:160,82,45 silver:192,192,192 skyblue:135,206,235
slateblue:106,90,205 slategray:112,128,144 slategrey:112,128,144
snow:255,250,250 springgreen:0,255,127 steelblue:70,130,180
tan:210,180,140 teal:0,128,128 thistle:216,191,216 tomato:255,99,71
turquoise:64,224,208 violet:238,130,238 wheat:245,222,179 white:255,255,255
whitesmoke:245,245,245 yellow:255,255,0 yellowgreen:154,205,50
"""

VALID_COLORS: Dict[str, tuple] = {
    name: tuple(int(v) for v in rgb.split(","))
    for name, rgb in (entry.split(":") for entry in _COLOR_TABLE.split())
}

VALID_LOCATIONS = {
    "in the center": (45, 45), "on the left": (15, 45),
    "on the right": (75, 45), "on the top": (45, 15),
    "on the bottom": (45, 75), "on the top-left": (15, 15),
    "on the top-right": (75, 15), "on the bottom-left": (15, 75),
    "on the bottom-right": (75, 75),
}

VALID_OFFSETS = {
    "no offset": (0, 0), "slightly to the left": (-10, 0),
    "slightly to the right": (10, 0), "slightly to the upper": (0, -10),
    "slightly to the lower": (0, 10), "slightly to the upper-left": (-10, -10),
    "slightly to the upper-right": (10, -10),
    "slightly to the lower-left": (-10, 10),
    "slightly to the lower-right": (10, 10),
}

VALID_AREAS = {
    "a small square area": (50, 50), "a small vertical area": (40, 60),
    "a small horizontal area": (60, 40),
    "a medium-sized square area": (60, 60),
    "a medium-sized vertical area": (50, 80),
    "a medium-sized horizontal area": (80, 50),
    "a large square area": (70, 70), "a large vertical area": (60, 90),
    "a large horizontal area": (90, 60),
}


def _safe_str(x: str) -> str:
    return x.strip(",. ") + "."


def closest_name(value: str, options: Dict) -> str:
    """Fuzzy-correct an LLM-produced name to the closest vocabulary entry."""
    value = value.lower()
    match = difflib.get_close_matches(value, list(options), n=1, cutoff=0.5)
    if not match:
        raise ValueError(f"the value [{value}] is not valid")
    return match[0]


class Canvas:
    """The DSL object the Omost LLM's generated code drives."""

    GRID = 90

    def __init__(self):
        self.components: List[Dict] = []
        self.color: Optional[np.ndarray] = None
        self.record_tags = True
        self.prefixes: List[str] = []
        self.suffixes: List[str] = []

    @staticmethod
    def from_bot_response(response: str) -> "Canvas":
        match = re.search(r"```python\n(.*?)\n```", response, re.DOTALL)
        if not match:
            raise ValueError("response does not contain a python code block")
        code = match.group(1)
        if "canvas = Canvas()" not in code:
            raise ValueError("code block must create a canvas variable")
        scope: Dict = {"Canvas": Canvas}
        exec(code, {}, scope)
        canvas = scope.get("canvas")
        if not isinstance(canvas, Canvas):
            raise ValueError("code block must produce a Canvas instance")
        return canvas

    def set_global_description(self, description: str,
                               detailed_descriptions: List[str], tags: str,
                               HTML_web_color_name: str):
        color = closest_name(HTML_web_color_name, VALID_COLORS)
        self.color = np.array([[VALID_COLORS[color]]], dtype=np.uint8)
        self.prefixes = [_safe_str(description)]
        suffixes = list(detailed_descriptions)
        if self.record_tags:
            suffixes.append(tags)
        self.suffixes = [_safe_str(s) for s in suffixes]

    def add_local_description(self, location: str, offset: str, area: str,
                              distance_to_viewer: float, description: str,
                              detailed_descriptions: List[str], tags: str,
                              atmosphere: str, style: str, quality_meta: str,
                              HTML_web_color_name: str):
        if not (isinstance(distance_to_viewer, (int, float))
                and distance_to_viewer > 0):
            raise ValueError(
                f"distance_to_viewer for [{description}] must be positive")
        location = closest_name(location, VALID_LOCATIONS)
        offset = closest_name(offset, VALID_OFFSETS)
        area = closest_name(area, VALID_AREAS)
        color = closest_name(HTML_web_color_name, VALID_COLORS)

        xb, yb = VALID_LOCATIONS[location]
        xo, yo = VALID_OFFSETS[offset]
        w, h = VALID_AREAS[area]
        rect = [yb + yo - h // 2, yb + yo + h // 2,
                xb + xo - w // 2, xb + xo + w // 2]
        rect = [max(0, min(self.GRID, v)) for v in rect]

        suffixes = list(detailed_descriptions)
        if self.record_tags:
            suffixes += [tags, atmosphere, style, quality_meta]
        self.components.append({
            "rect": rect,
            "distance_to_viewer": distance_to_viewer,
            "color": np.array([[VALID_COLORS[color]]], dtype=np.uint8),
            "prefixes": [_safe_str(s) for s in self.prefixes + [description]],
            "suffixes": [_safe_str(s) for s in suffixes],
            "location": location,
        })

    def process(self) -> Dict:
        """Far-to-near rasterization + per-region condition bags (:198-232)."""
        comps = sorted(self.components, key=lambda c: c["distance_to_viewer"],
                       reverse=True)
        g = self.GRID
        sketch = np.zeros((g, g, 3), np.float32) + self.color
        for comp in comps:
            a, b, c, d = comp["rect"]
            sketch[a:b, c:d] = 0.7 * comp["color"] + 0.3 * sketch[a:b, c:d]
        sketch = sketch.clip(0, 255).astype(np.uint8)

        bag = [{"mask": np.ones((g, g), np.float32),
                "prefixes": self.prefixes, "suffixes": self.suffixes,
                "location": "full"}]
        for comp in comps:
            a, b, c, d = comp["rect"]
            m = np.zeros((g, g), np.float32)
            m[a:b, c:d] = 1.0
            bag.append({"mask": m, "prefixes": comp["prefixes"],
                        "suffixes": comp["suffixes"],
                        "location": comp["location"]})
        return {"initial_latent": sketch, "bag_of_conditions": bag}


OMOST_SYSTEM_TEMPLATE = (
    "You are a helpful AI assistant to compose images using the below python "
    "class `Canvas`:\n```python\nclass Canvas:\n"
    "    def set_global_description(self, description: str, "
    "detailed_descriptions: list[str], tags: str, "
    "HTML_web_color_name: str): ...\n"
    "    def add_local_description(self, location: str, offset: str, "
    "area: str, distance_to_viewer: float, description: str, "
    "detailed_descriptions: list[str], tags: str, atmosphere: str, "
    "style: str, quality_meta: str, HTML_web_color_name: str): ...\n```")


def omost_compose(prompt: str, generate: Callable[[List[Dict]], str]) -> Dict:
    """Run the LLM (pluggable `generate(conversation) -> text`), parse the
    canvas, and return {prompt, prompts, masks, initial_latent, ...}
    (reference OmostPromter.__call__ :270-319)."""
    conversation = [{"role": "system", "content": OMOST_SYSTEM_TEMPLATE},
                    {"role": "user", "content": prompt}]
    canvas = Canvas.from_bot_response(generate(conversation))
    out = canvas.process()
    prompts = [" ".join(c["prefixes"] + c["suffixes"][:2])
               for c in out["bag_of_conditions"]]
    out["prompt"] = prompts[0]
    out["prompts"] = prompts[1:]
    masks = []
    for c in out["bag_of_conditions"]:
        m = c["mask"].copy()
        m[m > 0.5] = 255
        masks.append(np.stack([m] * 3, axis=-1).astype(np.uint8))
    out["masks"] = masks
    return out
