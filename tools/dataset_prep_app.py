#!/usr/bin/env python
"""Goal-force dataset preparation web app.

Capability parity with the reference Flask apps
(/root/reference/scripts/test_dataset_preprocessing/app_dataset_preprocessing_goal_force
.py:60-196): crop/resize images to 832x480, click-to-pick pixel coordinates (CSV stores
bottom-left-origin y), enter forces/masses, append rows to a metadata CSV, optional
prompt upscaling through an LLM API (gated on OPENAI_API_KEY; this environment has no
egress so it degrades to a no-op note).

Implemented on the stdlib http.server (flask is not in this image).

Usage: python tools/dataset_prep_app.py --output_dir data/my_set --port 7860
"""

from __future__ import annotations

import argparse
import base64
import csv
import io
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from PIL import Image

CSV_FIELDS = [
    "image", "projectile_force_angle", "projectile_force_magnitude",
    "projectile_coordx", "projectile_coordy", "projectile_mass",
    "target_indirect_force_angle", "target_indirect_force_magnitude",
    "target_coordx", "target_coordy", "target_mass", "width", "height", "caption",
]

PAGE = """<!doctype html>
<html><head><title>goal-force dataset prep</title>
<style>
 body { font-family: sans-serif; margin: 2em; max-width: 1000px; }
 canvas { border: 1px solid #888; cursor: crosshair; }
 label { display: inline-block; width: 220px; }
 input { margin: 2px; } .row { margin: 4px 0; }
 #coords { font-weight: bold; color: #06c; }
</style></head>
<body>
<h2>goal-force dataset prep</h2>
<p>1. Choose an image (cropped+resized to 832x480 on upload). 2. Click the canvas to pick
coordinates (first click = projectile, second = target; y is stored bottom-left origin).
3. Fill the physics fields. 4. Write the CSV row.</p>
<input type="file" id="file" accept="image/*"><br><br>
<canvas id="cv" width="832" height="480"></canvas>
<div id="coords">click to set projectile, then target</div>
<form id="form">
 <div class="row"><label>caption</label><input name="caption" size="60"></div>
 <div class="row"><label>projectile_force_angle</label><input name="projectile_force_angle" value="-1"></div>
 <div class="row"><label>projectile_force_magnitude</label><input name="projectile_force_magnitude" value="-1"></div>
 <div class="row"><label>projectile_mass</label><input name="projectile_mass" value="-1"></div>
 <div class="row"><label>target_indirect_force_angle</label><input name="target_indirect_force_angle" value="-1"></div>
 <div class="row"><label>target_indirect_force_magnitude</label><input name="target_indirect_force_magnitude" value="-1"></div>
 <div class="row"><label>target_mass</label><input name="target_mass" value="-1"></div>
</form>
<button onclick="optimize()">optimize prompt</button>
<button onclick="writeRow()">write CSV row</button>
<pre id="log"></pre>
<script>
let img = null, fname = null, picks = [];
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
document.getElementById('file').onchange = async (e) => {
  const f = e.target.files[0];
  const b64 = await new Promise(r => { const fr = new FileReader();
    fr.onload = () => r(fr.result.split(',')[1]); fr.readAsDataURL(f); });
  const resp = await fetch('/crop', {method: 'POST', headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({image_b64: b64, filename: f.name})});
  const data = await resp.json();
  fname = data.filename;
  img = new Image();
  img.onload = () => ctx.drawImage(img, 0, 0);
  img.src = 'data:image/png;base64,' + data.image_b64;
  picks = [];
  log('saved ' + data.path);
};
cv.onclick = (e) => {
  const r = cv.getBoundingClientRect();
  const x = Math.round(e.clientX - r.left), yTop = Math.round(e.clientY - r.top);
  const y = 480 - yTop;  // bottom-left origin, as the CSV schema expects
  picks.push([x, y]);
  ctx.fillStyle = picks.length === 1 ? 'red' : 'lime';
  ctx.beginPath(); ctx.arc(x, yTop, 5, 0, 7); ctx.fill();
  document.getElementById('coords').textContent =
    'projectile=' + JSON.stringify(picks[0]) + (picks[1] ? ' target=' + JSON.stringify(picks[1]) : '');
};
async function optimize() {
  const p = document.forms[0].caption.value;
  const resp = await fetch('/optimize_prompt', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify({prompt: p})});
  const data = await resp.json();
  document.forms[0].caption.value = data.prompt;
  log(data.note || 'prompt optimized');
}
async function writeRow() {
  if (!fname || picks.length < 2) { log('need an image and two clicks'); return; }
  const fd = Object.fromEntries(new FormData(document.forms[0]).entries());
  fd.image = fname;
  fd.projectile_coordx = picks[0][0]; fd.projectile_coordy = picks[0][1];
  fd.target_coordx = picks[1][0]; fd.target_coordy = picks[1][1];
  fd.width = 832; fd.height = 480;
  const resp = await fetch('/write_csv', {method: 'POST',
    headers: {'Content-Type': 'application/json'}, body: JSON.stringify(fd)});
  log(await resp.text());
  picks = []; ctx.drawImage(img, 0, 0);
}
function log(s) { document.getElementById('log').textContent += s + '\\n'; }
</script></body></html>
"""


class Handler(BaseHTTPRequestHandler):
    output_dir = "prepared_dataset"

    def log_message(self, fmt, *args):  # quiet
        pass

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        body = PAGE.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        data = json.loads(self.rfile.read(length) or b"{}")
        if self.path == "/crop":
            img = Image.open(io.BytesIO(base64.b64decode(data["image_b64"]))).convert("RGB")
            # center-crop to 832:480 aspect then LANCZOS resize (reference :77-95)
            tw, th = 832, 480
            w, h = img.size
            scale = max(tw / w, th / h)
            img = img.resize((round(w * scale), round(h * scale)), Image.Resampling.LANCZOS)
            w, h = img.size
            left, top = (w - tw) // 2, (h - th) // 2
            img = img.crop((left, top, left + tw, top + th))
            name = "_" + os.path.splitext(os.path.basename(data["filename"]))[0] + ".png"
            img_dir = os.path.join(self.output_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            path = os.path.join(img_dir, name)
            img.save(path)
            buf = io.BytesIO()
            img.save(buf, "PNG")
            self._json({"filename": name, "path": path,
                        "image_b64": base64.b64encode(buf.getvalue()).decode()})
        elif self.path == "/optimize_prompt":
            prompt = data.get("prompt", "")
            if os.environ.get("OPENAI_API_KEY"):
                try:
                    from openai import OpenAI

                    client = OpenAI()
                    out = client.chat.completions.create(
                        model="gpt-4o-mini",
                        messages=[{"role": "system",
                                   "content": "Rewrite this video caption to be a vivid, "
                                              "specific one-sentence description."},
                                  {"role": "user", "content": prompt}],
                    )
                    self._json({"prompt": out.choices[0].message.content})
                    return
                except Exception as e:  # pragma: no cover
                    self._json({"prompt": prompt, "note": f"LLM call failed: {e}"})
                    return
            self._json({"prompt": prompt,
                        "note": "no OPENAI_API_KEY (zero-egress env): prompt unchanged"})
        elif self.path == "/write_csv":
            os.makedirs(self.output_dir, exist_ok=True)
            csv_path = os.path.join(self.output_dir, "metadata.csv")
            new = not os.path.exists(csv_path)
            with open(csv_path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
                if new:
                    writer.writeheader()
                writer.writerow({k: data.get(k, "") for k in CSV_FIELDS})
            self._json({"written": csv_path})
        else:
            self._json({"error": "unknown endpoint"}, 404)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output_dir", default="prepared_dataset")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    Handler.output_dir = args.output_dir
    server = ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"dataset prep app on http://localhost:{args.port} -> {args.output_dir}")
    server.serve_forever()


if __name__ == "__main__":
    main()
