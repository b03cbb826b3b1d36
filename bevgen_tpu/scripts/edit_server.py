"""Interactive scene-editing web UI.

The interactive surface of the reference's gradio demo
(scripts/interactive_editing.py:297-343: editable annotation table ->
re-rasterize BEV -> regenerate cameras) rebuilt as a ZERO-dependency
stdlib `http.server` app (gradio is not available in this image, and a
serving host shouldn't need it): a vanilla-JS page with an editable
cuboid table and a Generate button, backed by JSON endpoints that run
the jitted pipeline.

  python -m bevgen_tpu.scripts.edit_server preset=tiny_test \
      platform=cpu port=7860 [ckpt_path=...]

Endpoints:
  GET  /                 the editor page
  GET  /api/annotations  current cuboid table rows
  POST /api/generate     {"cuboids": [{category,x,y,yaw,length,width}],
                          "seed": N} -> {"bev": dataURI,
                          "cameras": {name: dataURI}, "ms": wall-time}

The table IS the annotation state (reference predict() rebuilds the
CuboidList from the edited dataframe each click, :246-279); x is
forward / y is left in ego metres, matching the BEV conventions
(README.md:97-101).
"""
from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Dict, List, Optional

import numpy as np

from bevgen_tpu.scripts import cli

_DEFAULT_CUBOIDS = [
    {"category": "REGULAR_VEHICLE", "x": 10.0, "y": 0.0, "yaw": 0.0,
     "length": 4.5, "width": 2.0},
    {"category": "REGULAR_VEHICLE", "x": 18.0, "y": 4.0, "yaw": 0.3,
     "length": 4.5, "width": 2.0},
]

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>bevgen_tpu scene editor</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem;max-width:70rem}
 table{border-collapse:collapse} td,th{border:1px solid #999;padding:4px}
 td[contenteditable]{min-width:4rem;background:#fffbe8}
 img{max-width:100%;margin-top:8px;display:block}
 button{margin:8px 4px;padding:6px 14px}
 #status{color:#555;margin-left:8px}
</style></head><body>
<h2>bevgen_tpu scene editor</h2>
<p>Edit cuboids (ego metres: x forward, y left), then Generate.</p>
<table id="tbl"><thead><tr><th>category</th><th>x</th><th>y</th>
<th>yaw</th><th>length</th><th>width</th><th></th></tr></thead>
<tbody></tbody></table>
<button onclick="addRow()">add cuboid</button>
<button onclick="generate()" id="gen">Generate!</button>
<span id="status"></span>
<h3>BEV</h3><img id="bev">
<h3>Cameras</h3><div id="cams"></div>
<script>
const tb = document.querySelector('#tbl tbody');
function addRow(c){
  c = c || {category:'REGULAR_VEHICLE',x:5,y:0,yaw:0,length:4.5,width:2};
  const tr = document.createElement('tr');
  for (const k of ['category','x','y','yaw','length','width']){
    const td = document.createElement('td');
    td.contentEditable = true; td.textContent = c[k]; tr.appendChild(td);
  }
  const td = document.createElement('td');
  td.innerHTML = '<button onclick="this.closest(\\'tr\\').remove()">x</button>';
  tr.appendChild(td); tb.appendChild(tr);
}
function rows(){
  return [...tb.querySelectorAll('tr')].map(tr=>{
    const c=[...tr.querySelectorAll('td')].map(td=>td.textContent.trim());
    return {category:c[0],x:+c[1],y:+c[2],yaw:+c[3],length:+c[4],width:+c[5]};
  });
}
async function generate(){
  document.getElementById('status').textContent = 'generating...';
  document.getElementById('gen').disabled = true;
  try {
    const r = await fetch('/api/generate', {method:'POST',
      headers:{'Content-Type':'application/json'},
      body: JSON.stringify({cuboids: rows(), seed: 0})});
    const out = await r.json();
    if (!r.ok || out.error){
      document.getElementById('status').textContent =
        'error: ' + (out.error || r.status);
      return;
    }
    document.getElementById('bev').src = out.bev;
    const cams = document.getElementById('cams'); cams.innerHTML = '';
    for (const [name, uri] of Object.entries(out.cameras)){
      const h = document.createElement('h4'); h.textContent = name;
      const im = document.createElement('img'); im.src = uri;
      cams.appendChild(h); cams.appendChild(im);
    }
    document.getElementById('status').textContent = out.ms.toFixed(0)+' ms';
  } catch (e) {
    document.getElementById('status').textContent = 'error: ' + e;
  } finally {
    document.getElementById('gen').disabled = false;
  }
}
fetch('/api/annotations').then(r=>r.json()).then(rs=>rs.forEach(addRow));
</script></body></html>
"""


def cuboid_quads(rows: List[dict]):
    """Table rows -> (category, (4,3) ego footprint) list (same math as
    edit_scene.apply_edits 'add')."""
    out = []
    for e in rows:
        yaw = float(e.get("yaw", 0.0))
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        l, w = float(e["length"]) / 2.0, float(e["width"]) / 2.0
        corners = np.array([[l, w, 0], [l, -w, 0], [-l, -w, 0], [-l, w, 0]])
        quad = (R @ corners.T).T + np.array(
            [float(e["x"]), float(e["y"]), 0.0])
        out.append((e.get("category", "REGULAR_VEHICLE"), quad))
    return out


def _png_uri(arr: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.asarray(arr, np.uint8)).save(buf, format="PNG")
    return ("data:image/png;base64," +
            base64.b64encode(buf.getvalue()).decode())


class EditSession:
    """Model + rasterizer behind the endpoints. One jit, reused."""

    def __init__(self, cfg, ckpt_path: Optional[str] = None, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from bevgen_tpu.pipelines.generate import BEVGenPipeline
        from bevgen_tpu.training.checkpoints import load_weights

        self.cfg = cfg
        self.pipe = BEVGenPipeline.create(cfg, dtype=jnp.bfloat16)
        self.params = self.pipe.init_params(jax.random.PRNGKey(seed))
        if ckpt_path:
            self.params = load_weights(ckpt_path, self.params)
        self._run = jax.jit(self.pipe.generate_fn)
        self.annotations = [dict(r) for r in _DEFAULT_CUBOIDS]

    def rasterize(self, rows: List[dict]) -> np.ndarray:
        from bevgen_tpu.data import rasterize
        return rasterize.rasterize_scene(
            drivable_polygons_ego=[np.array(
                [[-35, -35, 0], [-35, 35, 0], [35, 35, 0], [35, -35, 0]],
                np.float64)],
            cuboid_footprints_ego=cuboid_quads(rows),
            lane_boundaries_ego=[], stoplines_ego=[],
            ped_crossing_polygons_ego=[],
            resolution=self.cfg.cond_stage.resolution)

    def generate(self, rows: List[dict], seed: int = 0) -> Dict[str, object]:
        import jax
        import jax.numpy as jnp
        from bevgen_tpu.data import camera_geometry as cg
        from bevgen_tpu.data.fake import fake_batch
        from bevgen_tpu.utils import viz

        t0 = time.perf_counter()
        seg = self.rasterize(rows)
        batch = fake_batch(self.cfg, batch_size=1, seed=seed)
        images, _ = self._run(
            self.params, jnp.asarray(seg[None]),
            jnp.asarray(batch["intrinsics_inv"]),
            jnp.asarray(batch["extrinsics_inv"]),
            jax.random.PRNGKey(seed + 1))
        images = np.asarray(images, np.float32)[0]
        cams = {}
        names = self.cfg.transformer.camera_names
        for i, name in enumerate(names):
            rgb = np.clip(cg.denormalize_image(images[i]), 0, 1)
            cams[str(name)] = _png_uri((rgb * 255).astype(np.uint8))
        bev_img = viz.viz_bev(seg).np
        return {"bev": _png_uri(bev_img), "cameras": cams,
                "ms": (time.perf_counter() - t0) * 1e3}


def make_server(session: EditSession, host: str = "127.0.0.1",
                port: int = 0) -> HTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            elif self.path == "/api/annotations":
                self._send(200, json.dumps(session.annotations).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/api/generate":
                return self._send(404, b"not found", "text/plain")
            n = int(self.headers.get("Content-Length", "0"))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                out = session.generate(req.get("cuboids", []),
                                       int(req.get("seed", 0)))
            except Exception as e:  # surface errors to the page
                return self._send(400, json.dumps(
                    {"error": repr(e)}).encode(), "application/json")
            self._send(200, json.dumps(out).encode(), "application/json")

        def log_message(self, *a):  # quiet test runs
            pass

    return HTTPServer((host, port), Handler)


def main(argv=None):
    args = cli.parse_argv(argv)
    args = cli.setup_platform(args)
    cfg, args = cli.build_config(args)
    host = args.pop("host", "127.0.0.1")
    port = int(args.pop("port", "7860"))
    ckpt_path = args.pop("ckpt_path", None)
    if args:
        print(f"[edit_server] ignoring unknown args: {sorted(args)}")
    session = EditSession(cfg, ckpt_path)
    srv = make_server(session, host, port)
    print(f"scene editor at http://{host}:{srv.server_address[1]}/")
    srv.serve_forever()


if __name__ == "__main__":
    main()
