"""Dependency-free web viewer server.

Mirrors the reference's viewer architecture (``/root/reference/viewer/
viewer.py``): the server only sees a ``render_func(CameraState) ->
ndarray`` closure; concurrent clients are serialized by a render lock; in
training mode the closure is swapped for a ``DelayRender`` mailbox so the
training loop owns the device cadence (``viewer/utils.py:48-67``,
``train.py:159-160``).

Transport: the reference uses the external ``viser`` websocket server;
here a stdlib ThreadingHTTPServer serves a self-contained orbit-control
page that POSTs camera parameters and receives JPEG frames, plus endpoints
for jumping to dataset cameras and recording/exporting camera-path videos.
"""

from __future__ import annotations

import io
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Callable, List, Optional

import numpy as np

from .camera import CameraState, DelayRender, RecordManager, fov2focal

logger = logging.getLogger(__name__)

_PAGE = """<!DOCTYPE html>
<html><head><title>easy_gaussian_splatting_tpu viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:sans-serif;overflow:hidden}
#img{position:absolute;top:0;left:0;width:100vw;height:100vh;object-fit:contain}
#hud{position:absolute;top:8px;left:8px;background:#000a;padding:8px;
border-radius:6px;font-size:12px;z-index:2}
button{margin:2px;font-size:12px}
</style></head><body>
<img id="img"/><div id="hud">
<div>drag: orbit | shift-drag: pan | wheel: zoom</div>
<button onclick="jump(-1)">&lt; cam</button>
<button onclick="jump(1)">cam &gt;</button>
<button onclick="rec('add')">add keyframe</button>
<button onclick="rec('clear')">clear</button>
<button onclick="rec('export')">export video</button>
<br/>fov <input id="fov" type="range" min="0.3" max="2.2" step="0.05"
value="1.0" style="width:90px"/>
res <select id="res"><option>480</option><option selected>720</option>
<option>960</option></select>
<span id="st"></span></div>
<script>
let yaw=0,pitch=0.3,radius=4,target=[0,0,0],cams=[],ci=-1,busy=false;
const img=document.getElementById('img'),st=document.getElementById('st');
fetch('/cameras').then(r=>r.json()).then(j=>{cams=j;
 if(cams.length){const c=cams[0];applyCam(c);}});
function applyCam(c){ // set orbit params from a dataset camera
 const p=c.position; target=c.target||[0,0,0];
 const d=[p[0]-target[0],p[1]-target[1],p[2]-target[2]];
 radius=Math.hypot(...d); yaw=Math.atan2(d[0],d[2]); pitch=Math.asin(d[1]/radius);}
function jump(d){if(!cams.length)return; ci=(ci+d+cams.length)%cams.length;
 applyCam(cams[ci]); st.textContent='cam '+ci;}
function rec(a){fetch('/record/'+a,{method:'POST',body:JSON.stringify(view())})
 .then(r=>r.json()).then(j=>st.textContent=j.status);}
let drag=null;
img.onmousedown=e=>{drag={x:e.clientX,y:e.clientY,shift:e.shiftKey};};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
 const dx=e.clientX-drag.x,dy=e.clientY-drag.y;drag.x=e.clientX;drag.y=e.clientY;
 if(drag.shift){const s=radius*0.002;
  target[0]-=s*(dx*Math.cos(yaw));target[1]+=s*dy;target[2]+=s*(dx*Math.sin(yaw));}
 else{yaw-=dx*0.005;pitch=Math.max(-1.5,Math.min(1.5,pitch+dy*0.005));}};
window.onwheel=e=>{radius*=Math.exp(e.deltaY*0.001);};
function view(){
 const h=parseInt(document.getElementById('res').value);
 const ar=window.innerWidth/window.innerHeight;
 return {yaw,pitch,radius,target,
  fov:parseFloat(document.getElementById('fov').value),
  width:Math.round(h*ar),height:h};}
async function loop(){
 if(!busy){busy=true;
  try{const r=await fetch('/render',{method:'POST',body:JSON.stringify(view())});
   const b=await r.blob();img.src=URL.createObjectURL(b);}catch(e){}
  busy=false;}
 setTimeout(loop,66);}
loop();
</script></body></html>"""


def _orbit_to_camera(p: dict) -> CameraState:
    yaw, pitch, radius = p["yaw"], p["pitch"], p["radius"]
    target = np.asarray(p.get("target", [0, 0, 0]), np.float64)
    width = int(p.get("width", 960))
    height = int(p.get("height", 720))
    # camera position on the orbit sphere (y-down OpenCV world assumed)
    pos = target + radius * np.array(
        [np.sin(yaw) * np.cos(pitch), np.sin(pitch), np.cos(yaw) * np.cos(pitch)]
    )
    # look-at: z forward towards target, y down
    z = target - pos
    z = z / (np.linalg.norm(z) + 1e-12)
    up = np.array([0.0, -1.0, 0.0])
    x = np.cross(up, z)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
    w2c = np.linalg.inv(c2w)
    fov_y = p.get("fov", 1.0)
    f = fov2focal(fov_y, height)
    K = np.array(
        [[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float64
    )
    return CameraState(w2c, K, width, height)


class Viewer:
    """Web viewer server. ``render_func`` must return an [H, W, 3] float
    image in [0, 1]."""

    def __init__(
        self,
        render_func: Callable[[CameraState], np.ndarray],
        target_camera_states: List[CameraState],
        host: str = "localhost",
        port: int = 9981,
        in_training_mode: bool = False,
        video_output_dir: Path = Path("./output"),
    ) -> None:
        render_lock = threading.Lock()

        def render_with_lock(camera_state: CameraState) -> np.ndarray:
            with render_lock:
                return render_func(camera_state)

        self.render_func = render_with_lock
        self.in_training_mode = in_training_mode
        self.delay_render: Optional[DelayRender] = None
        effective = self.render_func
        if in_training_mode:
            self.delay_render = DelayRender(self.render_func)
            effective = self.delay_render.get_render_image
        self._effective_render = effective
        self.target_camera_states = target_camera_states
        self.record = RecordManager(
            self.render_func, duration=10.0, fps=30.0,
            output_dir=Path(video_output_dir),
        )

        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/cameras":
                    cams = []
                    for c in viewer.target_camera_states:
                        c2w = np.linalg.inv(c.w2c)
                        cams.append(
                            {
                                "position": c2w[:3, 3].tolist(),
                                "target": (
                                    c2w[:3, 3] + c2w[:3, 2]
                                ).tolist(),
                            }
                        )
                    self._json(cams)
                else:
                    self._json({"error": "not found"}, 404)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = (
                    json.loads(self.rfile.read(length)) if length else {}
                )
                if self.path == "/render":
                    cam = _orbit_to_camera(payload)
                    img = viewer._effective_render(cam)
                    self._send_jpeg(img)
                elif self.path == "/record/add":
                    viewer.record.camera_states.append(
                        _orbit_to_camera(payload)
                    )
                    self._json(
                        {
                            "status": f"{len(viewer.record.camera_states)} "
                            "keyframes"
                        }
                    )
                elif self.path == "/record/clear":
                    viewer.record.camera_states.clear()
                    self._json({"status": "cleared"})
                elif self.path == "/record/export":
                    path = viewer.record.export_video()
                    self._json(
                        {"status": f"exported {path}" if path else "error"}
                    )
                else:
                    self._json({"error": "not found"}, 404)

            def _send_jpeg(self, img: np.ndarray):
                from PIL import Image

                arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(
                    np.uint8
                )
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, "JPEG", quality=85)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )
        self.thread.start()
        logger.info(f"viewer running at http://{host}:{port}")

    def update_render_image(self) -> None:
        """Called by the training loop once per iteration (training mode)."""
        if self.delay_render is not None:
            self.delay_render.update_render_image()

    def stop(self) -> None:
        self.server.shutdown()
