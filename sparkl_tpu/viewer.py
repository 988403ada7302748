"""Interactive particle viewer — orbitable WebGL point cloud over snapshot
directories written by the CLI runner (`python -m sparkl_tpu.run --out DIR`).

The TPU-native counterpart of the reference's interactive testbed
(ref: sparkl `src/third_party/testbed_plugin.rs:93` registers the particle
point-cloud render plugin; `point_cloud_render.rs` draws the instanced
points): simulation runs headless on the accelerator, snapshots stream to
disk, and this module serves them to a browser as binary point buffers with
the same color families as the PNG renderer (`viz.MODES`). Self-contained —
stdlib HTTP server plus a vanilla-WebGL page (no CDN / network deps), so it
works in air-gapped environments.

Usage:
    python -m sparkl_tpu.run --scene sand3 --out /tmp/sand3 --save-every 2
    python -m sparkl_tpu.viewer --dir /tmp/sand3 --port 8700
    # open http://localhost:8700 — drag orbits, wheel zooms, shift-drag pans,
    # space plays/pauses, arrow keys step frames.
"""

import argparse
import functools
import json
import os
import re
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import urlparse, parse_qs

import numpy as np

# Color modes served to the page — the full viz.MODES set ("blocks" uses
# the grid metadata run.py embeds in each snapshot; older snapshots without
# it fall back to "position"). Ref: testbed_plugin.rs:38-58 ParticleMode.
MODES = ("static", "velocity", "density_ratio", "position", "phase",
         "blocks")

_FRAME_RE = re.compile(r"frame_(\d+)\.npz$")


def list_frames(directory):
    """Sorted [(frame_number, path)] of runner snapshots in `directory`."""
    out = []
    for name in os.listdir(directory):
        m = _FRAME_RE.search(name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    return sorted(out)


def _colormap(name, x):
    """x in [0,1] -> rgb in [0,1]; tiny polynomial fits of the matplotlib
    maps viz.py uses (kept dependency-free for the serving path)."""
    x = np.clip(x, 0.0, 1.0)
    if name == "viridis":
        r = 0.267 + x * (0.005 + x * (1.778 - 1.052 * x))
        g = 0.005 + x * (1.404 + x * (-0.819 + 0.316 * x))
        b = 0.329 + x * (1.384 + x * (-3.220 + 1.650 * x))
    elif name == "inferno":
        r = 0.001 + x * (0.731 + x * (1.672 - 1.417 * x))
        g = 0.0 + x * (-0.155 + x * (1.272 - 0.118 * x))
        b = 0.014 + x * (2.542 + x * (-6.112 + 3.962 * x))
    else:  # coolwarm
        r = 0.230 + x * (1.384 - 0.910 * x)
        g = 0.299 + x * (1.522 - 1.737 * x)
        b = 0.754 + x * (0.136 - 0.743 * x)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 1.0)


def frame_points(npz, mode="velocity", max_points=300_000):
    """Snapshot npz dict -> float32 [M, 6] (xyz, rgb) for the GL buffer.

    2D scenes render in the z=0 plane. Deterministic stride subsampling
    bounds the transfer at max_points."""
    act = np.asarray(npz["active"]).astype(bool)
    pos = np.asarray(npz["position"])[act].astype(np.float32)
    n = len(pos)
    stride = max(1, -(-n // max_points))
    sel = slice(None, None, stride)
    pos = pos[sel]

    def field(k):
        return np.asarray(npz[k])[act][sel]

    if mode == "static":
        rgb = np.broadcast_to(
            np.array([0.282, 0.471, 0.812], np.float32), (len(pos), 3)
        ).copy()
    elif mode == "velocity":
        v = np.linalg.norm(field("velocity"), axis=1)
        hi = np.percentile(v, 98.0) if len(v) else 1.0
        rgb = _colormap("viridis", v / max(hi, 1e-9))
    elif mode == "phase":
        rgb = _colormap("inferno", field("phase"))
    elif mode == "density_ratio":
        try:
            det = np.linalg.det(field("deformation_gradient"))
        except KeyError:
            det = np.ones(len(pos))
        rgb = _colormap(
            "coolwarm", np.clip(1.0 / np.maximum(det, 1e-6), 0.0, 3.0) / 3.0
        )
    elif mode == "position":
        span = np.maximum(pos.max(0) - pos.min(0), 1e-9)
        c = (pos - pos.min(0)) / span
        if c.shape[1] == 2:
            c = np.concatenate([c, np.full((len(c), 1), 0.5)], axis=1)
        rgb = c[:, :3]
    elif mode == "blocks":
        # Color by owning 4^d block (ref: testbed_plugin.rs:38-58
        # ParticleMode::Blocks) — same hash as viz.py's PNG variant.
        if "cell_width" in npz:
            h = float(np.asarray(npz["cell_width"]))
            origin = np.asarray(npz["grid_origin"], np.float32)
            cell = np.floor((pos - origin[None, : pos.shape[1]]) / h).astype(
                np.int64
            ) // 4  # sparse.blocks.BLOCK_SIDE
            key = cell[:, 0]
            for ax in range(1, cell.shape[1]):
                key = key * 1000 + cell[:, ax]
            rgb = _colormap(
                "viridis", (key * 2654435761 % 997) / 997.0
            )
        else:  # pre-round-4 snapshot without grid metadata
            span = np.maximum(pos.max(0) - pos.min(0), 1e-9)
            c = (pos - pos.min(0)) / span
            if c.shape[1] == 2:
                c = np.concatenate([c, np.full((len(c), 1), 0.5)], axis=1)
            rgb = c[:, :3]
    else:
        raise ValueError(f"unknown mode {mode}; choose from {MODES}")

    if pos.shape[1] == 2:
        pos = np.concatenate(
            [pos, np.zeros((len(pos), 1), np.float32)], axis=1
        )
    return np.concatenate([pos, rgb.astype(np.float32)], axis=1)


_PAGE = r"""<!doctype html>
<meta charset="utf-8"><title>sparkl_tpu viewer</title>
<style>
 body{margin:0;background:#111;color:#ddd;font:13px system-ui;overflow:hidden}
 #hud{position:fixed;top:8px;left:8px;background:#000a;padding:8px 10px;
      border-radius:6px;z-index:2;user-select:none}
 #hud *{vertical-align:middle} select,input{background:#222;color:#ddd;border:1px solid #444}
 canvas{display:block;width:100vw;height:100vh}
</style>
<div id="hud">
 <b>sparkl_tpu</b>
 <select id="mode"></select>
 <button id="play">&#9658;</button>
 <input id="frame" type="range" min="0" max="0" value="0" style="width:220px">
 <span id="label"></span>
 <input id="psize" type="range" min="1" max="8" value="3" style="width:60px" title="point size">
</div>
<canvas id="gl"></canvas>
<script>
const canvas=document.getElementById('gl'),gl=canvas.getContext('webgl');
const VS=`attribute vec3 p;attribute vec3 c;uniform mat4 mvp;uniform float ps;
varying vec3 vc;void main(){gl_Position=mvp*vec4(p,1.0);gl_PointSize=ps;vc=c;}`;
const FS=`precision mediump float;varying vec3 vc;void main(){
vec2 d=gl_PointCoord-vec2(0.5);if(dot(d,d)>0.25)discard;gl_FragColor=vec4(vc,1.0);}`;
function sh(t,s){const o=gl.createShader(t);gl.shaderSource(o,s);gl.compileShader(o);return o}
const prog=gl.createProgram();gl.attachShader(prog,sh(gl.VERTEX_SHADER,VS));
gl.attachShader(prog,sh(gl.FRAGMENT_SHADER,FS));gl.linkProgram(prog);gl.useProgram(prog);
const buf=gl.createBuffer(),aP=gl.getAttribLocation(prog,'p'),aC=gl.getAttribLocation(prog,'c');
const uM=gl.getUniformLocation(prog,'mvp'),uS=gl.getUniformLocation(prog,'ps');
let nPts=0,center=[0,0,0],radius=5;
let az=0.9,el=0.35,dist=3,panX=0,panY=0,playing=false,frames=[],cur=0;
function mat(){ // column-major perspective * lookAt(orbit)
 const w=canvas.width,h=canvas.height,f=1/Math.tan(0.45),a=w/h,zn=radius*0.01,zf=radius*40;
 const ce=Math.cos(el),se=Math.sin(el),ca=Math.cos(az),sa=Math.sin(az);
 const d=dist*radius;
 const eye=[center[0]+d*ce*ca,center[1]+d*se,center[2]+d*ce*sa];
 let zx=eye[0]-center[0],zy=eye[1]-center[1],zz=eye[2]-center[2];
 const zl=Math.hypot(zx,zy,zz);zx/=zl;zy/=zl;zz/=zl;
 let xx=-zz,xy=0,xz=zx;const xl=Math.hypot(xx,xy,xz)||1;xx/=xl;xz/=xl;
 const yx=zy*xz-zz*xy,yy=zz*xx-zx*xz,yz=zx*xy-zy*xx;
 const cx=center[0]-(xx*panX+yx*panY)*radius,cy=center[1]-(xy*panX+yy*panY)*radius,
       cz=center[2]-(xz*panX+yz*panY)*radius;
 const ex=eye[0]-(xx*panX+yx*panY)*radius,ey=eye[1]-(xy*panX+yy*panY)*radius,
       ez=eye[2]-(xz*panX+yz*panY)*radius;
 const tx=-(xx*ex+xy*ey+xz*ez),ty=-(yx*ex+yy*ey+yz*ez),tz=-(zx*ex+zy*ey+zz*ez);
 const P=[f/a,0,0,0, 0,f,0,0, 0,0,(zf+zn)/(zn-zf),-1, 0,0,2*zf*zn/(zn-zf),0];
 const V=[xx,yx,zx,0, xy,yy,zy,0, xz,yz,zz,0, tx,ty,tz,1];
 const M=new Float32Array(16);
 for(let i=0;i<4;i++)for(let j=0;j<4;j++){let s=0;for(let k=0;k<4;k++)s+=P[k*4+j]*V[i*4+k];M[i*4+j]=s}
 return M;
}
function draw(){
 canvas.width=innerWidth*devicePixelRatio;canvas.height=innerHeight*devicePixelRatio;
 gl.viewport(0,0,canvas.width,canvas.height);
 gl.clearColor(0.066,0.066,0.066,1);gl.clear(gl.COLOR_BUFFER_BIT);
 if(nPts){gl.uniformMatrix4fv(uM,false,mat());
  gl.uniform1f(uS,+document.getElementById('psize').value*devicePixelRatio);
  gl.drawArrays(gl.POINTS,0,nPts);}
 requestAnimationFrame(draw);
}
async function load(i){
 if(!frames.length)return;cur=(i+frames.length)%frames.length;
 const mode=document.getElementById('mode').value;
 const r=await fetch(`api/frame/${frames[cur]}?mode=${mode}`);
 const a=new Float32Array(await r.arrayBuffer());nPts=a.length/6;
 gl.bindBuffer(gl.ARRAY_BUFFER,buf);gl.bufferData(gl.ARRAY_BUFFER,a,gl.DYNAMIC_DRAW);
 gl.enableVertexAttribArray(aP);gl.vertexAttribPointer(aP,3,gl.FLOAT,false,24,0);
 gl.enableVertexAttribArray(aC);gl.vertexAttribPointer(aC,3,gl.FLOAT,false,24,12);
 if(cur===0||!radius||!isFinite(radius)){let mn=[1e9,1e9,1e9],mx=[-1e9,-1e9,-1e9];
  for(let k=0;k<nPts;k++)for(let d2=0;d2<3;d2++){const v=a[k*6+d2];
   if(v<mn[d2])mn[d2]=v;if(v>mx[d2])mx[d2]=v;}
  center=[(mn[0]+mx[0])/2,(mn[1]+mx[1])/2,(mn[2]+mx[2])/2];
  radius=Math.max(mx[0]-mn[0],mx[1]-mn[1],mx[2]-mn[2],1e-3);}
 document.getElementById('frame').value=cur;
 document.getElementById('label').textContent=`frame ${frames[cur]} · ${nPts.toLocaleString()} pts`;
}
(async()=>{
 const sel=document.getElementById('mode');
 const meta=await (await fetch('api/meta')).json();
 for(const m of meta.modes){const o=document.createElement('option');o.value=o.textContent=m;sel.append(o)}
 sel.value=meta.default_mode;frames=meta.frames;
 const sl=document.getElementById('frame');sl.max=Math.max(frames.length-1,0);
 sl.oninput=()=>load(+sl.value);sel.onchange=()=>load(cur);
 document.getElementById('play').onclick=()=>{playing=!playing};
 setInterval(()=>{if(playing)load(cur+1)},140);
 addEventListener('keydown',e=>{if(e.code==='Space'){playing=!playing;e.preventDefault()}
  if(e.key==='ArrowRight')load(cur+1);if(e.key==='ArrowLeft')load(cur-1)});
 let drag=null;
 canvas.addEventListener('mousedown',e=>drag=[e.clientX,e.clientY,e.shiftKey]);
 addEventListener('mouseup',()=>drag=null);
 addEventListener('mousemove',e=>{if(!drag)return;
  const dx=(e.clientX-drag[0])/innerWidth,dy=(e.clientY-drag[1])/innerHeight;
  if(drag[2]){panX+=dx*2*dist;panY-=dy*2*dist}else{az+=dx*4;el=Math.max(-1.5,Math.min(1.5,el+dy*3))}
  drag=[e.clientX,e.clientY,drag[2]]});
 canvas.addEventListener('wheel',e=>{dist*=Math.exp(e.deltaY*0.001);e.preventDefault()},{passive:false});
 await load(0);draw();
})();
</script>
"""


class _Handler(BaseHTTPRequestHandler):
    directory = None
    default_mode = "velocity"
    max_points = 300_000

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code, body, ctype):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        url = urlparse(self.path)
        if url.path in ("/", "/index.html"):
            return self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
        if url.path == "/api/meta":
            frames = [n for n, _ in list_frames(self.directory)]
            body = json.dumps(
                dict(frames=frames, modes=MODES, default_mode=self.default_mode)
            ).encode()
            return self._send(200, body, "application/json")
        m = re.match(r"^/api/frame/(\d+)$", url.path)
        if m:
            want = int(m.group(1))
            paths = dict(list_frames(self.directory))
            if want not in paths:
                return self._send(404, b"no such frame", "text/plain")
            mode = parse_qs(url.query).get("mode", [self.default_mode])[0]
            with np.load(paths[want]) as npz:
                pts = frame_points(npz, mode=mode, max_points=self.max_points)
            return self._send(
                200, np.ascontiguousarray(pts).tobytes(),
                "application/octet-stream",
            )
        return self._send(404, b"not found", "text/plain")


def serve(directory, port=8700, default_mode="velocity", max_points=300_000,
          open_browser=False, block=True):
    """Start the viewer server; returns the ThreadingHTTPServer."""
    handler = type(
        "Handler", (_Handler,),
        dict(directory=directory, default_mode=default_mode,
             max_points=max_points),
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", port), handler)
    print(f"sparkl_tpu viewer: http://127.0.0.1:{httpd.server_address[1]} "
          f"({len(list_frames(directory))} frames from {directory})")
    if open_browser:
        import webbrowser

        webbrowser.open(f"http://127.0.0.1:{httpd.server_address[1]}")
    if block:
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            httpd.server_close()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m sparkl_tpu.viewer", description=__doc__.split("\n")[0]
    )
    ap.add_argument("--dir", required=True, help="snapshot directory (--out of the runner)")
    ap.add_argument("--port", type=int, default=8700)
    ap.add_argument("--mode", default="velocity", choices=MODES)
    ap.add_argument("--max-points", type=int, default=300_000)
    ap.add_argument("--open", action="store_true", help="open a browser tab")
    args = ap.parse_args(argv)
    if not list_frames(args.dir):
        print(f"no frame_*.npz snapshots in {args.dir}", file=sys.stderr)
        return 1
    serve(args.dir, port=args.port, default_mode=args.mode,
          max_points=args.max_points, open_browser=args.open)
    return 0


if __name__ == "__main__":
    sys.exit(main())
