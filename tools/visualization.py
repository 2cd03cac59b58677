#!/usr/bin/env python
"""Visualize scenes / predictions as colored PLY files
(reference: ISBNet/tools/visualization.py + visualization/vis_scannetv2.py,
which use open3d/pyviz3d viewers — not available headless, so this exports
standard PLY point clouds any viewer opens).

Modes (--task): input_rgb | semantic_gt | instance_gt | instance_pred |
superpoint | semantic_pred | offset_semantic_pred | offset_vertices_pred.
instance_pred reads a benchmark-format export dir from tools/test.py
--out; the *_pred pointwise modes read the .npy dirs written by
tools/test.py --save_pointwise (the reference viewers' prediction_path
layout).

Example:
  python tools/visualization.py --synthetic 1 --task instance_gt --out vis/
  python tools/visualization.py --data_root dataset/scannetv2 --scene scene0011_00 \
      --task instance_pred --prediction_path preds/ --out vis/
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# fixed 20-color palette (ScanNet-style)
PALETTE = np.array([
    [174, 199, 232], [152, 223, 138], [31, 119, 180], [255, 187, 120],
    [188, 189, 34], [140, 86, 75], [255, 152, 150], [214, 39, 40],
    [197, 176, 213], [148, 103, 189], [196, 156, 148], [23, 190, 207],
    [247, 182, 210], [219, 219, 141], [255, 127, 14], [158, 218, 229],
    [44, 160, 44], [112, 128, 144], [227, 119, 194], [82, 84, 163],
], np.uint8)


def write_ply(path, xyz, rgb):
    """ASCII PLY writer (no deps). rgb uint8 [N,3]."""
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(xyz)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")




_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>html,body{{margin:0;height:100%;overflow:hidden;background:#111}}
canvas{{width:100%;height:100%;display:block}}
#hud{{position:fixed;top:8px;left:8px;color:#ddd;font:12px monospace}}</style>
</head><body><div id="hud">{title} — {npts} pts — drag: orbit, wheel: zoom,
shift-drag: pan</div><canvas id="c"></canvas>
<script>
// self-contained WebGL2 point-cloud viewer (no external libs — the repo
// machine is zero-egress and the reference's open3d/pyviz3d need a display)
const XYZ = Float32Array.from(atob("{xyz_b64}"), c=>c.charCodeAt(0));
const xyz = new Float32Array(XYZ.buffer);
const rgbBytes = Uint8Array.from(atob("{rgb_b64}"), c=>c.charCodeAt(0));
const n = rgbBytes.length/3;
const cv = document.getElementById("c");
const gl = cv.getContext("webgl2");
const vs = `#version 300 es
in vec3 p; in vec3 col; uniform mat4 mvp; out vec3 vc;
void main(){{ gl_Position = mvp*vec4(p,1.0); gl_PointSize = 2.0; vc = col; }}`;
const fs = `#version 300 es
precision mediump float; in vec3 vc; out vec4 o;
void main(){{ o = vec4(vc,1.0); }}`;
function sh(t,s){{const x=gl.createShader(t);gl.shaderSource(x,s);gl.compileShader(x);
if(!gl.getShaderParameter(x,gl.COMPILE_STATUS))throw gl.getShaderInfoLog(x);return x;}}
const pr = gl.createProgram();
gl.attachShader(pr,sh(gl.VERTEX_SHADER,vs));gl.attachShader(pr,sh(gl.FRAGMENT_SHADER,fs));
gl.linkProgram(pr);gl.useProgram(pr);
function buf(data,loc,size,type,norm){{const b=gl.createBuffer();
gl.bindBuffer(gl.ARRAY_BUFFER,b);gl.bufferData(gl.ARRAY_BUFFER,data,gl.STATIC_DRAW);
gl.enableVertexAttribArray(loc);gl.vertexAttribPointer(loc,size,type,norm,0,0);}}
buf(xyz,gl.getAttribLocation(pr,"p"),3,gl.FLOAT,false);
buf(rgbBytes,gl.getAttribLocation(pr,"col"),3,gl.UNSIGNED_BYTE,true);
// center/scale
let cx=0,cy=0,cz=0;for(let i=0;i<n;i++){{cx+=xyz[3*i];cy+=xyz[3*i+1];cz+=xyz[3*i+2];}}
cx/=n;cy/=n;cz/=n;
let r=0;for(let i=0;i<n;i++){{const dx=xyz[3*i]-cx,dy=xyz[3*i+1]-cy,dz=xyz[3*i+2]-cz;
r=Math.max(r,dx*dx+dy*dy+dz*dz);}} r=Math.sqrt(r);
let az=0.6, el=0.5, dist=2.5*r, panX=0, panY=0;
function mat(){{
const a=Math.cos(az),b=Math.sin(az),c=Math.cos(el),d=Math.sin(el);
const ex=cx+dist*c*b, ey=cy-dist*c*a, ez=cz+dist*d;
// lookAt
let zx=ex-cx,zy=ey-cy,zz=ez-cz;const zl=Math.hypot(zx,zy,zz);zx/=zl;zy/=zl;zz/=zl;
let xx=zy*1-zz*0, xy=zz*0-zx*1, xz=zx*0-zy*0; // up=(0,0,1) cross
let xl=Math.hypot(xx,xy,xz);xx/=xl;xy/=xl;xz/=xl;
const yx=zy*xz-zz*xy, yy=zz*xx-zx*xz, yz=zx*xy-zy*xx;
const tx=-(xx*ex+xy*ey+xz*ez)+panX, ty=-(yx*ex+yy*ey+yz*ez)+panY,
      tz=-(zx*ex+zy*ey+zz*ez);
const f=1.0/Math.tan(0.4), asp=cv.width/cv.height, near=0.01*r, far=100*r;
const p00=f/asp, p11=f, p22=(far+near)/(near-far), p23=2*far*near/(near-far);
return new Float32Array([
 p00*xx, p11*yx, p22*zx, -zx,
 p00*xy, p11*yy, p22*zy, -zy,
 p00*xz, p11*yz, p22*zz, -zz,
 p00*tx, p11*ty, p22*tz+p23, -tz]);
}}
const mvpLoc = gl.getUniformLocation(pr,"mvp");
function draw(){{
cv.width=cv.clientWidth*devicePixelRatio;cv.height=cv.clientHeight*devicePixelRatio;
gl.viewport(0,0,cv.width,cv.height);gl.enable(gl.DEPTH_TEST);
gl.clearColor(0.07,0.07,0.07,1);gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
gl.uniformMatrix4fv(mvpLoc,false,mat());gl.drawArrays(gl.POINTS,0,n);}}
let drag=false,px=0,py=0,pan=false;
cv.onmousedown=e=>{{drag=true;pan=e.shiftKey;px=e.clientX;py=e.clientY;}};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{{if(!drag)return;const dx=e.clientX-px,dy=e.clientY-py;
px=e.clientX;py=e.clientY;
if(pan){{panX+=dx*0.002*r;panY-=dy*0.002*r;}}else{{az+=dx*0.01;
el=Math.max(-1.5,Math.min(1.5,el+dy*0.01));}}draw();}};
cv.onwheel=e=>{{e.preventDefault();dist*=Math.exp(e.deltaY*0.001);draw();}};
window.onresize=draw; draw();
</script></body></html>
"""


def write_html(path, xyz, rgb, title="scene"):
    """Standalone interactive WebGL viewer — no deps, no network.

    The reference's interactive viewers (open3d / pyviz3d,
    ISBNet/tools/visualization.py) need a display server + pip packages;
    this embeds the cloud into one self-contained HTML file any browser
    renders."""
    import base64

    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32))
    rgb = np.ascontiguousarray(np.asarray(rgb, np.uint8))
    html = _HTML_TEMPLATE.format(
        title=title,
        npts=len(xyz),
        xyz_b64=base64.b64encode(xyz.tobytes()).decode(),
        rgb_b64=base64.b64encode(rgb.tobytes()).decode(),
    )
    with open(path, "w") as f:
        f.write(html)


def _box_edge_points(mn, mx, per_edge=24):
    """AABB wireframe as points (PLY/HTML have no line primitive here)."""
    t = np.linspace(0.0, 1.0, per_edge, dtype=np.float32)[:, None]
    corners = np.array([[mn[0], mn[1], mn[2]], [mx[0], mn[1], mn[2]],
                        [mn[0], mx[1], mn[2]], [mx[0], mx[1], mn[2]],
                        [mn[0], mn[1], mx[2]], [mx[0], mn[1], mx[2]],
                        [mn[0], mx[1], mx[2]], [mx[0], mx[1], mx[2]]],
                       np.float32)
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    return np.concatenate(
        [corners[a][None] * (1 - t) + corners[b][None] * t for a, b in edges])


def color_by_ids(ids):
    ids = np.asarray(ids)
    rgb = np.full((len(ids), 3), 128, np.uint8)
    ok = ids >= 0
    rgb[ok] = PALETTE[ids[ok] % len(PALETTE)]
    return rgb


def main():
    ap = argparse.ArgumentParser("gapro_tpu visualization")
    ap.add_argument("--data_root", default="dataset/scannetv2")
    ap.add_argument("--scene", default=None)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--task", default="instance_gt",
                    choices=["input_rgb", "semantic_gt", "instance_gt",
                             "instance_pred", "superpoint", "semantic_pred",
                             "offset_semantic_pred", "offset_vertices_pred"])
    ap.add_argument("--prediction_path", default=None)
    ap.add_argument("--conf_thresh", type=float, default=0.2)
    ap.add_argument("--out", default="vis")
    ap.add_argument("--format", default="ply", choices=["ply", "html"],
                    help="ply: any viewer; html: self-contained interactive "
                         "WebGL page (no dependencies)")
    args = ap.parse_args()

    if args.synthetic:
        from gapro_tpu.data import make_synthetic_scene

        s = make_synthetic_scene(seed=args.synthetic - 1)
        xyz, rgb = s.xyz, s.rgb
        sem, inst, spp = s.semantic_label, s.instance_label, s.spp
        scan = f"synthetic{args.synthetic - 1:04d}"
    else:
        from gapro_tpu.data import scannet_io

        scan = args.scene
        xyz, rgb, sem, inst = scannet_io.load_scene(
            osp.join(args.data_root, "val", scan + "_inst_nostuff.pth"))
        spp = scannet_io.load_superpoints(
            osp.join(args.data_root, "superpoints", scan + ".pth"))

    if args.task == "input_rgb":
        colors = np.clip((rgb + 1) * 127.5, 0, 255).astype(np.uint8)
    elif args.task == "semantic_gt":
        colors = color_by_ids(sem)
    elif args.task == "instance_gt":
        colors = color_by_ids(np.where(inst >= 0, inst, -1))
    elif args.task == "superpoint":
        colors = color_by_ids(spp)
    elif args.task == "semantic_pred":
        # reference visualization.py:345-351 (tools/test.py --save_pointwise)
        assert args.prediction_path, "--prediction_path required"
        sem_pred = np.load(osp.join(args.prediction_path, "semantic_pred",
                                    scan + ".npy"))
        colors = color_by_ids(sem_pred)
    elif args.task == "offset_semantic_pred":
        # displace every point by its predicted center offset, colored by
        # predicted semantics (visualization.py:367-381): instances collapse
        # toward their centers when offsets are good
        assert args.prediction_path, "--prediction_path required"
        sem_pred = np.load(osp.join(args.prediction_path, "semantic_pred",
                                    scan + ".npy"))
        offs = np.load(osp.join(args.prediction_path, "offset_pred",
                                scan + ".npy"))
        xyz = xyz + offs
        colors = color_by_ids(sem_pred)
    elif args.task == "offset_vertices_pred":
        # GT-instance colors (sorted by point count, visualization.py:505-545)
        # + predicted corner boxes drawn as edge-sampled points (the
        # reference adds open3d AABB geometries; PLY/HTML carry points only)
        assert args.prediction_path, "--prediction_path required"
        corners = np.load(osp.join(args.prediction_path,
                                   "offset_vertices_pred", scan + ".npy"))
        ids = np.where(inst >= 0, inst, -1)
        order = np.argsort(-np.bincount(ids[ids >= 0] + 0,
                                        minlength=max(ids.max() + 1, 1)))
        rank = np.full(order.max() + 1 if len(order) else 1, -1, np.int64)
        rank[order] = np.arange(len(order))
        colors = color_by_ids(np.where(ids >= 0, rank[np.maximum(ids, 0)], -1))
        box_pts, box_cols = [], []
        box_min = xyz + corners[:, :3]
        box_max = xyz + corners[:, 3:]
        for uid in np.unique(ids[ids >= 0]):
            m = ids == uid
            mn, mx = box_min[m].mean(0), box_max[m].mean(0)
            box_pts.append(_box_edge_points(mn, mx))
            box_cols.append(np.tile(PALETTE[rank[uid] % len(PALETTE)],
                                    (len(box_pts[-1]), 1)))
        if box_pts:
            xyz = np.concatenate([xyz] + box_pts)
            colors = np.concatenate([colors] + box_cols).astype(np.uint8)
    else:  # instance_pred
        assert args.prediction_path, "--prediction_path required"
        ids = np.full(len(xyz), -1, np.int64)
        with open(osp.join(args.prediction_path, scan + ".txt")) as f:
            lines = [ln.split() for ln in f.read().splitlines() if ln]
        k = 0
        for rel, _label, conf in lines:
            if float(conf) < args.conf_thresh:
                continue
            mask = np.loadtxt(osp.join(args.prediction_path, rel)).astype(bool)
            ids[mask] = k
            k += 1
        colors = color_by_ids(ids)

    out_path = osp.join(args.out, f"{scan}_{args.task}.{args.format}")
    if args.format == "html":
        write_html(out_path, xyz, colors, title=f"{scan} {args.task}")
    else:
        write_ply(out_path, xyz, colors)
    print("wrote", out_path, f"({len(xyz)} points)")


if __name__ == "__main__":
    main()
