"""Generate the miniature real-format ScanNetv2 fixtures (run once; outputs
are committed).  Formats follow the REFERENCE writers byte-for-byte in
structure:

  * `_inst_nostuff.pth`: torch.save of a 4-tuple of float64 numpy arrays
    (coords mean-centered, colors/127.5-1, sem via the NYU40 remapper,
    inst ids) — exactly what prepare_data_inst.py:58-105 produces;
  * `superpoints/<scan>.pth`: torch.save of an int array
    (prepare_superpoint.py:9-28);
  * `scans_transform/<scan>/<scan>.txt`: ScanNet meta file with the
    `axisAlignment = ...` line among other keys;
  * `scannet_planes/<scan>.json`: {"verts": [[x,z,-y]...], "quads": [...]}
    in the pre-swizzle coordinate convention (scannet_planes.py:177-196);
  * raw `scans/` dir: binary-little-endian `_vh_clean_2.ply` (+faces),
    `.labels.ply` with a ushort `label` property, `segs.json`,
    `aggregation.json`, and a mini `scannetv2-labels.combined.tsv` —
    what prepare_data_inst.py consumes.

Usage: python tests/fixtures/make_fixtures.py
"""

import json
import os
import os.path as osp
import struct

import numpy as np

HERE = osp.dirname(osp.abspath(__file__))
RNG = np.random.default_rng(20240816)

REMAPPER = np.full(150, -100.0)
for i, x in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28,
                       33, 34, 36, 39]):
    REMAPPER[x] = i


def _room(n_inst=4, grid=14):
    """Tiny room mesh: a grid floor plane + a few box-shaped objects."""
    # floor grid mesh
    xs, ys = np.meshgrid(np.linspace(0, 3, grid), np.linspace(0, 3, grid))
    floor = np.stack([xs.ravel(), ys.ravel(), np.zeros(grid * grid)], 1)
    faces = []
    for r in range(grid - 1):
        for c in range(grid - 1):
            a = r * grid + c
            faces.append([a, a + 1, a + grid])
            faces.append([a + 1, a + grid + 1, a + grid])
    verts = [floor]
    sem_nyu = [np.full(len(floor), 2)]  # floor nyu id 2
    inst = [np.full(len(floor), -100.0)]
    groups = []
    nv = len(floor)
    for k in range(n_inst):
        c = RNG.random(3) * 2 + 0.5
        h = RNG.random(3) * 0.3 + 0.1
        # a small 8-vertex box with 4 triangles per visible side (keep simple:
        # tetrahedral fan)
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)], float) * h + c
        tris = [[0, 1, 2], [1, 3, 2], [4, 5, 6], [5, 7, 6],
                [0, 1, 4], [1, 5, 4], [2, 3, 6], [3, 7, 6]]
        faces.extend([[a + nv, b + nv, d + nv] for a, b, d in tris])
        verts.append(corners)
        nyu = int(RNG.choice([3, 4, 5, 6, 7]))  # cabinet/bed/chair/sofa/table
        sem_nyu.append(np.full(8, nyu))
        inst.append(np.full(8, k, float))
        groups.append((k, nyu, nv, 8))
        nv += 8
    xyz = np.concatenate(verts).astype(np.float64)
    return (xyz, np.asarray(faces, np.int64), np.concatenate(sem_nyu).astype(int),
            np.concatenate(inst), groups)


def write_ply(path, xyz, rgb, faces, label=None):
    n = len(xyz)
    props = ["property float x", "property float y", "property float z",
             "property uchar red", "property uchar green", "property uchar blue",
             "property uchar alpha"]
    if label is not None:
        props.append("property ushort label")
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n" + "\n".join(props) + "\n"
              f"element face {len(faces)}\n"
              "property list uchar int vertex_indices\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        for i in range(n):
            f.write(struct.pack("<fff", *xyz[i]))
            f.write(struct.pack("<BBBB", *rgb[i], 255))
            if label is not None:
                f.write(struct.pack("<H", int(label[i])))
        for tri in faces:
            f.write(struct.pack("<Biii", 3, *tri))


def main():
    scan_tr, scan_val = "scene0000_00", "scene0001_00"
    root = osp.join(HERE, "scannetv2")
    raw = osp.join(HERE, "raw_scans")
    for d in ("train", "val", "superpoints", "scans_transform/" + scan_tr,
              "scannet_planes"):
        os.makedirs(osp.join(root, d), exist_ok=True)
    os.makedirs(raw, exist_ok=True)

    import torch

    for scan, split in ((scan_tr, "train"), (scan_val, "val")):
        xyz, faces, sem_nyu, inst, groups = _room()
        rgb255 = RNG.integers(0, 256, size=(len(xyz), 3))
        coords = xyz - xyz.mean(0)
        colors = rgb255 / 127.5 - 1.0
        sem = REMAPPER[sem_nyu]
        torch.save((coords, colors, sem, inst),
                   osp.join(root, split, scan + "_inst_nostuff.pth"))
        # superpoints: object-aligned chunks (real mesh segmentation follows
        # surfaces, so segments don't straddle objects) — floor in chunks of
        # 12, each box one segment
        n_floor = int((inst == -100).sum())
        spp = np.empty(len(xyz), np.int64)
        spp[:n_floor] = np.arange(n_floor) // 12
        n_fl_seg = int(spp[n_floor - 1]) + 1
        spp[n_floor:] = n_fl_seg + (np.arange(len(xyz) - n_floor) // 8)
        torch.save(spp, osp.join(root, "superpoints", scan + ".pth"))

        if split == "train":
            # raw-scan fixture for tools/prepare_scannet.py
            write_ply(osp.join(raw, scan + "_vh_clean_2.ply"), xyz, rgb255, faces)
            write_ply(osp.join(raw, scan + "_vh_clean_2.labels.ply"), xyz,
                      rgb255, faces, label=np.where(sem_nyu >= 0, sem_nyu, 0))
            seg = spp.tolist()
            json.dump({"segIndices": seg},
                      open(osp.join(raw, scan + "_vh_clean_2.0.010000.segs.json"), "w"))
            seg_groups = []
            names = {2: "floor", 3: "cabinet", 4: "bed", 5: "chair", 6: "sofa",
                     7: "table"}
            for k, nyu, start, cnt in groups:
                segs = sorted(set(seg[start:start + cnt]))
                seg_groups.append(dict(id=k, objectId=k, label=names[nyu],
                                       segments=segs))
            json.dump({"segGroups": seg_groups},
                      open(osp.join(raw, scan + ".aggregation.json"), "w"))
            # mini labels tsv: id \t raw_category \t ... \t nyu40class(col 7)
            rows = ["id\traw_category\tcategory\tcount\tnyu40id\teigen13id"
                    "\tnyu40class\tnyu40class2"]
            for nyu, name in names.items():
                rows.append(f"{nyu}\t{name}\tx\t1\t{nyu}\tx\t{name}\t{name}")
            open(osp.join(raw, "scannetv2-labels.combined.tsv"), "w").write(
                "\n".join(rows) + "\n")

            # scans_transform meta (axis-align) + wall planes
            mat = np.eye(4)
            mat[:3, 3] = [0.25, -0.5, 0.0]
            meta = ("colorWidth = 1296\ncolorHeight = 968\n"
                    "axisAlignment = " + " ".join(f"{v:g}" for v in mat.ravel())
                    + "\nnumColorFrames = 1\n")
            open(osp.join(root, "scans_transform", scan, scan + ".txt"),
                 "w").write(meta)
            wall_q = []
            wverts = []
            for (x0, y0, x1, y1) in ((0, 0, 3, 0), (3, 0, 3, 3)):
                i0 = len(wverts)
                for (x, y, z) in ((x0, y0, 0), (x0, y0, 2.5), (x1, y1, 2.5),
                                  (x1, y1, 0)):
                    wverts.append([x, z, -y])  # pre-swizzle storage convention
                wall_q.append([i0, i0 + 1, i0 + 2, i0 + 3])
            json.dump({"verts": wverts, "quads": wall_q},
                      open(osp.join(root, "scannet_planes", scan + ".json"), "w"))
    make_s3dis()
    print("fixtures written under", HERE)


def make_s3dis():
    """Miniature S3DIS room in the Stanford aligned-dataset layout
    (Area_5/office_1/Annotations/<class>_<k>.txt with `x y z r g b` rows) —
    the exact input tools/prepare_s3dis.py walks (reference:
    ISBNet/dataset/s3dis/prepare_s3dis.py)."""
    rng = np.random.default_rng(20250817)
    ann = osp.join(HERE, "s3dis_raw", "Area_5", "office_1", "Annotations")
    os.makedirs(ann, exist_ok=True)

    def grid_pts(n, x0, x1, y0, y1, z0, z1):
        p = rng.random((n, 3))
        return np.stack([x0 + p[:, 0] * (x1 - x0), y0 + p[:, 1] * (y1 - y0),
                         z0 + p[:, 2] * (z1 - z0)], 1)

    objs = [
        ("ceiling_1", grid_pts(300, 0, 4, 0, 3, 2.79, 2.81), (180, 180, 180)),
        ("floor_1", grid_pts(300, 0, 4, 0, 3, -0.01, 0.01), (120, 100, 80)),
        ("wall_1", grid_pts(200, -0.01, 0.01, 0, 3, 0, 2.8), (200, 200, 190)),
        ("chair_1", grid_pts(150, 1.0, 1.5, 1.0, 1.5, 0, 0.9), (150, 60, 40)),
        ("chair_2", grid_pts(150, 2.6, 3.1, 1.2, 1.7, 0, 0.9), (150, 70, 50)),
        ("table_1", grid_pts(150, 1.6, 2.5, 0.8, 1.9, 0.6, 0.8), (90, 60, 30)),
    ]
    for name, xyz, base_rgb in objs:
        rgb = np.clip(np.asarray(base_rgb) + rng.normal(0, 8, (len(xyz), 3)),
                      0, 255)
        rows = np.concatenate([xyz, rgb], 1)
        np.savetxt(osp.join(ann, name + ".txt"), rows, fmt="%.3f")


if __name__ == "__main__":
    main()
