"""COLMAP scene dataset.

Capability parity with the reference GSplatDataset
(/root/reference/gsplat/gausplat_dataset.py:30-74): parse sparse/0 binary
model, load + rescale images, scale intrinsics by the resize ratio, build
initial Gaussians from the SfM points, compute the scene size. Host-side
numpy only — arrays go to device when the trainer shards them.
"""

import dataclasses
from pathlib import Path

import numpy as np

from easygaussiansplatting_tpu.data.colmap import (
    qvec2rotmat,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
)
from easygaussiansplatting_tpu.data.gau_io import SH_C0, arrays_to_recarray
from easygaussiansplatting_tpu.models import Camera


def points_to_gaussians(xyz, rgb):
    """SfM points -> initial Gaussians (read_points_bin_as_gau parity,
    /root/reference/gsplat/read_write_model.py:184-233): identity rotations,
    alpha 0.8, SH0 = (rgb/255 - 0.5)/SH_C0, isotropic scales = nearest
    -neighbour *squared* distance clipped to [0.01, 3] (the reference uses
    faiss IndexFlatL2, whose distances are squared L2)."""
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    shs = ((np.asarray(rgb, np.float32) / 255.0) - 0.5) / SH_C0
    rots = np.zeros((n, 4), np.float32)
    rots[:, 0] = 1.0
    alphas = np.full(n, 0.8, np.float32)
    d, _ = cKDTree(xyz).query(xyz, k=2)
    scales = np.clip(d[:, 1] ** 2, 0.01, 3.0).astype(np.float32)
    scales = np.repeat(scales[:, None], 3, axis=1)
    return arrays_to_recarray(xyz, rots, scales, alphas, shs)


@dataclasses.dataclass
class GSplatDataset:
    """cameras: list[Camera]; images: list[np.ndarray [3,H,W] float32 0..1];
    gs: initial-gaussian recarray; scene_size: float."""

    cameras: list
    images: list
    gs: np.recarray
    scene_size: float
    image_paths: list = None  # source photo paths (set even when
    # load_images=False, for lazy loads e.g. viewer frustum thumbnails)

    def __len__(self):
        return len(self.cameras)

    def __getitem__(self, i):
        return self.cameras[i], self.images[i]


def load_image(path, resize_rate=1.0):
    from PIL import Image

    im = Image.open(path)
    if resize_rate != 1:
        im = im.resize(
            (max(1, round(im.width * resize_rate)), max(1, round(im.height * resize_rate)))
        )
    arr = np.asarray(im.convert("RGB"), np.float32) / 255.0  # [H,W,3]
    return np.transpose(arr, (2, 0, 1))  # [3,H,W]


def load_colmap_dataset(path, resize_rate=1.0, load_images=True, cache_points=True,
                        use_native=None):
    """`use_native` selects the C++ mmap parser (native/colmap_reader.cc);
    default: use it when built, else the pure-Python readers."""
    from easygaussiansplatting_tpu.data import native_loader

    if use_native is None:
        use_native = native_loader.available()
    read_cams = native_loader.read_cameras_binary if use_native else read_cameras_binary
    read_imgs = native_loader.read_images_binary if use_native else read_images_binary
    read_pts = native_loader.read_points3d_binary if use_native else read_points3d_binary

    path = Path(path)
    sparse = path / "sparse" / "0"
    cameras = read_cams(sparse / "cameras.bin")
    images_meta = read_imgs(sparse / "images.bin")

    cams, imgs, img_paths = [], [], []
    for im in sorted(images_meta.values(), key=lambda x: x.id):
        cp = cameras[im.camera_id]
        fx, fy, cx, cy = cp.intrinsics
        im_path = path / "images" / im.name
        img_paths.append(im_path)
        if load_images:
            img = load_image(im_path, resize_rate)
            h, w = img.shape[1], img.shape[2]
        else:
            img = None
            w = max(1, round(cp.width * resize_rate))
            h = max(1, round(cp.height * resize_rate))
        w_scale, h_scale = w / cp.width, h / cp.height
        cams.append(
            Camera.from_dict(
                {
                    "Rcw": qvec2rotmat(im.qvec),
                    "tcw": im.tvec,
                    "fx": fx * w_scale, "fy": fy * h_scale,
                    "cx": cx * w_scale, "cy": cy * h_scale,
                    "width": w, "height": h, "id": im.id,
                }
            )
        )
        if img is not None:
            imgs.append(img)

    npy_cache = sparse / "points3D.npy"
    gs = None
    if cache_points and npy_cache.exists():
        try:
            gs = np.load(npy_cache)
        except Exception:
            gs = None
    if gs is None:
        xyz, rgb, _ = read_pts(sparse / "points3D.bin")
        gs = points_to_gaussians(xyz, rgb)
        if cache_points:
            try:
                np.save(npy_cache, gs)
            except OSError:
                pass

    twcs = np.stack([np.asarray(c.twc) for c in cams])
    scene_size = 1.1 * float(np.max(np.linalg.norm(twcs - twcs.mean(0), axis=1)))
    return GSplatDataset(cameras=cams, images=imgs, gs=gs, scene_size=scene_size,
                         image_paths=img_paths)
