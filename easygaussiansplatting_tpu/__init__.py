"""easygaussiansplatting_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/Pallas re-design of the capabilities of
scomup/EasyGaussianSplatting (see SURVEY.md): the differentiable 6-stage
splatting pipeline (project, cov3d, EWA cov2d, SH color, conic, tile-binned
front-to-back alpha blending), a full training loop with densify / prune /
alpha-reset, COLMAP / .ply data I-O, a numerical-differentiation verification
harness, and multi-chip sharding over a `jax.sharding.Mesh`.

Layer map (TPU-native equivalents of the reference layers, SURVEY.md §1):
  L0 kernels   -> ops/pallas        (Pallas TPU kernels; replaces gsplatcu CUDA)
  L1 autograd  -> ops/rasterize.py  (jax.custom_vjp; replaces GSFunction)
  L2 golden    -> golden/           (NumPy float64 oracle; replaces gausplat.py)
  L3 scripts   -> scripts/ + CLI entry points at repo root
  L4 data/I-O  -> data/             (COLMAP .bin, .ply/.npy, loss in ops/)
  L5 viewer    -> viewer/           (headless turntable + reference-compatible export)
  L6 docs      -> docs/
  (new) shard  -> parallel/         (mesh/pjit/shard_map; reference has none, SURVEY §2.9)
"""

import os as _os

from easygaussiansplatting_tpu.version import __version__

__all__ = ["__version__"]

# Persistent XLA compilation cache (repo-local, gitignored): first compiles
# of the raster pipeline over tunneled backends run minutes — re-runs of
# benches/tests/training with unchanged programs should not pay that twice.
# Opt out with EGS_NO_COMPILE_CACHE=1.
if _os.environ.get("EGS_NO_COMPILE_CACHE") != "1":
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      ".jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
