"""Headless viewer: server-side turntable rendering + reference-viewer export.

The reference ships an interactive OpenGL/Qt viewer (SURVEY.md §2.6). A TPU
host is headless, so this layer provides the two capabilities that matter
there: (1) turntable/orbit rendering of a Gaussian set to PNG frames or an
animated GIF via the TPU rasteriser, and (2) export of training state to the
reference-compatible .ply/.npy formats (data/gau_io.py) so the reference's
own GL viewer — which is backend-agnostic about where the file came from —
can open it (/root/reference/gaussian_viewer.py:14-65).
"""

from easygaussiansplatting_tpu.viewer.headless import orbit_cameras, render_turntable, save_gif

__all__ = ["orbit_cameras", "render_turntable", "save_gif"]
