"""CLI entry-point smokes, run in-process (runpy) at fixture scale.

In-process keeps the conftest's CPU/virtual-mesh config (subprocesses would
grab the real TPU plugin and pay multi-minute compiles).
"""

import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]


def _run(script, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    runpy.run_path(str(ROOT / script), run_name="__main__")


def test_render_cli_golden(tmp_path, monkeypatch):
    out = tmp_path / "r.png"
    _run("render.py", ["--backend", "golden", "--out", str(out)], monkeypatch)
    assert out.stat().st_size > 0


def test_render_cli_tiled_fixture(tmp_path, monkeypatch):
    out = tmp_path / "r2.png"
    _run("render.py", ["--backend", "tiled", "--max-patches", "1024",
                       "--out", str(out)], monkeypatch)
    assert out.stat().st_size > 0


def test_sh_demo_cli(tmp_path, monkeypatch):
    out = tmp_path / "sh.png"
    _run("sh_demo.py", ["--height", "32", "--degree", "2", "--out", str(out)],
         monkeypatch)
    assert out.stat().st_size > 0


@pytest.mark.slow
def test_train_eval_viewer_cli_roundtrip(tmp_path, monkeypatch):
    out = tmp_path / "run"
    _run("train.py", ["--synthetic", "--epochs", "2", "--backend", "tiled",
                      "--max-patches", "4096", "--no-adaptive-budget",
                      "--save-every", "2", "--out", str(out)], monkeypatch)
    final = out / "final.npy"
    assert final.exists() and (out / "final.ply").exists()
    assert (out / "checkpoint.npz").exists()

    _run("eval.py", ["--gs", str(final), "--synthetic", "--backend", "tiled",
                     "--max-patches", "4096", "--max-views", "1"], monkeypatch)

    gif = tmp_path / "orbit.gif"
    _run("gaussian_viewer.py", ["--gs", str(final), "--backend", "tiled",
                                "--frames", "2", "--width", "32",
                                "--height", "32", "--out", str(gif)], monkeypatch)
    assert gif.stat().st_size > 0

    # resume continues from the checkpoint
    _run("train.py", ["--synthetic", "--epochs", "3", "--backend", "tiled",
                      "--max-patches", "4096", "--no-adaptive-budget",
                      "--resume", str(out / "checkpoint.npz"),
                      "--out", str(out)], monkeypatch)
    assert (out / "final.npy").exists()


def test_sh_demo_sphere_renderer():
    """--serve scene parity: GT + degree-1/3/4/5 rotating spheres
    (/root/reference/sh_demo.py:206-271), rendered as one jitted strip."""
    import sh_demo as m

    img = m.procedural_texture(32, 64)
    coeffs, _ = m.fit_sh(img, 5)
    render = m.make_sphere_renderer(img, coeffs, res=48)
    f0 = np.asarray(render(0.0))
    f1 = np.asarray(render(1.0))
    assert f0.shape == (48, 48 * 5, 3)
    assert not np.allclose(f0, f1)  # rotation moves the view
    # corners lie outside every disc: background
    np.testing.assert_allclose(f0[0, 0], 0.08, atol=1e-6)
    # higher truncation degree reconstructs the GT pane better
    panes = [f0[:, i * 48:(i + 1) * 48] for i in range(5)]
    errs = [np.abs(p - panes[0]).mean() for p in panes[1:]]
    assert errs[-1] < errs[0]
