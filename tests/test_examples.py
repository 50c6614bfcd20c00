"""Example-driver smoke tests.

Every non-underscore driver under ``examples/`` runs end-to-end under
RPT_TPU_PREVIEW (tiny resolution, few samples, photon caps) and
RPT_TPU_FRAMES=1 (video drivers render one frame) on the CPU test mesh,
and must write at least one image. This is the CI analog of the
reference's "cargo run --example <name>" surface — a signature drift in
scene.py or _assets.py breaks these instead of shipping silently.
"""

import importlib
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, EXAMPLES)

ALL_EXAMPLES = sorted(
    f[:-3]
    for f in os.listdir(EXAMPLES)
    if f.endswith(".py") and not f.startswith("_")
)


@pytest.fixture(autouse=True)
def _preview(monkeypatch, tmp_path):
    monkeypatch.setenv("RPT_TPU_PREVIEW", "32")
    monkeypatch.setenv("RPT_TPU_PREVIEW_SAMPLES", "2")
    monkeypatch.setenv("RPT_TPU_PREVIEW_PHOTONS", "2000")
    monkeypatch.setenv("RPT_TPU_FRAMES", "1")
    monkeypatch.chdir(tmp_path)


def _images_under(root):
    out = []
    for dirpath, _, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".png")]
    return out


@pytest.mark.parametrize("name", ALL_EXAMPLES)
def test_example_smoke(name, tmp_path):
    mod = importlib.import_module(name)
    mod.main()
    assert _images_under(tmp_path), f"{name} wrote no image"
