"""Example-driver smoke tests: run a representative subset end-to-end under
RPT_TPU_PREVIEW (tiny resolution, few samples) on the CPU test mesh."""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, EXAMPLES)


@pytest.fixture(autouse=True)
def _preview(monkeypatch, tmp_path):
    monkeypatch.setenv("RPT_TPU_PREVIEW", "16")
    monkeypatch.chdir(tmp_path)


def test_basic_example():
    import basic

    basic.main()
    assert os.path.exists("output.png")


def test_compound_example():
    import compound

    compound.main()
    assert os.path.exists("output.png")


def test_volumetric_pathtrace_lampshade_example():
    import volumetric_pathtrace_lampshade as vp

    vp.main()
    files = os.listdir("lampshade/pathtrace")
    assert files, "no output written"


def test_spheres_dof_example():
    import spheres

    spheres.main()
    assert any(f.startswith("output_") for f in os.listdir("."))
