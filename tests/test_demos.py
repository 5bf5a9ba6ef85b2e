"""CLI smoke tests for the demo scripts (subprocess, tiny meshes, CPU) —
guards the user-facing argument surface."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_demo(script, *extra):
    env = dict(os.environ)
    cmd = [sys.executable, str(REPO / "demos" / script),
           "--elements", "4", "--degree", "2", "--periods", "0.2",
           "--dtype", "f64", "--platform", "cpu",
           "--progress-every", "50", *extra]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                         cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_demo_linear_box_cli(tmp_path):
    out = run_demo("demo_linear_box.py", "--output",
                   str(tmp_path / "o"), "--checkpoint",
                   str(tmp_path / "ck"), "--checkpoint-every", "10",
                   "--progress-every", "10")
    assert "Solve time per step" in out
    assert "degrees-of-freedom" in out
    assert list(tmp_path.glob("ck_*.npz")), "checkpoint not written"
    assert list(tmp_path.glob("o_linear_box.vtk")), "vtk not written"


def test_demo_nonlinear_bowl_cli(tmp_path):
    out = run_demo("demo_nonlinear_bowl.py", "--elements", "12",
                   "--geometry", "conformal",
                   "--output", str(tmp_path / "b"))
    assert "conformal bowl" in out
    assert "pressure at focus" in out


@pytest.mark.parametrize("script", ["demo_linear_piston.py",
                                    "demo_nonlinear_box.py"])
def test_other_demos_cli(script):
    out = run_demo(script)
    assert "Solve time per step" in out


def test_demo_sharded_box_cli(tmp_path):
    """The shared demo driver drives sharded models: probe + output."""
    out = run_demo("demo_sharded_box.py", "--devices", "4", "--grid",
                   "2", "2", "1", "--steps", "20", "--progress-every",
                   "10", "--probe", "0.007", "0.005", "0.005",
                   "--output", str(tmp_path / "s"))
    assert "Solve time per step" in out
    assert list(tmp_path.glob("s_sharded_box_probe.txt")), "probe missing"
    assert list(tmp_path.glob("s_sharded_box.vtk")), "vtk missing"


def test_demo_nonlinear_box_two_layer():
    """Heterogeneous (two-layer) Westervelt through the demo CLI."""
    out = run_demo("demo_nonlinear_box.py", "--two-layer")
    assert "two-layer medium" in out
    assert "Solve time per step" in out


@pytest.mark.slow
def test_demo_bowl_sharded_cli(tmp_path):
    """Flagship bowl sharded over 8 virtual devices through the CLI —
    both the structured box partition and (via unstructured geometry)
    the imported-mesh RCB path."""
    out = run_demo("demo_nonlinear_bowl.py", "--elements", "12",
                   "--devices", "8", "--output", str(tmp_path / "b"))
    assert "sharded over device grid" in out
    assert "pressure at focus" in out


@pytest.mark.slow
def test_demo_bowl_two_layer_cross_path(tmp_path):
    """Heterogeneous (two-layer) bowl through the CLI: the structured
    pair kernel and the imported-mesh (round-tripped .msh) pair path
    must report the same focal pressure — same mesh, disjoint code
    paths (exercises the shared-scatter indexed pair)."""
    import re

    vals = {}
    for geom in ("conformal", "unstructured"):
        out = run_demo("demo_nonlinear_bowl.py", "--two-layer",
                       "--elements", "9", "--geometry", geom,
                       "--periods", "0.25",
                       "--output", str(tmp_path / geom))
        assert "two-layer medium" in out
        m = re.search(r"pressure at focus: (\S+) Pa", out)
        vals[geom] = float(m.group(1))
    a, b = vals["conformal"], vals["unstructured"]
    assert abs(a - b) <= 1e-6 * max(abs(a), 1.0), vals
