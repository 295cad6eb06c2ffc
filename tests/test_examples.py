"""Smoke tests: every example's main() runs end to end on tiny configs.

The reference examples (examples_pytorch/example{1..4}.py) are the
workload definitions of the library (SURVEY.md section 2 component 16);
these tests execute our reworks for a few steps at small sizes into a
tmpdir and assert the artifacts appear, so regressions in the example
code paths (Renderer facade, gif assembly, optimization loops) surface
in CI rather than at demo time.  Plus a 2-process jax.distributed CPU
dryrun of parallel/distributed.py (the multi-host entry point).
"""

import importlib.util
import os
import pathlib
import socket
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"
REF_DATA = pathlib.Path("/root/reference/examples_pytorch/data")


def _load_example(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / (name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_example(monkeypatch, name, argv, entry="run"):
    if not REF_DATA.exists():
        pytest.skip("reference example data not available")
    mod = _load_example(name)
    monkeypatch.setattr(sys, "argv", [name + ".py"] + argv)
    return getattr(mod, entry)()


def _assert_optimized(losses):
    """The reference examples are convergence demos (e.g. example4.py's
    loss<70 stop), not just artifact emitters: even a 3-step smoke must
    show the loss moving, or a zero-grad wiring regression slips by.
    (example3 returns [before, after] at a fixed eval viewpoint, the
    others their per-step series; example4 may stop early.)"""
    assert len(losses) >= 2
    assert losses[-1] < losses[0], losses


def test_example1_viewpoint_sweep(monkeypatch, tmp_path):
    out = tmp_path / "ex1.gif"
    _run_example(
        monkeypatch, "example1",
        ["-o", str(out), "-s", "64", "-b", "8", "--azimuth_step", "45"],
    )
    assert out.exists() and out.stat().st_size > 0


def test_example2_vertex_fit(monkeypatch, tmp_path):
    oo, orr = tmp_path / "opt.gif", tmp_path / "res.gif"
    losses = _run_example(
        monkeypatch, "example2",
        ["-oo", str(oo), "-or", str(orr), "-s", "64", "-n", "3",
         "--sweep_step", "90"],
    )
    assert oo.exists() and orr.exists()
    _assert_optimized(losses)


def test_example3_texture_fit(monkeypatch, tmp_path):
    out = tmp_path / "res.gif"
    losses = _run_example(
        monkeypatch, "example3",
        ["-or", str(out), "-s", "64", "-n", "3", "--sweep_step", "90"],
    )
    assert out.exists() and out.stat().st_size > 0
    _assert_optimized(losses)


def test_example4_camera_fit(monkeypatch, tmp_path):
    out = tmp_path / "res.gif"
    losses = _run_example(
        monkeypatch, "example4",
        ["-or", str(out), "-s", "64", "-n", "3"],
    )
    assert out.exists() and out.stat().st_size > 0
    _assert_optimized(losses)


def test_example5_sharded(monkeypatch, tmp_path):
    out = tmp_path / "ex5.gif"
    _run_example(
        monkeypatch, "example5_sharded",
        ["-o", str(out), "-s", "32", "-n", "2"],
        entry="main",
    )
    assert out.exists() and out.stat().st_size > 0


def test_two_process_distributed_dryrun():
    """parallel/distributed.py::initialize + global_mesh across TWO OS
    processes (2 virtual CPU devices each, gloo collectives): the sharded
    render AND the full textured fwd+bwd train step (teapot, AA on, on
    both a data-spanning and a face-spanning mesh) must match the
    single-process oracle in both workers -- the vertex/texture gradient
    psums and the ordered z-combine's all_gather actually cross the
    process boundary.  This is the CPU stand-in for a multi-host pod
    slice (BASELINE.json config 5)."""
    worker = str(pathlib.Path(__file__).resolve().parent / "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    # subprocesses must see the repo (and the axon site dir, which the
    # machine's sitecustomize expects on PYTHONPATH)
    repo = str(EXAMPLES.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, "/root/.axon_site", env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "worker %d failed:\n%s" % (i, out)
        assert "OK" in out
