"""CLI end-to-end tests (subprocess, CPU platform)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_cli(*args, timeout=300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable, "-m", "hcrag_tpu.cli", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=REPO,
    )


@pytest.mark.e2e
class TestCLI:
    def test_stats(self):
        out = run_cli("stats")
        assert out.returncode == 0, out.stderr[-500:]
        assert "Total entries: 585" in out.stdout
        assert "'Product': 100" in out.stdout

    def test_build_and_query_artifacts(self, tmp_path):
        out = run_cli("build", "--out", str(tmp_path))
        assert out.returncode == 0, out.stderr[-500:]
        assert "585 rows" in out.stdout
        assert (tmp_path / "dense_index.npz").exists()
        assert (tmp_path / "graph.npz").exists()

        q = run_cli(
            "query", "mountain bike", "--artifacts", str(tmp_path),
            "--threshold", "0.1",
        )
        assert q.returncode == 0, q.stderr[-500:]
        assert "Found" in q.stdout

    def test_agent(self):
        out = run_cli("agent", "What mountain bikes do you have?")
        assert out.returncode == 0, out.stderr[-500:]
        assert "Decision:" in out.stdout

    def test_viz(self, tmp_path):
        path = str(tmp_path / "v.html")
        out = run_cli("viz", "mountain bike", "--out", path, "--threshold", "0.0")
        assert out.returncode == 0, out.stderr[-500:]
        assert os.path.exists(path)
