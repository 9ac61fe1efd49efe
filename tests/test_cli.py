"""CLI surface (python -m rustac_spark …) — subprocess-driven."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args, timeout=240):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "rustac_spark", *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)


@pytest.mark.slow
def test_cli_search_and_translate(tmp_path):
    out = run_cli("search", "data/stac_items.parquet",
                  "--bbox=-106.1,40.5,-106.0,40.6", "--datetime", "2024",
                  "--sortby=-datetime", "--fields=+id,+datetime",
                  "--limit", "3")
    assert out.returncode == 0, out.stderr[-500:]
    items = [json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert [i["id"] for i in items] == ["item-0049", "item-0048",
                                        "item-0047"]

    fc = str(tmp_path / "out.json")
    out = run_cli("search", "data/stac_items.parquet",
                  "--filter", "sat:relative_orbit = 98", "-o", fc)
    assert out.returncode == 0, out.stderr[-500:]
    doc = json.load(open(fc))
    assert doc["numberReturned"] == 49

    nd = str(tmp_path / "items.ndjson")
    out = run_cli("translate", "data/stac_items.parquet", nd)
    assert out.returncode == 0, out.stderr[-500:]
    assert sum(1 for _ in open(nd)) == 100

    out = run_cli("validate", "data/stac_items.parquet", "--limit", "10")
    assert out.returncode == 0, out.stderr[-500:]
    assert "0 invalid" in out.stderr

    out = run_cli("validate", "data/stac_items.parquet", "--limit", "5",
                  "--full")
    assert out.returncode == 0, out.stderr[-500:]
    assert "0 invalid" in out.stderr
