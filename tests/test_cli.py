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


def test_cli_serve_background(spark, tmp_path):
    """`serve` subcommand parity with `rustac serve`: starts the HTTP
    API over a table (background test hook) and answers a search."""
    import json as _json
    import urllib.request

    from rustac_spark import DATA_DIR
    from rustac_spark.cli import main

    # use a free port; --background returns after binding
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    assert main(["serve", f"{DATA_DIR}/stac_items.parquet",
                 "--port", str(port), "--background"]) == 0
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search?ids=item-0042",
            timeout=10) as r:
        fc = _json.loads(r.read().decode())
    assert fc["numberMatched"] == 1
    assert fc["features"][0]["id"] == "item-0042"
