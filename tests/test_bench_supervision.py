"""bench.py supervision: the graded artifact must never be a raw traceback.

BENCH_r03 died at backend init (UNAVAILABLE) and the round-3 outage showed
hangs where jax.devices() never returns; bench.py now runs the protocol in
a watchdogged child with bounded retries and, on final failure, emits ONE
structured JSON line. The failure path is forced deterministically here by
a sub-millisecond probe timeout (no backend involvement)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_final_failure_emits_structured_json():
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"),
         "--attempts", "1", "--probe-timeout", "0.01"],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )
    assert proc.returncode == 1  # failure is still an honest non-zero rc
    record = json.loads(proc.stdout.strip().splitlines()[-1])
    assert record["metric"].startswith("handmvnet_resnet50_paper_fps")
    assert record["value"] is None
    assert record["attempts"] == 1
    assert "probe" in record["error"]
    assert "Traceback" not in proc.stdout
