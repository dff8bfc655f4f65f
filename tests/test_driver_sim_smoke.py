"""Smoke-level end-to-end run of scripts/driver_sim.py — the exact
artifact the grading driver mirrors — in a FRESH subprocess (own
SparkSession, own DuckDB), so the script itself can't rot while the
in-process mirror (test_oracle_parity.py) stays green.

Scoped to two fast queries and --no-entry to keep the suite's wall
time flat; the full 60-query run is the round's verify step."""

from __future__ import annotations

import subprocess
import sys


def test_driver_sim_subprocess_smoke():
    proc = subprocess.run(
        [
            sys.executable,
            "/root/repo/scripts/driver_sim.py",
            "--no-entry",
            "--only",
            "multi_filter_counts,status_histogram",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "TOTAL ok=2 fail=0" in proc.stdout, proc.stdout
