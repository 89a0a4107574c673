"""Tests for the bench tooling: the regression gate and the cold-pass
row list (pure-Python — no Spark session needed)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import bench_gate  # noqa: E402


def _write(tmp_path, name, queries, **extra):
    doc = {"metric": "total_query_sec",
           "value": round(sum(queries.values()), 3),
           "unit": "sec", "queries": queries, "sf": 0.1}
    doc.update(extra)
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_gate_passes_on_improvement(tmp_path, capsys):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 0.5})
    new = _write(tmp_path, "new.json", {"q1": 0.8, "q2": 0.4})
    assert bench_gate.main([new, old]) == 0
    assert "PASS" in capsys.readouterr().out


def test_gate_alarms_on_regression(tmp_path, capsys):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 0.5})
    new = _write(tmp_path, "new.json", {"q1": 2.0, "q2": 0.5})
    assert bench_gate.main([new, old]) == 1
    assert "REGRESSED q1" in capsys.readouterr().out


def test_gate_noise_floor_suppresses_tiny_ratios(tmp_path):
    # 0.02s -> 0.05s is 2.5x but only 0.03s absolute: scheduling noise.
    old = _write(tmp_path, "old.json", {"q1": 0.02})
    new = _write(tmp_path, "new.json", {"q1": 0.05})
    assert bench_gate.main([new, old]) == 0


def test_gate_alarms_on_new_failure(tmp_path, capsys):
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    new = _write(tmp_path, "new.json", {"q1": -1.0})
    assert bench_gate.main([new, old]) == 1
    assert "now errors" in capsys.readouterr().out


def test_gate_persistent_failure_is_note_not_regression(tmp_path, capsys):
    """A query already failing in OLD must not re-trip the gate every
    round (and must not render 'was -1.000s')."""
    old = _write(tmp_path, "old.json", {"q1": -1.0, "q2": 0.5})
    new = _write(tmp_path, "new.json", {"q1": -1.0, "q2": 0.5})
    assert bench_gate.main([new, old]) == 0
    out = capsys.readouterr().out
    assert "still failing: q1" in out and "-1.000" not in out


def test_gate_notes_fixed_query(tmp_path, capsys):
    old = _write(tmp_path, "old.json", {"q1": -1.0})
    new = _write(tmp_path, "new.json", {"q1": 0.3})
    assert bench_gate.main([new, old]) == 0
    assert "fixed: q1" in capsys.readouterr().out


def test_gate_space_separated_flag_values(tmp_path):
    """Both documented flag forms parse: --ratio=3.0 and --ratio 3.0
    (the latter used to leak '3.0' into the positional OLD slot)."""
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    new = _write(tmp_path, "new.json", {"q1": 2.5})   # 2.5x, +1.5s
    assert bench_gate.main([new, old]) == 1
    assert bench_gate.main([new, old, "--ratio", "3.0"]) == 0
    assert bench_gate.main([new, old, "--ratio=3.0"]) == 0
    assert bench_gate.main([new, old, "--ratio", "3.0",
                            "--floor", "0.1"]) == 0


def test_gate_reads_driver_wrapped_format(tmp_path):
    inner = {"metric": "total_query_sec", "value": 1.0, "unit": "sec",
             "queries": {"q1": 1.0}, "sf": 0.1}
    p = tmp_path / "wrapped.json"
    p.write_text(json.dumps({"n": 1, "rc": 0, "parsed": inner}))
    new = _write(tmp_path, "new.json", {"q1": 1.0})
    assert bench_gate.main([new, str(p)]) == 0


def test_gate_cli_runs_against_repo_history():
    """End-to-end through the CLI against the real prior-round files."""
    bench_files = sorted(REPO.glob("BENCH_r*.json"))
    if len(bench_files) < 2:
        return  # first round: nothing to compare
    rc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "bench_gate.py"),
         str(bench_files[-1]), str(bench_files[-2])],
        capture_output=True, text=True)
    assert rc.returncode in (0, 1)  # parses and renders a verdict
    assert "bench_gate:" in rc.stdout


def test_materialized_rows_are_registered():
    """bench.py's cold-pass list must track the registry: a renamed or
    dropped row would silently lose its cold column."""
    import bench
    from dexscraper_spark.plans.registry import all_queries
    names = set(all_queries())
    missing = [r for r in bench.MATERIALIZED_ROWS if r not in names]
    assert not missing, f"cold-pass rows not in registry: {missing}"
