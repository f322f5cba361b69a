"""The reference-parity comparison harness (benchmarks/parity) must parse
both curve spellings, the reference app's stdout format, and produce the
right verdicts — so a future reference-side run drops in with zero glue."""

import json
import subprocess
import sys
from pathlib import Path

HARNESS = Path(__file__).resolve().parent.parent / (
    "benchmarks/parity/compare_curves.py"
)


def run(*argv):
    return subprocess.run(
        [sys.executable, str(HARNESS), *argv],
        capture_output=True,
        text=True,
    )


def write_metrics(path, curve, psnr=None):
    obj = {"loss_curve": curve}
    if psnr is not None:
        obj["psnr_db"] = psnr
    path.write_text(json.dumps(obj))


def test_matching_curves_pass(tmp_path):
    curve = [[i, 1.0 / (1 + i)] for i in range(0, 1001, 100)]
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    write_metrics(a, curve, psnr=47.3)
    write_metrics(b, [[s, v * 1.05] for s, v in curve], psnr=47.8)
    r = run(str(a), str(b))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PARITY: PASS" in r.stdout


def test_diverged_curve_fails(tmp_path):
    curve = [[i, 1.0 / (1 + i)] for i in range(0, 1001, 100)]
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    write_metrics(a, curve)
    write_metrics(b, [[s, v * 10.0] for s, v in curve])
    r = run(str(a), str(b))
    assert r.returncode == 1
    assert "PARITY: FAIL" in r.stdout


def test_psnr_gap_fails(tmp_path):
    curve = [[i, 1.0 / (1 + i)] for i in range(0, 1001, 100)]
    a, b = tmp_path / "a.json", tmp_path / "b.json"
    write_metrics(a, curve, psnr=47.3)
    write_metrics(b, curve, psnr=44.0)
    r = run(str(a), str(b))
    assert r.returncode == 1


def test_reference_stdout_format(tmp_path):
    a = tmp_path / "ours.json"
    write_metrics(a, [[i, 0.01 + 1.0 / (1 + i)] for i in range(0, 1001, 100)])
    # The CUDA sample's growing-interval print pattern
    # (reference: samples/mlp_learning_an_image.cu:283).
    lines = []
    for s in [0, 10, 100, 1000]:
        lines.append(f"Step#{s}: loss={0.01 + 1.0 / (1 + s):.6f} time=123[µs]")
        lines.append(f"Writing '{s}.jpg'... done.")
    b = tmp_path / "ref.log"
    b.write_text("\n".join(lines))
    r = run(str(a), str(b))
    assert r.returncode == 0, r.stdout + r.stderr


def test_bare_curve_json_and_no_overlap(tmp_path):
    a = tmp_path / "a.json"
    a.write_text(json.dumps({"steps": [0, 100], "loss": [1.0, 0.1]}))
    b = tmp_path / "b.json"
    b.write_text(json.dumps({"steps": [500, 600], "loss": [0.01, 0.01]}))
    r = run(str(a), str(b))
    assert r.returncode == 2


def test_committed_golden_curve_parses():
    golden = HARNESS.parent.parent / "golden_albert/metrics.json"
    r = run(str(golden), str(golden))
    assert r.returncode == 0
    assert "PARITY: PASS" in r.stdout
