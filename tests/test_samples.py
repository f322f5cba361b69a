"""Samples run end-to-end at tiny scale (regression net for the demo
pipelines; quality numbers come from the on-device golden runs)."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_nerf_synthetic_tiny():
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from tcnn_tpu.ops.pallas_utils import set_interpret_mode\n"
        "set_interpret_mode(True)\n"
        "import sys, runpy\n"
        "sys.argv = ['nerf', '3', '64']\n"
        f"runpy.run_path({str(ROOT / 'samples/nerf_synthetic.py')!r},"
        " run_name='__main__')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "validation view PSNR" in out.stdout


def test_sdf_learning_tiny():
    # The eikonal term differentiates through grad_x f during training —
    # a second-order objective running end-to-end in a user-facing sample.
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import sys\n"
        f"sys.path.insert(0, {str(ROOT / 'samples')!r})\n"
        "from sdf_learning import fit\n"
        "d, e, hist = fit(n_steps=120, batch=2048, log_every=60)\n"
        "assert hist[-1] < hist[0] * 0.2, hist\n"
        "assert d < 5e-3 and e < 0.5, (d, e)\n"
        "print('SDF OK', d, e)\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SDF OK" in out.stdout
