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
