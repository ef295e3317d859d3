"""The examples/ scripts are executable documentation — run each one.

Each example runs in a subprocess with the clean CPU env (same mechanism
as conftest's re-exec) so import-time platform selection behaves exactly
as it does for a user.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ("01_attention_features.py", []),
    ("02_train_tiny.py", []),
    ("03_serve_paged.py", []),
    ("04_multichip_mesh.py", ["--cpu-mesh"]),
    ("05_import_hf.py", []),
]


@pytest.mark.parametrize("name,args", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(name, args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name), *args],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, (
        f"{name} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
