"""Notebooks stay executable: run every code cell of each pipeline mirror.

The reference ships notebooks that mirror its pipeline but nothing checks
they still run; here each notebook's code cells execute in order (the same
semantics a kernel gives them) against the synthetic workspace. The four
notebooks share one workspace directory and build on each other in pipeline
order — prep -> train -> serve/baselines — exactly how a user runs them.

Each notebook runs in its own subprocess on a single CPU device: full
MiniLM-L6 training on the suite's 8-device CPU mesh would trip XLA:CPU's
hard 40s collective-rendezvous abort (2 physical cores), and subprocess
isolation keeps any such abort from taking pytest down with it.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
NB_DIR = REPO / "notebooks"

ORDER = [
    "prepare_data.ipynb",
    "train_two_tower.ipynb",
    "serve_recommendations.ipynb",
    "run_baselines.ipynb",
]

RUNNER = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
import json, os, sys
path, cwd = sys.argv[1], sys.argv[2]
os.chdir(cwd)
nb = json.loads(open(path).read())
ns = {{"__name__": "__main__"}}
for i, cell in enumerate(nb["cells"]):
    if cell["cell_type"] != "code":
        continue
    src = "".join(cell["source"])
    try:
        exec(compile(src, f"cell {{i}}", "exec"), ns)
    except Exception as exc:
        print(f"CELL_FAILED {{i}}: {{type(exc).__name__}}: {{exc}}", flush=True)
        raise
print("NOTEBOOK_OK")
"""


@pytest.fixture(scope="module")
def nb_cwd(tmp_path_factory):
    """Fake repo root so notebooks write nb_workspace/ into a tmp dir."""
    cwd = tmp_path_factory.mktemp("nbrun")
    (cwd / "instacart_next_order_recommendation_tpu").mkdir()  # repo-root marker
    return cwd


@pytest.mark.slow
@pytest.mark.parametrize("name", ORDER)
def test_notebook_runs(name, nb_cwd):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", RUNNER.format(), str(NB_DIR / name), str(nb_cwd)],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0 and "NOTEBOOK_OK" in proc.stdout, (
        proc.stdout[-2500:] + proc.stderr[-2500:]
    )
