"""Execute Demo.ipynb headless so the walkthrough is tested, not trusted.

The reference ships Demo.ipynb as its primary user-facing walkthrough
(reference Demo.ipynb cells 9-29); ours mirrors it and supports a
DEMO_TINY=1 mode that shrinks every preset to toy sizes and pins jax to
CPU (cell 1) — identical code paths, seconds instead of minutes, and the
kernel never touches the TPU.
"""

import os

import nbformat
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOK = os.path.join(REPO_ROOT, "Demo.ipynb")


@pytest.mark.slow
def test_demo_notebook_executes_clean(monkeypatch):
    nbclient = pytest.importorskip("nbclient")

    nb = nbformat.read(NOTEBOOK, as_version=4)
    # the kernel is a fresh process inheriting our environ: the axon
    # sitecustomize would re-point jax at the TPU, but cell 1 pins CPU
    # when DEMO_TINY is set.
    monkeypatch.setenv("DEMO_TINY", "1")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    monkeypatch.delenv("CHECKPOINT_DIR", raising=False)
    monkeypatch.delenv("TORCH_CHECKPOINT_DIR", raising=False)
    client = nbclient.NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": REPO_ROOT}})
    client.execute()  # raises CellExecutionError on any failing cell

    executed = [c for c in nb.cells if c.cell_type == "code"]
    assert all(c.execution_count is not None for c in executed)
    # no cell may have emitted an error output even without raising
    for c in executed:
        for out in c.get("outputs", []):
            assert out.get("output_type") != "error", out
