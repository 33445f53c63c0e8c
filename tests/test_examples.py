# (C) 2026. Licensed under the Apache License, Version 2.0.
"""Execute every example script in-process on the virtual CPU mesh.

The reference runs its guide notebooks under nbmake in CI
(``/root/reference/tox.ini`` notebook env) so they cannot rot; this is the
same discipline for ``examples/*.py``.  Each example exposes ``main()``; the
one long-running benchmark (07) is exercised through its parameterized
``run()`` at a small size instead.
"""

import importlib.util
import os
import sys

import pytest

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name: str):
    path = os.path.join(_EXAMPLES_DIR, name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name[:-3]] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(name[:-3], None)
    return mod


@pytest.mark.parametrize(
    "name",
    [
        "01_quickstart.py",
        "02_pauli_projection.py",
        "03_open_closed_shell.py",
        "04_orbital_optimization.py",
        "05_mesh_scale_out.py",
        "06_checkpoint_resume.py",
        "08_fcidump_workflow.py",
        "09_choose_subspace_dimension.py",
        "10_excitation_augmentation.py",
        "11_real_molecule_n2.py",
        "12_excited_states.py",
        "13_large_active_space.py",
        "15_multiprocess_cluster.py",
        "16_open_shell_rohf.py",
    ],
)
def test_example_runs(name, tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)  # sandbox any files the example writes
    mod = _load(name)
    mod.main()
    out = capsys.readouterr().out
    assert out.strip()  # every example narrates its result


def test_example_14_ccpvdz_small(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    mod = _load("14_ccpvdz_n2.py")
    # full main() defaults are sized for the guide; keep the suite fast
    mod.main(n_shots=1_500, samples_per_batch=40, max_iterations=2)
    out = capsys.readouterr().out
    assert "28 spherical AOs" in out and "SQD energy" in out


def test_example_07_benchmark_small(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    mod = _load("07_benchmark_pauli_projection.py")
    mod.run(40, [20_000])  # the full main() runs d = 5e6; keep the suite fast
    mod.run(70, [20_000])  # beyond the reference's 63-qubit ceiling
    out = capsys.readouterr().out
    assert "n= 40" in out and "n= 70" in out
