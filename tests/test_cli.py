"""CLI smoke tests (run on the forced-CPU test platform)."""

import json
import os

import numpy as np
import pytest

from mjhmc_tpu.__main__ import main


def test_sample_command(capsys, tmp_path):
    save = str(tmp_path / "s.npz")
    main([
        "sample", "--config", "gauss2d", "--steps", "100", "--burn", "50",
        "--nbatch", "64", "--save", save,
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["sampler"] == "mjhmc" and rec["chains"] == 64
    assert rec["ess"] > 0
    data = np.load(save)
    assert data["x"].shape == (100, 2, 64)
    assert "dwell" in data

    # diagnostics on the saved file
    main(["diagnostics", "--file", save, "--nlags", "40"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["ess"] > 0 and 0 < rec["spectral_gap"] <= 1.0
    assert rec["rho_first_lags"][0] == pytest.approx(1.0, abs=1e-4)


def test_sample_nuts_command(capsys):
    main([
        "sample", "--config", "gauss2d", "--sampler", "nuts",
        "--steps", "30", "--burn", "10", "--nbatch", "32",
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["sampler"] == "nuts" and rec["grad_evals"] > 0


def test_search_command(capsys):
    main(["search", "--config", "gauss2d", "--steps", "120", "--nbatch", "64"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "best" in rec and len(rec["table"]) == 9


def test_figures_only_flag(tmp_path):
    # --only must pass through the top-level CLI (regression: it used to
    # exist only on figures.main's own parser)
    out = str(tmp_path / "figs")
    main(["figures", "--quick", "--only", "fan", "--out", out])
    assert os.path.exists(os.path.join(out, "trajectory_fan.png"))
    assert os.path.exists(os.path.join(out, "trajectory_fan.npz"))


def test_sample_engine_flag_validates_sampler():
    # --engine pallas backs the four engine-class samplers
    # (mjhmc/control/malt/nuts); others must be rejected before any
    # kernel work (CPU-safe)
    import pytest

    with pytest.raises(SystemExit, match="pallas supports"):
        main([
            "sample", "--config", "gauss2d", "--sampler", "pt",
            "--engine", "pallas", "--steps", "10", "--nbatch", "32",
        ])
