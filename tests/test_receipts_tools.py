"""CPU tests for the receipts post-processing tools (VERDICT r4 item 1).

tools/receipts_winners.py turns the repeats-carrying receipt rows into
spread-aware winner/tie calls; the arbitration rule (bands = median ±
half the observed repeat range; a winner must clear every rival's band)
is pure arithmetic, so it is pinned here on synthetic rows — including
the round-4 failure mode the tool exists to prevent: a 13% margin
declared over a >25% noise band.
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)
from receipts_winners import _band, arbitrate  # noqa: E402


def _row(config, sampler, value, spread=None, integrator=None):
    detail = {"config": config, "sampler": sampler}
    if spread is not None:
        detail["repeats"] = {"n": 5, "rel_spread": spread,
                             "values": [value] * 5}
    if integrator is not None:
        detail["integrator"] = integrator
    return {"value": value, "detail": detail}


def test_clear_winner_beyond_spread():
    rows = [
        _row("g", "mjhmc", 2.0e6, spread=0.05, integrator="leapfrog"),
        _row("g", "control", 1.0e6, spread=0.05, integrator="leapfrog"),
    ]
    call = arbitrate(rows)["g"]
    assert call["winner"] == "mjhmc"
    assert abs(call["margin_over_runner_up"] - 1.0) < 1e-9
    assert call["ranking"][0]["sampler"] == "mjhmc"
    assert call["ranking"][0]["integrator"] == "leapfrog"


def test_round4_failure_mode_is_a_tie():
    # the round-4 gauss2d case: a 13% margin with same-protocol swings
    # >25% — bands overlap, so the tool must refuse to declare a winner
    rows = [
        _row("g", "control", 3.69e7, spread=0.30),
        _row("g", "mjhmc", 3.26e7, spread=0.30),
    ]
    call = arbitrate(rows)["g"]
    assert call["winner"] is None
    assert set(call["tie"]) == {"control", "mjhmc"}


def test_rows_without_repeats_get_conservative_band():
    lo, hi = _band(_row("g", "x", 100.0))
    assert (lo, hi) == (75.0, 125.0)
    lo, hi = _band(_row("g", "x", 100.0, spread=0.10))
    assert (lo, hi) == (95.0, 105.0)


def test_single_sampler_config_has_no_winner_call():
    call = arbitrate([_row("g", "mjhmc", 1.0, spread=0.01)])["g"]
    assert call["winner"] is None and call["tie"] == ["mjhmc"]


def test_tie_requires_reaching_the_top_band():
    # three samplers: top two overlap, third is far below → tie of two
    rows = [
        _row("g", "a", 1.00e6, spread=0.20),
        _row("g", "b", 0.95e6, spread=0.20),
        _row("g", "c", 0.30e6, spread=0.20),
    ]
    call = arbitrate(rows)["g"]
    assert call["winner"] is None
    assert set(call["tie"]) == {"a", "b"}


def test_cli_writes_winners_json(tmp_path):
    rows = [
        _row("cfg", "mjhmc", 2.0e6, spread=0.05),
        _row("cfg", "control", 1.0e6, spread=0.05),
    ]
    rec = tmp_path / "r.json"
    rec.write_text(json.dumps(rows))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "receipts_winners.py"),
         str(rec)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert out.returncode == 0, out.stderr
    assert "winner mjhmc" in out.stdout
    calls = json.loads(
        (tmp_path / "docs" / "figures" / "ess_winners.json").read_text()
    )
    assert calls["cfg"]["winner"] == "mjhmc"


def test_receipts_to_markdown_render():
    """The RESULTS table renderer: winner bolded only on a declared win,
    all contenders bolded on a tie, spreads and tuned axes in the cells."""
    from receipts_to_markdown import render

    rows = [
        _row("gauss2d", "mjhmc", 2.0e6, spread=0.05, integrator="two_stage"),
        _row("gauss2d", "control", 1.0e6, spread=0.05),
        _row("product_of_t", "mjhmc", 1.0e6, spread=1.5),
        _row("product_of_t", "control", 1.2e6, spread=1.2),
    ]
    for r in rows:
        r["detail"]["num_leapfrog_steps"] = 10
    calls = {
        "gauss2d": {"winner": "mjhmc"},
        "product_of_t": {"winner": None, "tie": ["mjhmc", "control"]},
    }
    md = render(rows, calls)
    lines = md.splitlines()
    g = next(l for l in lines if l.startswith("| gauss2d"))
    assert "**2.00e6** ±5% (two_stage, M=10)" in g
    assert "**1.00e6**" not in g  # loser not bolded
    t = next(l for l in lines if "product_of_t" in l)
    assert "*(tie)*" in t
    assert "**1.00e6**" in t and "**1.20e6**" in t  # both tied cells bold
