"""Unit tests for the evidence-policy tooling in tools/driver_check.py —
the machinery that keeps CORRECTNESS rows honest (staleness gate,
rotation promises, guarded rebase). No SparkSession needed: the current
fingerprints are monkeypatched to synthetic values."""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "driver_check",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "driver_check.py"),
)
dc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(dc)


@pytest.fixture()
def world(tmp_path, monkeypatch):
    """A synthetic evidence world: 4 queries, window of 2."""
    ev = tmp_path / "evidence.json"
    passf = tmp_path / ".last_full_pass.json"
    monkeypatch.setattr(dc, "EVIDENCE_FILE", str(ev))
    monkeypatch.setattr(dc, "PASS_FILE", str(passf))
    monkeypatch.setattr(dc, "DRIVER_WINDOW", 2)
    names = ["q1", "q2", "q3", "q4"]
    fps = {n: f"fp_{n}" for n in names}
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (names, dict(fps)))
    ev.write_text(json.dumps({n: {"fp": fps[n], "round": 1} for n in names}))
    return {"ev": ev, "passf": passf, "names": names, "fps": fps}


def _recorded(world) -> dict:
    return json.loads(world["ev"].read_text())


def test_staleness_green_when_fingerprints_match(world, capsys):
    with pytest.raises(SystemExit) as e:
        dc.staleness()
    assert e.value.code == 0
    assert "staleness ok" in capsys.readouterr().out


def test_staleness_flags_changed_query_outside_window(world, monkeypatch, capsys):
    cur = dict(world["fps"])
    cur["q3"] = "DIFFERENT"  # q3 sits outside the 2-entry window
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (world["names"], cur))
    with pytest.raises(SystemExit) as e:
        dc.staleness()
    assert e.value.code == 1
    out = capsys.readouterr().out
    assert "q3" in out and "changed since r1" in out


def test_staleness_reports_outstanding_promises(world, capsys):
    rec = _recorded(world)
    rec["q4"]["must_rotate"] = 5
    world["ev"].write_text(json.dumps(rec))
    with pytest.raises(SystemExit) as e:
        dc.staleness()
    assert e.value.code == 0  # informational, not a failure
    assert "q4" in capsys.readouterr().out


def test_evidence_update_refuses_due_promise_outside_window(world, capsys):
    rec = _recorded(world)
    rec["q3"]["must_rotate"] = 2
    world["ev"].write_text(json.dumps(rec))
    with pytest.raises(SystemExit) as e:
        dc.evidence_update(2)
    assert "q3" in str(e.value)
    # the refusal must not have rewritten anything
    assert _recorded(world)["q1"]["round"] == 1


def test_evidence_update_honors_future_promise_and_clears_on_rotation(world):
    rec = _recorded(world)
    rec["q3"]["must_rotate"] = 99  # not due yet
    world["ev"].write_text(json.dumps(rec))
    dc.evidence_update(2)  # window = q1, q2 -> fine
    rec = _recorded(world)
    assert rec["q1"]["round"] == 2 and rec["q3"]["round"] == 1
    assert rec["q3"]["must_rotate"] == 99  # promise survives for later rounds


def test_rebase_refuses_without_recorded_pass(world, capsys):
    with pytest.raises(SystemExit) as e:
        dc.evidence_rebase()
    assert "no recorded green full pass" in str(e.value)


def test_rebase_refuses_when_sources_postdate_pass(world, tmp_path, monkeypatch):
    src = tmp_path / "late.py"
    src.write_text("x = 1\n")
    monkeypatch.setattr(dc, "_fingerprint_sources", lambda: [str(src)])
    world["passf"].write_text(json.dumps(
        {"ts": os.path.getmtime(str(src)) - 60, "sf_dir": "sfX", "n_ok": 4}
    ))
    with pytest.raises(SystemExit) as e:
        dc.evidence_rebase()
    assert "sources changed after" in str(e.value)


def test_rebase_refuses_pass_without_content_digests(world, tmp_path, monkeypatch):
    """A pass recorded before digest stamping is insufficient evidence —
    the rebase must demand a re-run, not fall back to mtimes alone."""
    src = tmp_path / "old.py"
    src.write_text("x = 1\n")
    monkeypatch.setattr(dc, "_fingerprint_sources", lambda: [str(src)])
    world["passf"].write_text(json.dumps(
        {"ts": time.time() + 5, "sf_dir": "sfX", "n_ok": 4}
    ))
    with pytest.raises(SystemExit) as e:
        dc.evidence_rebase()
    assert "predates content-digest" in str(e.value)


def test_rebase_refuses_on_content_change_despite_old_mtime(world, tmp_path, monkeypatch):
    """Round-4 verdict #5: a git checkout rewrites mtimes, so a content
    change whose mtime PREDATES the recorded pass must still refuse —
    the digest check is the airtight half of the guard."""
    src = tmp_path / "old.py"
    src.write_text("x = 1\n")
    monkeypatch.setattr(dc, "_fingerprint_sources", lambda: [str(src)])
    world["passf"].write_text(json.dumps(
        {"ts": time.time() + 5, "sf_dir": "sfX", "n_ok": 4,
         "src": dc._source_digests()}
    ))
    src.write_text("x = 2\n")  # content changes...
    past = time.time() - 3600
    os.utime(src, (past, past))  # ...but mtime is laundered backwards
    with pytest.raises(SystemExit) as e:
        dc.evidence_rebase()
    assert "source CONTENT differs" in str(e.value)


def test_rebase_rewrites_and_stamps_audit_trail(world, tmp_path, monkeypatch, capsys):
    src = tmp_path / "old.py"
    src.write_text("x = 1\n")
    monkeypatch.setattr(dc, "_fingerprint_sources", lambda: [str(src)])
    world["passf"].write_text(json.dumps(
        {"ts": time.time() + 5, "sf_dir": "sfX", "n_ok": 4,
         "src": dc._source_digests()}
    ))
    cur = dict(world["fps"])
    cur["q3"] = "NEWFP"
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (world["names"], cur))
    dc.evidence_rebase()
    rec = _recorded(world)
    assert rec["q3"]["fp"] == "NEWFP" and rec["q3"]["round"] == 1  # round preserved
    assert rec["_rebase"]["pass_sf_dir"] == "sfX"


def test_evidence_update_reverts_displaced_stamp(world, monkeypatch):
    """A mid-round window shift must not leave a query stamped with a
    round whose driver row it will never receive: q1 is stamped round 2
    while in-window, then displaced by a new query before the driver
    runs — the second --evidence-update 2 reverts q1 to its true latest
    round (1), recorded in prev_round at stamp time."""
    dc.evidence_update(2)  # window = q1, q2; both stamped round 2
    rec = _recorded(world)
    assert rec["q1"]["round"] == 2 and rec["q1"]["prev_round"] == 1
    # a new query q0 enters at the head, displacing q2 from the window
    names = ["q0", "q1", "q2", "q3"]
    cur = dict(world["fps"])
    cur["q0"] = "fp_q0"
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (names, dict(cur)))
    dc.evidence_update(2)
    rec = _recorded(world)
    assert rec["q0"]["round"] == 2
    assert rec["q1"]["round"] == 2 and rec["q1"]["prev_round"] == 1
    assert rec["q2"]["round"] == 1  # reverted: no r2 row will exist for it
    assert rec["q2"]["fp"] == "fp_q2"  # the fp backing the r1 row, restored
    assert "prev_round" not in rec["q2"] and "prev_fp" not in rec["q2"]
    assert rec["q3"]["round"] == 1  # untouched


def test_displaced_stamp_cannot_launder_a_code_change(world, monkeypatch, capsys):
    """The laundering scenario the prev_fp field exists for: q2's code
    changes mid-round, it is stamped round 2 while in-window (fp = NEW
    code), then a new query displaces it before the driver runs. The
    revert must restore the OLD fp its true latest (r1) row was computed
    against — so --staleness correctly demands a window slot for q2 —
    rather than leave the stamped new-code fp attached to the r1 row."""
    cur = dict(world["fps"])
    cur["q2"] = "CHANGED"  # q2's code moved since its r1 row
    monkeypatch.setattr(dc, "_current_fingerprints",
                        lambda: (world["names"], dict(cur)))
    dc.evidence_update(2)  # window = q1, q2: stamped with the NEW fp
    rec = _recorded(world)
    assert rec["q2"]["fp"] == "CHANGED" and rec["q2"]["prev_fp"] == "fp_q2"
    # a new query enters at the head, displacing q2 before the driver runs
    names = ["q0", "q1", "q2", "q3"]
    cur["q0"] = "fp_q0"
    monkeypatch.setattr(dc, "_current_fingerprints",
                        lambda: (names, dict(cur)))
    dc.evidence_update(2)
    rec = _recorded(world)
    assert rec["q2"]["round"] == 1 and rec["q2"]["fp"] == "fp_q2"
    # and staleness now flags q2: its code changed but its only row is r1
    with pytest.raises(SystemExit) as e:
        dc.staleness()
    assert e.value.code == 1
    assert "q2" in capsys.readouterr().out


def test_displaced_pre_prev_fp_stamp_falls_back_to_ground_truth(
        world, monkeypatch, tmp_path, capsys):
    """Transitional path: an entry stamped by the pre-prev_fp tool
    (prev_round recorded, prev_fp not) that gets displaced cannot prove
    which code its old row was computed against — the revert re-stamps
    the round from the CORRECTNESS ground truth and sets a never-matching
    sentinel fp, so --staleness demands re-verification instead of
    trusting the laundered stamp."""
    rec = _recorded(world)
    rec["q2"] = {"fp": "fp_q2", "round": 2, "prev_round": 1}  # legacy stamp
    world["ev"].write_text(json.dumps(rec))
    names = ["q0", "q1", "q2", "q3"]
    cur = dict(world["fps"])
    cur["q0"] = "fp_q0"
    monkeypatch.setattr(dc, "_current_fingerprints",
                        lambda: (names, dict(cur)))
    root = tmp_path / "fakeroot"
    root.mkdir()
    (root / "CORRECTNESS_r1.json").write_text(json.dumps(
        {"q2": {"hash_match": True}}))
    real_glob = dc._latest_green_round
    monkeypatch.setattr(
        dc, "_latest_green_round",
        lambda name, before: 1 if name == "q2" else real_glob(name, before))
    dc.evidence_update(2)
    rec = _recorded(world)
    assert rec["q2"]["round"] == 1
    assert rec["q2"]["fp"].startswith("displaced:unverified")
    with pytest.raises(SystemExit) as e:
        dc.staleness()
    assert e.value.code == 1  # q2 must re-enter the window


def test_must_rotate_rejects_unknown_query(world):
    with pytest.raises(SystemExit) as e:
        dc.must_rotate(5, ["nope"])
    assert "nope" in str(e.value)


def test_must_rotate_then_update_round_trip(world, monkeypatch):
    dc.must_rotate(2, ["q4"])
    assert _recorded(world)["q4"]["must_rotate"] == 2
    with pytest.raises(SystemExit):
        dc.evidence_update(2)  # q4 outside window -> refused
    # rotate q4 into the window and the update goes through
    names = ["q4", "q1", "q2", "q3"]
    cur = dict(world["fps"])
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (names, dict(cur)))
    dc.evidence_update(2)
    rec = _recorded(world)
    assert rec["q4"]["round"] == 2
    assert "must_rotate" not in rec["q4"]  # promise cleared by the fresh row


def test_window_budget_demand_arithmetic(world):
    """Pure-function check: pinned + changed + new + due promises, in
    registry order, with over/outside computed against the window."""
    names = ["q1", "q2", "q3", "q4", "q5"]
    cur = {n: f"fp_{n}" for n in names}
    recorded = {
        "q1": {"fp": "fp_q1", "round": 1},
        "q2": {"fp": "STALE", "round": 1},              # changed
        "q3": {"fp": "fp_q3", "round": 1, "must_rotate": 2},  # due
        "q4": {"fp": "fp_q4", "round": 1},              # clean
        # q5 missing -> new
    }
    old_pinned = dc.PINNED
    dc.PINNED = ["q1"]
    try:
        demand, over, outside = dc.window_budget_demand(names, cur, recorded, 2)
    finally:
        dc.PINNED = old_pinned
    assert demand == ["q1", "q2", "q3", "q5"]  # registry order, q4 free
    assert over == 2  # 4 mandatory > 2-slot window
    assert outside == ["q3", "q5"]  # q3/q5 sit past the first 2 entries
    # a future-round promise is NOT yet due
    recorded["q3"]["must_rotate"] = 9
    dc.PINNED = ["q1"]
    try:
        demand2, _, _ = dc.window_budget_demand(names, cur, recorded, 2)
    finally:
        dc.PINNED = old_pinned
    assert "q3" not in demand2


def test_window_budget_cli_refuses_over_budget(world, monkeypatch, capsys):
    """The CLI gate exits nonzero with the slot arithmetic when the
    mandatory set exceeds the window (the round-6 process failure this
    gate exists to prevent)."""
    names = ["q1", "q2", "q3", "q4"]
    cur = {n: "NEWFP" for n in names}  # every query changed
    monkeypatch.setattr(dc, "_current_fingerprints", lambda: (names, cur))
    monkeypatch.setattr(dc, "PINNED", ["q1"])
    with pytest.raises(SystemExit) as e:
        dc.window_budget(2)
    assert "OVER BUDGET by 2" in str(e.value)


def test_window_budget_cli_flags_mandatory_query_outside_window(world, monkeypatch):
    """Demand fits numerically but a changed query is ordered past the
    window boundary -> the gate names it and fails."""
    cur = dict(world["fps"])
    cur["q3"] = "CHANGED"  # q3 is outside the 2-entry window
    monkeypatch.setattr(
        dc, "_current_fingerprints", lambda: (world["names"], cur)
    )
    monkeypatch.setattr(dc, "PINNED", [])
    with pytest.raises(SystemExit) as e:
        dc.window_budget(2)
    assert "WINDOW ORDER BROKEN" in str(e.value) and "q3" in str(e.value)


def test_window_budget_cli_green_path(world, monkeypatch, capsys):
    """Everything recorded and unchanged, flagship in slot 1 -> ok."""
    monkeypatch.setattr(dc, "PINNED", ["q1"])
    dc.window_budget(2)
    out = capsys.readouterr().out
    assert "window budget ok" in out
    assert "demand 1 of 2 slots" in out
