"""Unit tests for the dryrun_multichip orchestrator (driver contract).

The orchestration layer is what protects the round's multi-chip artifact
from the XLA CPU rendezvous-watchdog flake (round-4 lesson): stages run
in their own subprocesses, results print as they land, and the known
abort fingerprint is retried.  These tests drive the parent loop with a
mocked subprocess so the retry/record/summary machinery is pinned without
minutes of real mesh compute (the real stages run in
tests/test_graft_entry imports and the driver itself)."""

import subprocess
import sys
import types

import pytest

sys.path.insert(0, ".")
import __graft_entry__ as ge  # noqa: E402


def test_classify_failure_rendezvous():
    flaky, retryable = ge._classify_failure(134, "")
    assert flaky and retryable
    flaky, retryable = ge._classify_failure(
        1, "F0820 rendezvous.cc:127 Termination timeout for "
           "`collective permute` of 40 seconds exceeded")
    assert flaky and retryable


def test_classify_failure_timeout_retryable_but_not_flaky():
    flaky, retryable = ge._classify_failure(-1, "[stage timed out]")
    assert not flaky and retryable


def test_classify_failure_hard():
    flaky, retryable = ge._classify_failure(1, "AssertionError: drifted")
    assert not flaky and not retryable


def test_classify_failure_warn_text_is_not_flaky():
    """The 20s WARN ('may be stuck') often precedes a DETERMINISTIC
    assertion failure on a slow host; only the abort form / SIGABRT may
    be classified as the watchdog flake."""
    flaky, retryable = ge._classify_failure(
        1, "E0820 rendezvous.cc:100 This thread has been waiting for "
           "`collective permute` for 20 seconds and may be stuck\n"
           "AssertionError: real-shape CP forward drifted: max|д|=0.5")
    assert not flaky and not retryable


def test_decode_timeout_output_bytes():
    # TimeoutExpired carries bytes even under text=True (CPython POSIX)
    assert ge._decode(b"dryrun: tp ok\n") == "dryrun: tp ok\n"
    assert ge._decode(None) == ""
    assert ge._decode("already str") == "already str"
    assert "�" in ge._decode(b"\xff\xfe bad utf8")


def test_selected_stages_default_and_subset(monkeypatch):
    assert ge._selected_stages() == list(ge._STAGES)
    monkeypatch.setenv("FGDM_DRYRUN_STAGES", "real_cp, real_tp")
    assert ge._selected_stages() == ["real_cp", "real_tp"]
    monkeypatch.setenv("FGDM_DRYRUN_STAGES", "nope")
    with pytest.raises(AssertionError):
        ge._selected_stages()


def _fake_run(script):
    """subprocess.run replacement driven by a per-stage list of
    (returncode, stdout, stderr) tuples."""
    calls = []

    def run(cmd, **kw):
        stage = cmd[-1].split("'")[1]  # _run_stage('<name>', n)
        rc, out, err = script[stage].pop(0)
        calls.append(stage)
        return types.SimpleNamespace(returncode=rc, stdout=out, stderr=err)

    return run, calls


def test_retry_on_rendezvous_then_green(monkeypatch, capsys):
    monkeypatch.setenv("FGDM_DRYRUN_STAGES", "train,real_cp")
    script = {
        "train": [(0, "dryrun_multichip(8): ok, loss=1.0\n", "")],
        "real_cp": [
            (134, "", "rendezvous.cc:127 Termination timeout exceeded"),
            (0, "dryrun_real_shape(8): cp ok\n", ""),
        ],
    }
    run, calls = _fake_run(script)
    monkeypatch.setattr(subprocess, "run", run)
    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert calls == ["train", "real_cp", "real_cp"]
    assert "[stage real_cp] ok" in out and "(attempt 2)" in out
    assert "ALL 2 STAGES OK" in out
    # the passed stage's own result lines are re-emitted by the parent
    assert "dryrun_real_shape(8): cp ok" in out


def test_hard_failure_no_retry_keeps_other_records(monkeypatch, capsys):
    monkeypatch.setenv("FGDM_DRYRUN_STAGES", "train,real_cp")
    script = {
        "train": [(0, "dryrun_multichip(8): ok, loss=1.0\n", "")],
        "real_cp": [(1, "", "AssertionError: real-shape CP forward drifted")],
    }
    run, calls = _fake_run(script)
    monkeypatch.setattr(subprocess, "run", run)
    with pytest.raises(RuntimeError, match="real_cp"):
        ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert calls == ["train", "real_cp"]  # hard failures don't retry
    # the record of the stage that passed survives the late failure
    assert "[stage train] ok" in out
    assert "train=ok" in out and "real_cp=failed(rc=1)" in out


def test_exhausted_retries_fail(monkeypatch):
    monkeypatch.setenv("FGDM_DRYRUN_STAGES", "train")
    monkeypatch.setenv("FGDM_DRYRUN_ATTEMPTS", "2")
    script = {"train": [(134, "", "rendezvous"), (134, "", "rendezvous")]}
    run, calls = _fake_run(script)
    monkeypatch.setattr(subprocess, "run", run)
    monkeypatch.setattr(ge.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError):
        ge.dryrun_multichip(8)
    assert calls == ["train", "train"]
