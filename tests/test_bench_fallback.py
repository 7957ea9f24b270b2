"""bench.py must emit ONE machine-readable stdout line even when no
fresh measurement happened (BENCH_r03.json lesson: rc=3, parsed=null).

These tests exercise the stale-fallback emitter directly — no device,
no measurement: the contract is purely "stdout carries a parseable,
honestly-labeled headline".
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stale_fallback_line_is_parseable(capsys):
    bench = _load_bench()
    bench.emit_stale_fallback("TimeoutError('test diagnostic')")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, "exactly one stdout line"
    line = json.loads(out[0])
    assert line["metric"] == "sagan_church64_train_imgs_per_sec_per_chip"
    assert line["stale"] is True
    assert "test diagnostic" in line["stale_reason"]
    # the committed BENCH_DETAIL.json exists in-repo, so the fallback
    # must carry its headline value and a measurement timestamp
    assert isinstance(line["value"], (int, float)) and line["value"] > 0
    assert line["measured_unix"] is None or line["measured_unix"] > 0
    assert line["unit"] == "imgs/sec"


def test_stale_fallback_without_detail_file(tmp_path, monkeypatch, capsys):
    bench = _load_bench()
    # point the module at an empty directory: no BENCH_DETAIL.json
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    bench.emit_stale_fallback("no detail available")
    line = json.loads(capsys.readouterr().out.strip())
    assert line["stale"] is True
    assert line["value"] is None
    assert "error" in line["detail"]


def test_default_acquisition_ceiling_raised():
    """r04 policy: the default must be well past the 600 s that burned
    r03 (the driver demonstrably allows longer runs)."""
    with open(os.path.join(REPO, "bench.py")) as f:
        src = f.read()
    assert '"2700"' in src and '"600"' not in src.replace(
        "after its self-imposed 600", "")


def test_stale_fallback_with_malformed_headline(tmp_path, monkeypatch,
                                                capsys):
    """A BENCH_DETAIL.json whose headline lacks the expected keys must
    still produce one parseable line (the emitter runs from except
    branches and signal handlers — it can never raise)."""
    bench = _load_bench()
    (tmp_path / "BENCH_DETAIL.json").write_text(
        json.dumps({"headline": {"wrong_key": 1}}))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(tmp_path / "bench.py"))
    bench.emit_stale_fallback("schema drift")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["stale"] is True and line["value"] is None


def test_stale_fallback_sets_headline_flag(tmp_path, monkeypatch, capsys):
    """After the emitter speaks, the SIGTERM guard must see stdout as
    spoken-for — otherwise a signal landing between the print and the
    caller's exit emits a SECOND line on the one-line stdout."""
    bench = _load_bench()
    assert bench._HEADLINE_PRINTED is False
    bench.emit_stale_fallback("any")
    capsys.readouterr()
    assert bench._HEADLINE_PRINTED is True


if __name__ == "__main__":
    sys.exit(os.system(f"python -m pytest {__file__} -q"))


def test_headline_watchdog_fires_stale_line(capsys, monkeypatch):
    """The r04 wedge class: acquisition succeeds, then the first device
    execution blocks forever.  The watchdog must print the labeled
    stale line when the deadline passes with no headline out (os._exit
    is monkeypatched — bench shares the real os module, so the stub
    must be restored — the contract under test is the line)."""
    bench = _load_bench()
    exited = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.append(code))
    t = bench._install_headline_watchdog(0.01)
    t.join(timeout=5)
    assert not t.is_alive()
    line = json.loads(capsys.readouterr().out.strip())
    assert line["stale"] is True
    assert "watchdog" in line["stale_reason"]
    assert exited == [0]


def test_headline_watchdog_disarmed_after_headline(capsys, monkeypatch):
    bench = _load_bench()
    fired = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: fired.append(code))
    bench._HEADLINE_PRINTED = True
    t = bench._install_headline_watchdog(0.01)
    t.join(timeout=5)
    assert capsys.readouterr().out == ""
    assert fired == []
