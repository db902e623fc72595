"""bench.py stdout-protocol regression tests (r7 verdict, What's wrong #1).

The driver persists only the LAST 2,000 characters of bench stdout and
json-parses what it finds there. r5's 46-query headline line fit; r7's
69-query line did not, so two healthy rounds produced `parsed: null`.
These tests pin the fix: the final stdout line is a compact summary
that stays parseable no matter how many headline queries exist.
"""

import json

import bench


def _fake_full(n_queries: int) -> dict:
    return {
        "metric": "headline_total",
        "value": 80.1,
        "unit": "sec",
        "queries": {f"query_with_a_long_name_{i:03d}": 0.01 * i for i in range(n_queries)},
        "builds": {"mock_index_topk": {"build_sec": 3.4, "index_rows": 14000, "rows_per_sec": 4117.6}},
        "sf": 0.1,
    }


def test_compact_line_fits_tail_window_at_current_headline_size():
    line = bench.compact_line(_fake_full(len(bench.HEADLINE)))
    assert len(line) <= 500


def test_compact_line_fits_even_at_10x_query_count():
    # The growth failure mode: the line must NOT scale with n_queries.
    line = bench.compact_line(_fake_full(690))
    assert len(line) <= 500


def test_compact_line_parses_and_keeps_envelope():
    full = _fake_full(69)
    parsed = json.loads(bench.compact_line(full))
    assert parsed["metric"] == "headline_total"
    assert parsed["value"] == 80.1
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 69
    # queries trimmed to the three slowest, values preserved
    assert len(parsed["queries"]) == 3
    assert parsed["queries"] == dict(
        sorted(full["queries"].items(), key=lambda kv: -kv[1])[:3]
    )


def test_compact_line_is_last_json_object_in_simulated_tail():
    # Simulate the driver: full line first, compact line last, keep the
    # final 2,000 chars, parse the last line found there.
    full = _fake_full(len(bench.HEADLINE))
    stdout = json.dumps(full) + "\n" + bench.compact_line(full) + "\n"
    tail = stdout[-2000:]
    last_line = tail.strip().rsplit("\n", 1)[-1]
    parsed = json.loads(last_line)
    assert parsed["metric"] == "headline_total"


def test_machine_state_helpers_produce_sane_fields():
    """VERDICT r9 #1: the self-certification fields must be readable on
    this box (Linux) and numerically sane, so bench_full.json can
    prove/disprove an ambient-load-inflated pass by itself."""
    load = bench._loadavg()
    assert load is not None and len(load) == 3
    assert all(x >= 0.0 for x in load)
    busy = bench._sys_busy_sec()
    assert busy is not None and busy > 0
    import os

    me = os.getpid()
    cpu = bench._proc_cpu_sec(me)
    assert cpu is not None and cpu >= 0
    assert bench._proc_cpu_sec(None) is None


def test_cpu_delta_composes_and_degrades():
    # missing readings -> None (off-Linux degradation)
    assert bench._cpu_delta(None, None, None, 0.0) is None
    # real deltas: other_cpu_sec = clamp(sys - jvm - py, >= 0)
    import os

    me = os.getpid()
    jvm0, sys0, py0 = bench._proc_cpu_sec(me), bench._sys_busy_sec(), bench._py_cpu_sec()
    # burn a little CPU so the deltas are visible
    sum(i * i for i in range(400_000))
    out = bench._cpu_delta(me, jvm0, sys0, py0)
    assert out is not None
    assert set(out) == {"jvm_cpu_sec", "py_cpu_sec", "sys_busy_sec", "other_cpu_sec"}
    assert out["other_cpu_sec"] >= 0.0


def test_compact_line_carries_cleanliness_fields():
    """The driver records only the compact line — it must carry the
    pass-level cleanliness evidence (VERDICT r9 #1 applied to the
    DRIVER's own re-run, the artifact that actually diverged)."""
    full = _fake_full(81)
    full["env"] = {
        "loadavg_start": [0.42, 1.0, 2.0],
        "jvm_cpu_sec_total": 650.0,
        "py_cpu_sec_total": 20.0,
        "sys_busy_sec_total": 775.5,
    }
    parsed = json.loads(bench.compact_line(full))
    assert parsed["load1_start"] == 0.42
    assert parsed["other_cpu"] == 105.5
    assert len(bench.compact_line(full)) <= 500
    # off-Linux degradation: fields present, null, line still parses
    degraded = json.loads(bench.compact_line(_fake_full(81)))
    assert degraded["other_cpu"] is None and degraded["load1_start"] is None


def test_cleanliness_stamp_thresholds():
    """VERDICT r11 #2: a pass that fails its own invariants must be
    machine-stamped dirty — the r11 official artifact (other_cpu
    145.5, load1 6.78) could never again be a silent official
    number."""
    clean_env = {
        "loadavg_start": [0.5, 1.0, 2.0],
        "jvm_cpu_sec_total": 650.0,
        "py_cpu_sec_total": 20.0,
        # ~the recalibrated 86-entry worker-daemon baseline (r12)
        "sys_busy_sec_total": 650.0 + 20.0 + 146.4,
    }
    ok, reasons = bench._cleanliness(clean_env)
    assert ok and reasons == []
    # the dirty-pass signature: both invariants violated (other_cpu
    # scaled past the recalibrated 161 threshold)
    dirty_env = dict(clean_env, loadavg_start=[6.78, 5.0, 4.0])
    dirty_env["sys_busy_sec_total"] = 650.0 + 20.0 + 238.3
    ok, reasons = bench._cleanliness(dirty_env)
    assert not ok and len(reasons) == 2
    assert any("load1_start" in r for r in reasons)
    assert any("other_cpu" in r for r in reasons)
    # r13: hypervisor steal is judged SEPARATELY — a pass whose
    # other_cpu only exceeds the worker-daemon cap because the host
    # stole CPU is clean on the foreign-process axis (the r13 passes
    # read other_cpu 160-165 on idle starts purely via 5-11 s steal;
    # the gate is 10 since r14 — ADVICE r13: 19.7 CPU-s of steal
    # correlated with a ~13% inflated wall and stamped clean under
    # the old 30)...
    steal_env = dict(
        clean_env,
        sys_busy_sec_total=650.0 + 20.0 + 146.4 + 8.0,
        steal_sec_total=8.0,
    )
    ok, reasons = bench._cleanliness(steal_env)
    assert ok and reasons == []
    # ...but steal past the r14 gate is its own dirty reason (wall is
    # suspect at every observed level above it), even when other_cpu
    # net of steal stays under the worker-daemon cap
    heavy = dict(
        clean_env,
        sys_busy_sec_total=650.0 + 20.0 + 100.0 + 20.0,
        steal_sec_total=20.0,
    )
    ok, reasons = bench._cleanliness(heavy)
    assert not ok and reasons == [r for r in reasons if "steal" in r]
    # single-invariant violations flag too
    ok, _ = bench._cleanliness(dict(clean_env, loadavg_start=[2.5, 0, 0]))
    assert not ok
    # degraded env (no /proc fields): load check still applies, the
    # other_cpu check is skipped rather than crashing
    ok, reasons = bench._cleanliness({"loadavg_start": [0.1, 0, 0]})
    assert ok and reasons == []
    # the stamp rides the compact line
    full = _fake_full(81)
    full["env"] = dirty_env
    full["clean"], full["dirty_reasons"] = bench._cleanliness(full["env"])
    parsed = json.loads(bench.compact_line(full))
    assert parsed["clean"] is False
    assert len(bench.compact_line(full)) <= 500


def test_settle_returns_immediately_on_quiet_box(monkeypatch):
    """VERDICT r12 #4: a quiet start (load1 under the clean gate) must
    not wait at all; a never-settling box times out and the timeout
    lands in dirty_reasons via _cleanliness."""
    import bench

    monkeypatch.setattr(bench, "_loadavg", lambda: [0.1, 0.2, 0.3])
    out = bench._settle()
    assert out == {"settle_wait_sec": 0.0, "settle_timed_out": False}
    # a box that never settles: shrink the cap so the test is instant
    monkeypatch.setattr(bench, "_loadavg", lambda: [9.9, 9.9, 9.9])
    monkeypatch.setattr(bench, "SETTLE_TIMEOUT_SEC", 0.0)
    out = bench._settle()
    assert out["settle_timed_out"] is True
    clean, reasons = bench._cleanliness({**out, "loadavg_start": [0.1]})
    assert not clean and any("settle_timeout" in r for r in reasons)
    # off-Linux degrade: no loadavg reader -> proceed immediately
    monkeypatch.setattr(bench, "_loadavg", lambda: None)
    monkeypatch.setattr(bench, "SETTLE_TIMEOUT_SEC", 300.0)
    assert bench._settle()["settle_timed_out"] is False
