"""tools/check_bench.py — the mechanical per-entry bench gate must
itself be trustworthy: pass/fail/missing/group-sum semantics pinned on
synthetic artifacts."""

from __future__ import annotations

import json

from tools.check_bench import load_queries, main


def _write(tmp_path, name, doc):
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def _baseline(tmp_path, entries, groups=()):
    return _write(tmp_path, "base.json", {
        "entries": {k: {"sec": v, "fine_queries": 1} for k, v in entries.items()},
        "shared_cost_groups": [list(g) for g in groups],
    })


def test_within_factor_passes(tmp_path):
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 2.0})
    run = _write(tmp_path, "run.json", {"queries": {"q1": 1.9, "q2": 3.9}})
    assert main([run, base]) == 0


def test_over_factor_fails(tmp_path):
    base = _baseline(tmp_path, {"q1": 1.0})
    run = _write(tmp_path, "run.json", {"queries": {"q1": 3.1}})
    assert main([run, base]) == 1  # over 2x + 1s floor


def test_missing_entry_fails_new_entry_informational(tmp_path):
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 1.0})
    run = _write(tmp_path, "run.json", {"queries": {"q1": 1.0, "q9": 50.0}})
    assert main([run, base]) == 1  # q2 missing; q9 is new (no limit)

    base2 = _baseline(tmp_path, {"q1": 1.0})
    run2 = _write(tmp_path, "run2.json", {"queries": {"q1": 1.0, "q9": 50.0}})
    assert main([run2, base2]) == 0  # only a NEW entry: informational


def test_group_sum_absorbs_cost_migration(tmp_path):
    """The shared-cache scenario: cost moved from q_a to q_b (the
    materialization landed on a different first-toucher). Cell-by-cell
    q_b is 5x its baseline — but the GROUP SUM is flat, so it passes."""
    base = _baseline(
        tmp_path, {"q_a": 10.0, "q_b": 2.0}, groups=[("q_a", "q_b")]
    )
    run = _write(
        tmp_path, "run.json", {"queries": {"q_a": 2.0, "q_b": 10.0}}
    )
    assert main([run, base]) == 0

    # and a genuine group regression still fails
    run2 = _write(
        tmp_path, "run2.json", {"queries": {"q_a": 20.0, "q_b": 10.0}}
    )
    assert main([run2, base]) == 1  # 30 > 2*12 + 1


def test_driver_wrapper_shape_accepted(tmp_path):
    run = _write(tmp_path, "wrapped.json", {
        "rc": 0, "parsed": {"queries": {"q1": 1.0}},
    })
    assert load_queries(run) == {"q1": 1.0}


def test_custom_factor_and_floor(tmp_path):
    base = _baseline(tmp_path, {"q1": 1.0})
    run = _write(tmp_path, "run.json", {"queries": {"q1": 1.4}})
    assert main([run, base, "--factor", "1.5", "--floor", "0"]) == 0
    assert main([run, base, "--factor", "1.3", "--floor", "0"]) == 1
    # the default 1 s floor absorbs sub-second noise flakes
    base2 = _baseline(tmp_path, {"q1": 0.4})
    run2 = _write(tmp_path, "run2.json", {"queries": {"q1": 0.9}})
    assert main([run2, base2]) == 0
    assert main([run2, base2, "--floor", "0"]) == 1


def test_driver_tail_artifact_adjudicated(tmp_path):
    """r7 verdict item 1: the driver's BENCH_rN.json carries the
    per-entry map only inside a truncated stdout-`tail` string. The
    gate must parse it out, not no-op."""
    inner = json.dumps({"metric": "declared_query_suite_sec",
                        "queries": {"q1": 1.2, "q2": 2.4}, "sf": 0.1})
    # driver truncates to the LAST N chars; simulate a cut-off prefix
    tail = ("x" + inner)[-len(inner):] + "\n"
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 2.0})
    run = _write(tmp_path, "run.json",
                 {"n": 8, "rc": 0, "cpus": 32, "sf": 0.1, "tail": tail})
    assert main([run, base]) == 0

    # regression inside the tail still fails
    inner2 = json.dumps({"queries": {"q1": 9.9, "q2": 2.0}})
    run2 = _write(tmp_path, "run2.json", {"rc": 0, "tail": inner2})
    assert main([run2, base]) == 1


def test_real_driver_artifact_shape():
    """The committed round-7 artifact itself must load (the exact file
    the r7 judge found the gate no-op'ing on)."""
    q = load_queries("BENCH_r07.json")
    assert len(q) == 50 and all(isinstance(v, float) for v in q.values())


def test_head_truncated_tail_recovered(tmp_path, capsys):
    """r9 verdict item 1 + r10 ADVICE: at 226 fine queries the
    one-line output outgrew the driver's 2000-char window, so the
    tail starts MID-queries-object. The gate must reconstruct the
    recoverable entries; window-lost baseline entries FAIL by default
    (a query that crashed inside the truncated window must not
    silently pass) and are informational only under --allow-lost."""
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 2.0, "q3": 1.5})
    # q1's cell was cut mid-value; q2/q3 + sf + streaming survive
    run = _write(tmp_path, "run.json", {
        "rc": 0,
        "tail": '1.2, "q2": 2.1, "q3": 1.4}, "sf": 0.1, '
                '"streaming": {"warm": {"rows_per_sec": 20000}}}\n',
    })
    assert main([run, base]) == 1
    out = capsys.readouterr().out
    assert "LOST q1" in out and "--allow-lost" in out
    assert "MISSING" not in out

    # the explicit opt-in restores the informational treatment
    assert main([run, base, "--allow-lost"]) == 0
    out = capsys.readouterr().out
    assert "lost q1: cut off by tail truncation" in out

    # regression inside the recovered portion fails regardless
    run2 = _write(tmp_path, "run2.json", {
        "rc": 0, "tail": '1.2, "q2": 9.9, "q3": 1.4}, "sf": 0.1}\n'})
    assert main([run2, base, "--allow-lost"]) == 1


def test_head_truncated_mid_median_cell_recovers_clean_cells(tmp_path):
    """A tail cut inside a nested median cell must not recover the
    cell's internals ({"min":..,"runs":..}) as query names — the
    splice must advance past the broken cell to the next top-level
    boundary."""
    base = _baseline(tmp_path, {"q2": 2.0})
    run = _write(tmp_path, "run.json", {
        "rc": 0,
        "tail": '1.1, "max": 9.0, "runs": 3}, '
                '"q2": {"sec": 2.1, "min": 2.0, "max": 2.2, "runs": 3}'
                '}, "sf": 0.1}\n',
    })
    from tools.check_bench import load_artifact
    got, _s, notes = load_artifact(run, sidecar=str(tmp_path / "none"))
    assert got == {"q2": 2.1}
    assert "truncated_head" in notes


def test_sidecar_completes_truncated_tail(tmp_path, capsys):
    """When bench.py's complete sidecar is present and fingerprint-
    matches every tail-recovered cell, the gate adjudicates the FULL
    map — nothing lost; a stale sidecar (mismatched values) is
    rejected and the partial recovery is used instead."""
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 2.0})
    run = _write(tmp_path, "run.json", {
        "rc": 0, "tail": '1.2, "q2": 2.1}, "sf": 0.1}\n'})
    side = _write(tmp_path, "side.json", {
        "queries": {"q1": 9.9, "q2": 2.1}, "sf": 0.1})
    # sidecar completes: q1=9.9 is now adjudicated — and FAILS (9.9 > 3)
    assert main([run, base, "--sidecar", side]) == 1
    out = capsys.readouterr().out
    assert "completed from sidecar" in out and "lost" not in out

    side_ok = _write(tmp_path, "side_ok.json", {
        "queries": {"q1": 1.1, "q2": 2.1}, "sf": 0.1})
    assert main([run, base, "--sidecar", side_ok]) == 0

    # stale sidecar: q2 value differs from the tail-recovered cell —
    # rejected, falls back to partial recovery, and the unconfirmed
    # lost entry FAILS (r10 ADVICE) unless --allow-lost
    stale = _write(tmp_path, "stale.json", {
        "queries": {"q1": 0.1, "q2": 7.7}, "sf": 0.1})
    assert main([run, base, "--sidecar", stale]) == 1
    out = capsys.readouterr().out
    assert "LOST q1" in out  # fell back to partial recovery
    assert main([run, base, "--sidecar", stale, "--allow-lost"]) == 0


def test_real_r9_artifact_adjudicates_exit_zero():
    """The exact artifact the r9 judge had to reconstruct by hand:
    BENCH_r09.json's tail starts mid-queries (q01-q07 cut). With no
    sidecar the 7 window-lost entries now FAIL by default (r10
    ADVICE); --allow-lost restores the r9-era adjudication, which
    recovers 43 entries + streaming and exits 0.

    Adjudicated against the FROZEN r11-era baseline fixture: a
    historical artifact paired with the live baseline turns into a
    moving target — the r12 baseline regen raised the warm-graph
    floor past what the r9-era code could reach (9.9k rows/s vs a
    10.7k floor), which is genuine two-rounds-of-speedups progress,
    not a recovery-path regression. The recovery mechanics are what
    this test pins, so the baseline is pinned with it."""
    import os

    assert os.path.exists("BENCH_r09.json")
    base = "tests/data/bench_baseline_r11.json"
    rc = main(["BENCH_r09.json", base, "--sidecar", "/nonexistent"])
    assert rc == 1
    rc = main(["BENCH_r09.json", base,
               "--sidecar", "/nonexistent", "--allow-lost"])
    assert rc == 0


def test_default_sidecar_resolves_beside_artifact(tmp_path, capsys):
    """r10 ADVICE: bench.py writes BENCH_LAST.json next to itself via
    abspath(__file__), so a cwd-relative default silently missed it
    from any other working directory. The default now prefers a
    sidecar in the ARTIFACT's directory; when a truncated tail finds
    no sidecar at all the gate says so."""
    base = _baseline(tmp_path, {"q1": 1.0, "q2": 2.0})
    run = _write(tmp_path, "run.json", {
        "rc": 0, "tail": '1.2, "q2": 2.1}, "sf": 0.1}\n'})
    _write(tmp_path, "BENCH_LAST.json", {
        "queries": {"q1": 1.1, "q2": 2.1}, "sf": 0.1})
    # no --sidecar flag: found beside the artifact, completes the map
    assert main([run, base]) == 0
    out = capsys.readouterr().out
    assert "completed from sidecar" in out

    # artifact in a sidecar-less directory: explicit warning
    sub = tmp_path / "sub"
    sub.mkdir()
    run2 = _write(sub, "run.json", {
        "rc": 0, "tail": '1.2, "q2": 2.1}, "sf": 0.1}\n'})
    rc = main([run2, base, "--sidecar", str(sub / "BENCH_LAST.json")])
    out = capsys.readouterr().out
    assert rc == 1 and "warning: no sidecar file" in out


def test_median_cells_compared_by_sec(tmp_path):
    """--runs N cells ({"sec": median, "min", "max", "runs"}) are
    compared by their median, both run-side and (via baseline sec)
    baseline-side."""
    base = _baseline(tmp_path, {"q1": 1.0})
    run = _write(tmp_path, "run.json", {"queries": {
        "q1": {"sec": 1.8, "min": 1.7, "max": 9.0, "runs": 3}}})
    assert main([run, base]) == 0  # median 1.8 <= 3.0 despite max 9.0
    run2 = _write(tmp_path, "run2.json", {"queries": {
        "q1": {"sec": 3.5, "min": 1.0, "max": 4.0, "runs": 3}}})
    assert main([run2, base]) == 1


def test_noise_aware_limit_uses_committed_spread(tmp_path):
    """r8 verdict item 2: q53_54_cdc read 1.95x its baseline MEDIAN
    with zero code change — but its own committed --runs 3 spread went
    to 23.2 s. The gate bounds on factor * max(median, committed max),
    so a noisy-but-unchanged entry inside its own recorded spread
    passes; a cell without a committed max keeps the median bound."""
    base = _write(tmp_path, "base.json", {
        "entries": {
            # committed spread: median 3.9, max 23.2 (the real cdc cell)
            "cdc": {"sec": 3.9, "min": 3.6, "max": 23.2, "runs": 3,
                    "fine_queries": 7},
            # legacy single-run cell: no max -> median bound only
            "q1": {"sec": 1.0, "fine_queries": 1},
        },
        "shared_cost_groups": [],
    })
    # 7.6 s = the r8 false-alarm reading: 1.95x median, well inside
    # the committed spread -> passes now
    run = _write(tmp_path, "run.json", {"queries": {"cdc": 7.6, "q1": 1.5}})
    assert main([run, base]) == 0
    # but past factor * committed max still fails (real regression)
    run2 = _write(tmp_path, "run2.json", {"queries": {"cdc": 48.0, "q1": 1.0}})
    assert main([run2, base]) == 1
    # and the no-max cell is NOT loosened
    run3 = _write(tmp_path, "run3.json", {"queries": {"cdc": 4.0, "q1": 3.5}})
    assert main([run3, base]) == 1


def _streaming_base(tmp_path, warm=10_000.0, graph=5_000.0):
    return _write(tmp_path, "base.json", {
        "entries": {"q1": {"sec": 1.0, "fine_queries": 1}},
        "shared_cost_groups": [],
        "streaming": {"warm_rows_per_sec": warm, "graph_rows_per_sec": graph},
    })


def _streaming_run(warm_rps, graph_rps, audit=None):
    a = audit or {"rows": 100, "uniq": 100, "span": 100}
    return {
        "queries": {"q1": 1.0},
        "streaming": {
            "warm": {"sec": 1.0, "rows_per_sec": warm_rps, "runs": 3,
                     "audit": dict(a)},
            "graph_pipeline": {
                "rows": 100,
                "warm": {"sec": 1.0, "rows_per_sec": graph_rps, "runs": 3,
                         "audit": dict(a)},
            },
        },
    }


def test_streaming_leg_gated_at_half_baseline(tmp_path):
    """r8 verdict item 1: the streaming leg was the last ungated
    number in the artifact. warm ingest and warm graph rows/s must
    each be >= baseline/factor."""
    base = _streaming_base(tmp_path)
    ok = _write(tmp_path, "ok.json", _streaming_run(9_000, 4_000))
    assert main([ok, base]) == 0  # both above half-baseline
    slow_ingest = _write(
        tmp_path, "s1.json", _streaming_run(4_999, 6_000))
    assert main([slow_ingest, base]) == 1
    slow_graph = _write(
        tmp_path, "s2.json", _streaming_run(12_000, 2_499))
    assert main([slow_graph, base]) == 1


def test_streaming_missing_or_bad_audit_fails(tmp_path):
    base = _streaming_base(tmp_path)
    # baseline commits streaming, run has none -> fail
    run = _write(tmp_path, "r.json", {"queries": {"q1": 1.0}})
    assert main([run, base]) == 1
    # a duplicate-row audit (rows != uniq) fails even at high rate
    bad = _write(tmp_path, "bad.json", _streaming_run(
        20_000, 20_000, audit={"rows": 101, "uniq": 100, "span": 100}))
    assert main([bad, base]) == 1
    # baseline WITHOUT streaming gates nothing
    base2 = _baseline(tmp_path, {"q1": 1.0})
    assert main([run, base2]) == 0


def test_streaming_recovered_from_tail(tmp_path):
    """The driver artifact truncates stdout to a tail: the streaming
    object (at the line's end) must be recovered and gated from there."""
    inner = json.dumps(_streaming_run(4_000, 9_999))
    tail = ("x" * 10 + inner)[-len(inner):]
    base = _streaming_base(tmp_path)
    run = _write(tmp_path, "run.json", {"rc": 0, "tail": tail})
    assert main([run, base]) == 1  # warm 4000 < 10000/2 caught in tail


def test_streaming_floor_uses_committed_min_spread(tmp_path):
    """r10 verdict item 1: a baseline that commits its own warm-run
    spread (warm_min_rows_per_sec) floors the gate on the MIN — the
    throughput mirror of the batch cells' max(median, committed max).
    A baseline without the min keys (pre-r11) floors on the median as
    before."""
    import json as _json

    def _base(name, streaming):
        p = tmp_path / name
        p.write_text(_json.dumps({
            "entries": {"q1": {"sec": 1.0}}, "streaming": streaming}))
        return str(p)

    run = _write(tmp_path, "run.json", {"queries": {"q1": 1.0}, "streaming": {
        "warm": {"rows_per_sec": 9000,
                 "audit": {"rows": 10, "uniq": 10, "span": 10}},
        "graph_pipeline": {"warm": {
            "rows_per_sec": 9000,
            "audit": {"rows": 10, "uniq": 10, "span": 10}}},
    }})
    # median-only baseline: floor 20000/2 = 10000 > 9000 -> FAIL
    assert main([run, _base("b1.json", {
        "warm_rows_per_sec": 20000, "graph_rows_per_sec": 9000})]) == 1
    # spread-aware baseline: floor min(20000, 16000)/2 = 8000 -> ok
    assert main([run, _base("b2.json", {
        "warm_rows_per_sec": 20000, "warm_min_rows_per_sec": 16000,
        "graph_rows_per_sec": 9000, "graph_min_rows_per_sec": 8500,
    })]) == 0
