"""The bench's final stdout line must stay under the driver's ~2000-byte
tail capture (round 3 lost its machine-readable metric to an oversized
line — BENCH_r03.json recorded parsed:null)."""

from __future__ import annotations

import json


def _fake_result() -> dict:
    import bench

    return {
        "n_pages": 8_000_000,
        "value": 1.766,
        "sf": 0.1,
        # worst realistic widths: every query at a 4-digit-second time
        "queries": {n: 9999.994 for n in bench.BENCH_QUERIES},
        "pages_per_sec": {str(c): 4_530_011 for c in (2, 8, bench.CPUS)},
        "scaling_efficiency_2_to_8": 0.731,
        "scaling_efficiency_2_to_8_median": 0.755,
        "scaling_efficiency_2_to_8_marginal": 0.811,
        "scaling_efficiency_8_to_%d" % bench.CPUS: 0.372,
        "hw_md5_eff_2_to_8": 0.862,
        "hw_md5_eff_8_to_32": 0.413,
        "salting_speedup_vs_hot_key_no_aqe": 3.12,
        "checksum_parity_all_levels": True,
        "skew_probe_checksum_parity": True,
    }


def test_headline_fits_driver_tail_capture():
    import bench

    line = bench.headline_line(_fake_result(), "BENCH/r99_full.json")
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["value"] == 1.766
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    assert parsed["checksum_parity"] is True


def test_headline_truncates_rather_than_overflowing():
    """Even a pathological queries dict must produce a parseable final
    line: the guard shrinks the dict, re-measuring until it fits."""
    import bench

    r = _fake_result()
    r["queries"] = {f"query_with_a_very_long_name_{i:04d}": 9999.99
                    for i in range(200)}
    line = bench.headline_line(r, "BENCH/r99_full.json")
    assert len(line) < 1900, len(line)
    parsed = json.loads(line)
    assert parsed["queries_truncated"] is True
    assert 0 < len(parsed["queries"]) < 200
    # degenerate extreme: one absurdly long name still yields valid JSON
    r["queries"] = {"q" * 5000: 1.0}
    line = bench.headline_line(r, "BENCH/r99_full.json")
    parsed = json.loads(line)
    assert parsed["queries_truncated"] is True
    assert parsed["queries"] == {}


def test_attempts_row_renders_old_windows_without_hw_2_8():
    """Archived windows recorded before the 2->8 hw probe existed lack
    hw_md5_eff_2_to_8; the attempts table must render them as n/a, not
    crash, and render the value when present."""
    import bench

    old = {
        "value": 2.399,
        "scaling_efficiency_2_to_8": 0.66,
        "scaling_efficiency_2_to_8_median": 0.74,
        "scaling_efficiency_2_to_8_marginal": 0.725,
        "hw_md5_eff_8_to_32": 0.462,
    }
    new = dict(old, hw_md5_eff_2_to_8=0.677)
    row_old = (
        f"| x | {old['value']} | {old['scaling_efficiency_2_to_8']} | "
        f"{old['scaling_efficiency_2_to_8_median']} | "
        f"{old['scaling_efficiency_2_to_8_marginal']} | "
        f"{old.get('hw_md5_eff_2_to_8', 'n/a')} | "
        f"{old['hw_md5_eff_8_to_32']} |"
    )
    assert "n/a" in row_old
    # the real renderer: current-run path exercises the same f-string
    sec = bench._attempts_section(new)
    # with archives present on disk the section must include a header
    # with eight columns and never raise on pre-probe-era files
    if sec:
        header = [l for l in sec.splitlines() if l.startswith("| attempt")][0]
        assert header.count("|") == 9  # 8 columns share 9 pipe separators


def test_plan_normalization_strips_run_dependent_ids():
    """The plan fingerprint must not vary with expression ids, plan ids,
    RDD ids or node ordinals — the run-dependent tokens observed in real
    formatted explains — while still distinguishing actual plan changes
    (a different join strategy)."""
    import bench

    a = """(1) BroadcastHashJoin [plan_id=33]
Arguments: [cell#12L, url#13], MapPartitionsRDD[6] at applySchemaToPythonRDD
(2) Exchange hashpartitioning(cell#12L, 64), [id=#45]"""
    b = """(7) BroadcastHashJoin [plan_id=73]
Arguments: [cell#98L, url#99], MapPartitionsRDD[18] at applySchemaToPythonRDD
(9) Exchange hashpartitioning(cell#98L, 64), [id=#88]"""
    c = a.replace("BroadcastHashJoin", "SortMergeJoin")
    assert bench._normalize_plan(a) == bench._normalize_plan(b)
    assert bench._normalize_plan(a) != bench._normalize_plan(c)


def test_plan_normalization_strips_reflection_callsite():
    """JDK reflection inflation flips the createDataFrame RDD callsite
    from NativeMethodAccessorImpl.java:0 to <unknown>:0 partway through
    a process (~15 reflective calls) — the observed cause of the
    r5_attempt4 vs r5_attempt5/6 fingerprint split on an identical
    plan. Both callsite forms must normalize identically."""
    import bench

    a = ("Arguments: [cell#12L], MapPartitionsRDD[6] at "
         "applySchemaToPythonRDD at NativeMethodAccessorImpl.java:0, "
         "ExistingRDD, UnknownPartitioning(0)")
    b = ("Arguments: [cell#98L], MapPartitionsRDD[18] at "
         "applySchemaToPythonRDD at <unknown>:0, "
         "ExistingRDD, UnknownPartitioning(0)")
    assert bench._normalize_plan(a) == bench._normalize_plan(b)
