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
