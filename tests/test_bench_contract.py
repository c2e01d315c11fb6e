"""Pin the bench's stdout line under the driver's capture window.

Round 5's BENCH_r05.json landed as ``parsed: null``: the stdout JSON
(109 queries + per-query [min, max] detail) outgrew the driver's
finite capture and was tail-truncated into unparseable bytes — the 2x
acceptance gate read nothing that round.  bench.py now prints a
compact final line (flat name->min map + calibration stamps) and
writes the detail to BENCH_DETAIL.json.  This test rebuilds a
WORST-CASE payload from the live query-name lists and asserts it
parses and fits STDOUT_BYTE_BUDGET, so a future query addition that
would re-truncate the capture fails here, not in the driver.
"""

import json

import bench


def _worst_case_payload() -> str:
    names = list(bench.BENCH_QUERIES) + list(bench.EXTRA_BENCH_NAMES)
    assert len(names) == len(set(names)), "duplicate bench query name"
    # Worst realistic per-query width: hundreds of seconds, 3 decimals.
    timings = {name: 999.999 for name in names}
    calibration = {"start": 999.999, "mid": 999.999, "end": 999.999}
    return bench.format_stdout_payload(
        timings, sf=0.1, calibration=calibration, spread=0.9999, unstable=True
    )


def test_stdout_line_fits_driver_capture():
    line = _worst_case_payload()
    assert len(line.encode("utf-8")) <= bench.STDOUT_BYTE_BUDGET, (
        f"bench stdout line is {len(line)} bytes > "
        f"{bench.STDOUT_BYTE_BUDGET}; move detail to BENCH_DETAIL.json "
        "or trim query names"
    )
    assert "\n" not in line  # ONE line — the driver parses the last line


def test_stdout_line_parses_with_driver_contract_keys():
    payload = json.loads(_worst_case_payload())
    assert payload["metric"] == "total_wall_sec"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], float)
    assert set(payload["queries"]) == set(
        list(bench.BENCH_QUERIES) + list(bench.EXTRA_BENCH_NAMES)
    )
    assert isinstance(payload["calibration_spread"], float)
    assert payload["env_unstable"] is True
    # Detail must NOT ride stdout — that is what truncated r5: neither
    # the [min, max] map nor the raw calibration probes (both live in
    # BENCH_DETAIL.json; the query map is at the capture budget).
    assert "queries_minmax" not in payload
    assert "calibration" not in payload
