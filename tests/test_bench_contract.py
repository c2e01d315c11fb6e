"""Pin the bench's stdout line under the driver's capture window.

Round 5's BENCH_r05.json landed as ``parsed: null``: the stdout JSON
(109 queries + per-query [min, max] detail) outgrew the driver's
finite capture and was tail-truncated into unparseable bytes — the 2x
acceptance gate read nothing that round.  Round 6 assumed a 4 KiB
window; the evidence says the REAL window is ~2000 bytes (both
BENCH_r05.json and BENCH_r06.json captured a tail of exactly 2000
characters; the round-6 line was 3743 bytes) — so the gate stayed
blind a second round.  bench.py now prints a compact final line whose
``queries`` map is a PER-FAMILY rollup (O(families) keys, not
O(queries)) and writes the flat per-query detail to
BENCH_DETAIL.json.  This test rebuilds a WORST-CASE payload from the
live query-name lists and asserts it parses and fits
STDOUT_BYTE_BUDGET = 1900, so a future family addition that would
re-truncate the capture fails here, not in the driver.
"""

import json

import bench


def _all_names() -> list[str]:
    names = list(bench.BENCH_QUERIES) + list(bench.EXTRA_BENCH_NAMES)
    assert len(names) == len(set(names)), "duplicate bench query name"
    return names


def _worst_case_payload() -> str:
    # Worst realistic per-query width: hundreds of seconds, 3 decimals
    # (family sums then reach 5 digits before the point).
    timings = {name: 999.999 for name in _all_names()}
    calibration = {"start": 999.999, "mid": 999.999, "end": 999.999}
    return bench.format_stdout_payload(
        timings, sf=0.1, calibration=calibration, spread=0.9999,
        unstable=True, degraded=True,
    )


def test_stdout_line_fits_driver_capture():
    line = _worst_case_payload()
    assert bench.STDOUT_BYTE_BUDGET <= 1900, (
        "the driver's measured capture window is ~2000 bytes "
        "(BENCH_r05/BENCH_r06 tails were exactly 2000 chars); the "
        "budget must not creep back up"
    )
    assert len(line.encode("utf-8")) <= bench.STDOUT_BYTE_BUDGET, (
        f"bench stdout line is {len(line)} bytes > "
        f"{bench.STDOUT_BYTE_BUDGET}; collapse more families or move "
        "detail to BENCH_DETAIL.json"
    )
    assert "\n" not in line  # ONE line — the driver parses the last line


def test_stdout_line_parses_with_driver_contract_keys():
    payload = json.loads(_worst_case_payload())
    assert payload["metric"] == "total_wall_sec"
    assert payload["unit"] == "sec"
    assert isinstance(payload["value"], float)
    names = _all_names()
    # queries is the per-family rollup: every family present, sums
    # consistent with the total, and FAR fewer keys than queries.
    expected_families = {bench.bench_family(n) for n in names}
    assert set(payload["queries"]) == expected_families
    assert len(payload["queries"]) < len(names)
    assert payload["n_queries"] == len(names)
    assert abs(sum(payload["queries"].values()) - payload["value"]) < (
        0.01 * len(payload["queries"]) + 0.01
    )
    assert isinstance(payload["calibration_spread"], float)
    assert payload["env_unstable"] is True
    assert payload["env_degraded"] is True
    # Detail must NOT ride stdout — that is what truncated r5: neither
    # the [min, max] map nor the raw calibration probes (both live in
    # BENCH_DETAIL.json, as does the flat per-query map).
    assert "queries_minmax" not in payload
    assert "calibration" not in payload


def test_family_rollup_shape():
    # TPC-H shapes collapse to one family; everything else groups by
    # first token.  Guards against a rename silently exploding the
    # rollup key count past the byte budget.
    assert bench.bench_family("q1_pricing_summary") == "tpch"
    assert bench.bench_family("q21_suppliers_kept_waiting") == "tpch"
    assert bench.bench_family("dedup_minhash_lsh") == "dedup"
    assert bench.bench_family("lda_train_5it_join") == "lda"
    families = {bench.bench_family(n) for n in _all_names()}
    assert len(families) <= 40, (
        f"{len(families)} families — the stdout rollup is sized for "
        "O(30) keys; merge related prefixes before adding more"
    )


def test_registry_bench_coverage_is_deliberate():
    """Every registry query has a bench row OR an explicit, named
    BENCH_EXEMPT entry with a reason — the coverage gap can only be
    deliberate.  Exemptions must be real registry names (no stale
    entries) and must not ALSO be benched (no contradictions)."""
    import __spark_entry__ as entrymod

    registry = set(entrymod.all_queries())
    benched = set(bench.BENCH_QUERIES) | set(bench.EXTRA_BENCH_NAMES)
    exempt = set(bench.BENCH_EXEMPT)

    stale = exempt - registry
    assert not stale, f"BENCH_EXEMPT names not in the registry: {sorted(stale)}"
    contradicted = exempt & benched
    assert not contradicted, (
        f"BENCH_EXEMPT names that ARE benched: {sorted(contradicted)}"
    )
    uncovered = registry - benched - exempt
    assert not uncovered, (
        f"registry queries with neither a bench row nor a named "
        f"BENCH_EXEMPT reason: {sorted(uncovered)}"
    )
    for name, reason in bench.BENCH_EXEMPT.items():
        assert isinstance(reason, str) and len(reason) > 20, (
            f"BENCH_EXEMPT[{name}] needs a real reason"
        )


def test_degraded_verdict_anchor_logic():
    """The round-10 absolute anchor: a run whose q1 probe MEDIAN
    exceeds 1.5x the best-known stable anchor stamps env_degraded even
    when its intra-run spread is flat (the round-9 failure mode: a
    uniformly level-shifted 'stable' capture); off the anchor's SF the
    verdict is None, and a single outlier probe does NOT flip it."""
    a = bench.Q1_ANCHOR_SEC
    # flat but uniformly level-shifted: spread ~0, median 2x anchor
    shifted = {"start": 2.0 * a, "mid": 2.0 * a, "end": 2.0 * a}
    assert bench.degraded_verdict(shifted, sf=0.1) is True
    # healthy run at the anchor level
    healthy = {"start": 1.0 * a, "mid": 1.1 * a, "end": 0.95 * a}
    assert bench.degraded_verdict(healthy, sf=0.1) is False
    # one outlier probe (a transient window the spread stamp already
    # catches) must not flip the MEDIAN-based absolute verdict
    outlier = {"start": 1.0 * a, "mid": 6.0 * a, "end": 1.05 * a}
    assert bench.degraded_verdict(outlier, sf=0.1) is False
    # exactly at the threshold: not degraded (strict >)
    edge = {"start": 1.5 * a, "mid": 1.5 * a, "end": 1.5 * a}
    assert bench.degraded_verdict(edge, sf=0.1) is False
    # the anchor is an absolute sf0.1 wall time — no verdict elsewhere
    assert bench.degraded_verdict(shifted, sf=0.01) is None
    assert bench.degraded_verdict({}, sf=0.1) is None
    # even-count probe lists take the midpoint average
    four = {"a": 1.0 * a, "b": 1.4 * a, "c": 1.8 * a, "d": 10.0 * a}
    assert bench.degraded_verdict(four, sf=0.1) is True


def test_stdout_payload_carries_null_degraded_off_anchor_sf():
    timings = {"q1_pricing_summary": 1.0}
    line = bench.format_stdout_payload(
        timings, sf=0.01, calibration={"start": 9.9}, spread=0.0,
        unstable=False, degraded=bench.degraded_verdict({"start": 9.9}, 0.01),
    )
    assert json.loads(line)["env_degraded"] is None


def test_unstable_verdict_tolerates_one_dense_probe_outlier():
    """Dense probing (>= 5 probes): ONE elevated probe is a transient
    shorter than an inter-probe stretch — not unstable; TWO elevated
    probes are a sustained window — unstable; with < 5 probes the
    original all-probe rule applies (one spike out of three IS a third
    of the run)."""
    flat = {f"p{i}": 1.1 for i in range(10)}
    assert bench.unstable_verdict(flat) is False
    one_spike = dict(flat, mid=1.9)
    assert bench.unstable_verdict(one_spike) is False
    two_spikes = dict(flat, mid=1.9, end=1.8)
    assert bench.unstable_verdict(two_spikes) is True
    # sustained level change across many probes: unstable
    ramp = {f"p{i}": 1.0 + 0.08 * i for i in range(11)}
    assert bench.unstable_verdict(ramp) is True
    # small probe sets keep the strict round-5 rule
    assert bench.unstable_verdict({"s": 1.0, "m": 1.9, "e": 1.0}) is True
    # tiny-SF absolute floor: 30% relative but 0.09 s absolute — jitter
    assert bench.unstable_verdict(
        {f"p{i}": 0.3 for i in range(9)} | {"m": 0.39}
    ) is False
    assert bench.unstable_verdict({}) is False
