"""The driver captures only the last ~2000 bytes of bench.py stdout
and json-parses the final line. Twice (BENCH_r04, BENCH_r06) a
per-query dict on that line outgrew the capture and the round shipped
"parsed": null — no headline number for the 2× perf gate. Pin the
contract: the final line is the fixed-size ``headline()`` object,
comfortably under the capture window even with worst-case float
formatting, and the per-query breakdown lives ONLY in the `# detail:`
line / bench_detail.json."""

import json

import bench


def test_headline_line_is_small_and_parseable():
    # Worst-case float formatting: full-precision repr on every field.
    line = json.dumps(bench.headline(12345.678901234567, 0.1, 9999))
    assert len(line.encode()) < 1500, line
    parsed = json.loads(line)
    assert parsed["metric"] == "total_sec"
    assert parsed["unit"] == "sec"
    assert isinstance(parsed["value"], float)
    assert parsed["n_queries"] == 9999


def test_headline_has_no_per_query_payload():
    h = bench.headline(1.0, 0.1, 90)
    assert "queries" not in h
    assert "runs" not in h
    assert "stages" not in h
    # Every value is a scalar — a dict/list field is how the r4/r6
    # overflow started.
    assert all(not isinstance(v, (dict, list)) for v in h.values())
