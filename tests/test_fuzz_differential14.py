"""Fuzz wave 14: read_jsonl corrupt-record routing under random
corruption.

Random JSONL files mixing valid objects with corrupted lines
(truncation, trailing garbage, bare text, wrong bracket); the contract
fuzzed: every VALID line's values come back exactly, every corrupt
line lands in the corrupt column verbatim (never silently dropped,
never failing the job), DROPMALFORMED keeps exactly the valid rows,
and the two modes agree on the valid subset.  Derandomized after two
clean randomized sweeps (FUZZ14_RANDOM=1 to re-randomize)."""

from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyjanitor_spark.sources import read_jsonl

pytestmark = pytest.mark.slow  # builder gate: fuzz/property/brute tier

WAVE = settings(
    max_examples=int(os.environ.get("FUZZ14_EXAMPLES", "8")),
    deadline=None,
    derandomize=not os.environ.get("FUZZ14_RANDOM"),
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def jsonl_lines(draw):
    lines = []
    expected_good = []
    n = draw(st.integers(1, 8))
    for i in range(n):
        kind = draw(st.integers(0, 4))
        if kind <= 1:  # valid
            val = draw(st.text(max_size=8).filter(lambda s: "\n" not in s))
            rec = {"id": i, "v": val}
            lines.append(json.dumps(rec))
            expected_good.append((i, val))
        elif kind == 2:  # truncated object
            lines.append('{"id": %d, "v": "oops' % i)
        elif kind == 3:  # bare text
            lines.append("not json at all %d" % i)
        else:  # wrong bracket
            lines.append("[1, 2, 3")
    return lines, expected_good


@WAVE
@given(data=jsonl_lines())
def test_corrupt_routing_exact(spark, data, tmp_path_factory):
    lines, good = data
    d = tmp_path_factory.mktemp("jsonl")
    p = str(d / "part.jsonl")
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")

    out = read_jsonl(spark, p, schema="id long, v string").collect()
    got_good = sorted(
        (r.id, r.v) for r in out if r._corrupt_record is None
    )
    got_bad = sorted(r._corrupt_record for r in out if r._corrupt_record is not None)
    want_bad = sorted(
        ln for ln in lines
        if not _is_valid(ln)
    )
    assert got_good == sorted(good), (got_good, good)
    assert got_bad == want_bad, (got_bad, want_bad)

    dropped = read_jsonl(
        spark, p, schema="id long, v string", corrupt_column=None
    ).collect()
    assert sorted((r.id, r.v) for r in dropped) == sorted(good)


def _is_valid(ln: str) -> bool:
    try:
        obj = json.loads(ln)
    except Exception:
        return False
    return isinstance(obj, dict)


def test_corrupt_only_file(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write("garbage\n{broken\n")
    out = read_jsonl(spark, p, schema="id long, v string").collect()
    assert len(out) == 2
    assert all(r._corrupt_record is not None for r in out)
    # the corrupt column is an ordinary column: count it directly
    from pyspark.sql import functions as F

    n_bad = (
        read_jsonl(spark, p, schema="id long, v string")
        .filter(F.col("_corrupt_record").isNotNull())
        .count()
    )
    assert n_bad == 2
