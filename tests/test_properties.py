"""Property-based tests (hypothesis) — a strength the reference's test suite
lacks (SURVEY.md §5: no randomized testing)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from esop_spark.functions.render import human_bytes, render_table, render_timestamp
from esop_spark.operators.entities import format_entities, parse_entities


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_human_bytes_total_function(n):
    s = human_bytes(n)
    assert s.endswith("B")
    # magnitude monotonicity markers: unit ladder never exceeds E
    assert s[-2] in " kMGTPE" or s[-2].isdigit()


@given(st.integers(min_value=1000, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_human_bytes_value_consistency(n):
    """The rendered mantissa re-scaled by its unit is within rounding
    distance of the true value."""
    s = human_bytes(n)
    num, unit = s.split(" ")
    power = {"kB": 3, "MB": 6, "GB": 9, "TB": 12, "PB": 15, "EB": 18}[unit]
    approx = float(num) * 10**power
    assert abs(approx - n) / n < 0.051  # 1-decimal truncating ladder bound


@given(st.integers(min_value=0, max_value=4 * 10**12))
@settings(max_examples=200, deadline=None)
def test_render_timestamp_parses_back(ms):
    s = render_timestamp(ms)
    from datetime import datetime, timezone

    parsed = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
    assert abs(parsed.timestamp() * 1000 - ms) < 60_000  # minute truncation max


_ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=8,
).filter(lambda s: not s[0].isdigit())


@given(st.lists(_ident, min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_parse_entities_keyspace_roundtrip(keyspaces):
    ks, pairs = parse_entities(",".join(keyspaces))
    assert ks == keyspaces and pairs == []


@given(st.lists(st.tuples(_ident, _ident), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_parse_entities_pairs_roundtrip(items):
    expr = ",".join(f"{a}.{b}" for a, b in items)
    ks, pairs = parse_entities(expr)
    assert ks == [] and pairs == items


@given(st.lists(st.tuples(_ident, _ident), min_size=0, max_size=5), st.lists(_ident, max_size=5))
@settings(max_examples=100, deadline=None)
def test_format_parse_entities_inverse(pairs, keyspaces):
    """format → parse is the identity on either XOR arm."""
    if pairs:
        assert parse_entities(format_entities([], pairs)) == ([], pairs)
    elif keyspaces:
        assert parse_entities(format_entities(keyspaces, [])) == (keyspaces, [])


@given(
    st.lists(
        st.lists(st.text(alphabet="ab c", min_size=0, max_size=6), min_size=1, max_size=4),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=100, deadline=None)
def test_render_table_column_alignment(rows):
    out = render_table(rows)
    lines = out.splitlines()
    assert len(lines) == len(rows)
    # every delimiter column index is consistent: cells padded to max width
    widths = {}
    for r in rows:
        for i, c in enumerate(r):
            widths[i] = max(widths.get(i, 0), len(c))
    for r, line in zip(rows, lines):
        rebuilt = " ".join(c.ljust(widths[i]) for i, c in enumerate(r)).rstrip()
        assert line == rebuilt


@given(
    st.integers(min_value=0, max_value=8),
    st.integers(min_value=1, max_value=4),
    st.sampled_from(["linear", "exponential"]),
)
@settings(max_examples=200, deadline=None)
def test_retry_execution_count_law(fail_times, max_attempts, strategy):
    """Executions = fail_times+1 when retries suffice, else max_attempts+1
    then re-raise (Retrier.java semantics: max_attempts counts failures)."""
    from esop_spark.functions.retry import RetrySpec, with_retries

    calls = {"n": 0}
    sleeps = []

    def fn():
        calls["n"] += 1
        if calls["n"] <= fail_times:
            raise OSError("flaky")
        return "ok"

    spec = RetrySpec(
        interval=1, strategy=strategy, max_attempts=max_attempts, enabled=True
    )
    if fail_times <= max_attempts:
        assert with_retries(fn, spec, sleep=sleeps.append) == "ok"
        assert calls["n"] == fail_times + 1
    else:
        try:
            with_retries(fn, spec, sleep=sleeps.append)
            raise AssertionError("expected OSError")
        except OSError:
            pass
        assert calls["n"] == max_attempts + 1
    if strategy == "exponential":
        assert sleeps == [2**i for i in range(len(sleeps))]
    else:
        assert sleeps == [1] * len(sleeps)


@given(st.binary(max_size=4096), st.text(min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_crypto_roundtrip_identity(data, key):
    from esop_spark.functions import crypto

    assert crypto.roundtrip_bytes(data, key) == data


@given(
    st.lists(
        st.sampled_from(
            [
                "cluster_name: 'x'",
                "auto_bootstrap: true",
                "auto_bootstrap: false",
                "# initial_token:",
                "num_tokens: 16",
                "",
            ]
        ),
        max_size=6,
    )
)
@settings(max_examples=150, deadline=None)
def test_cassandra_yaml_update_is_idempotent(lines):
    """update∘update == update for any composition of stock yaml lines."""
    import os
    import tempfile

    from esop_spark.operators.cassandra_yaml import update_cassandra_yaml

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "cassandra.yaml")
        with open(p, "w") as f:
            f.write("\n".join(lines))
        update_cassandra_yaml(p, ["1", "2"])
        once = open(p).read()
        second = update_cassandra_yaml(p, ["1", "2"])
        assert open(p).read() == once
        assert "appended" not in second.values() and "replaced" not in second.values()
        # invariants of the edited file
        assert "auto_bootstrap: true" not in once
        assert "initial_token: 1,2" in once or "initial_token" in "\n".join(lines)
