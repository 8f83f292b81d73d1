"""Per-file transfer retries (Retrier.java:60-79, RetrySpec.java:17-55)."""

import pytest

from esop_spark.functions.retry import RetrySpec, with_retries


class Flaky:
    def __init__(self, fail_times, exc=OSError):
        self.left = fail_times
        self.exc = exc
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.left > 0:
            self.left -= 1
            raise self.exc("transient")
        return "ok"


def test_disabled_spec_runs_once_and_raises():
    f = Flaky(1)
    with pytest.raises(OSError):
        with_retries(f, None)
    assert f.calls == 1
    f2 = Flaky(1)
    with pytest.raises(OSError):
        with_retries(f2, RetrySpec(enabled=False))
    assert f2.calls == 1


def test_linear_retries_until_success():
    sleeps = []
    f = Flaky(3)
    spec = RetrySpec(interval=10, strategy="linear", max_attempts=3, enabled=True)
    assert with_retries(f, spec, sleep=sleeps.append) == "ok"
    # reference semantics: max_attempts counts FAILURES → up to 4 executions
    assert f.calls == 4
    assert sleeps == [10, 10, 10]


def test_exponential_doubles_interval():
    sleeps = []
    f = Flaky(3)
    spec = RetrySpec(interval=5, strategy="exponential", max_attempts=3, enabled=True)
    assert with_retries(f, spec, sleep=sleeps.append) == "ok"
    assert sleeps == [5, 10, 20]


def test_exhausted_attempts_reraise():
    sleeps = []
    f = Flaky(10)
    spec = RetrySpec(interval=1, max_attempts=3, enabled=True)
    with pytest.raises(OSError):
        with_retries(f, spec, sleep=sleeps.append)
    assert f.calls == 4 and len(sleeps) == 3


def test_non_retriable_propagates_immediately():
    f = Flaky(5, exc=ValueError)
    spec = RetrySpec(enabled=True)
    with pytest.raises(ValueError):
        with_retries(f, spec, sleep=lambda s: None)
    assert f.calls == 1


def test_spec_validation():
    with pytest.raises(ValueError):
        RetrySpec(strategy="quadratic")
    s = RetrySpec(interval=0, max_attempts=0)
    assert s.interval == 10.0 and s.max_attempts == 3  # RetrySpec.java defaults
