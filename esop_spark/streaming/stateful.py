"""Custom stateful streaming operators via applyInPandasWithState.

The reference's incremental behaviors keep per-key state across invocations
(in-flight upload tracking, AbstractTracker.java:95-168; session progress
counters :362-367). In Structured Streaming that pattern is an arbitrary
stateful operator: Arrow-batched per-key state with checkpoint-backed
fault tolerance.

``running_user_counts`` is the canonical shape: per-key accumulator that
survives micro-batches AND query restarts (state lives in the checkpoint).
Custom session windows, dedup-with-TTL, and progress trackers are the same
skeleton with different state schemas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_OUTPUT = "user_id bigint, total_events bigint, total_value double"
RUNNING_COUNT_STATE = "count bigint, value_sum double"


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, vsum = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        vsum += float(pdf["value"].sum())
    state.update((cnt, vsum))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [cnt], "total_value": [vsum]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) over an event stream.

    State is per-key and checkpoint-backed: a restarted query resumes the
    accumulators instead of recounting (exactly-once state semantics).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _count_fn,
        outputStructType=RUNNING_COUNT_OUTPUT,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT = "user_id bigint, stage_reached int, last_ts_us bigint"
FUNNEL_STATE = "stage int, last_ts bigint"


def funnel_stages_stream(events: DataFrame, stages: tuple[str, ...]) -> DataFrame:
    """Streaming counterpart of ``analytics.funnel``: per-user funnel stage
    as checkpoint-backed state over an event stream.

    Within a micro-batch the user's events are replayed in (ts, event_id)
    order with the same strictly-after advancement rule as the batch
    operator; across batches the state advances monotonically in arrival
    order (the standard streaming approximation — an event arriving later
    than a batch boundary cannot retroactively reorder; bound staleness
    with a watermark upstream if needed). Emits the user's current stage
    each update.
    """
    n = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k, last = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                ts_us = int(ts.value // 1000)
                if k < n and stage_of.get(et) == k and (k == 0 or ts_us > last):
                    k += 1
                    last = ts_us
        state.update((k, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage_reached": [k],
                "last_ts_us": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PMC_OUTPUT = "user_id bigint, n_points bigint, n_segments bigint"
PMC_STATE = "segs bigint, mn double, mx double, n bigint"


def pmc_segments_stream(events: DataFrame, eps: float) -> DataFrame:
    """Streaming counterpart of ``analytics.pmc_segments``: the
    error-bounded piecewise-constant segment count maintained as per-key
    state over an event stream — model-based compression as a continuous
    process instead of a batch census.

    Same ordering contract as the streaming funnel: in-batch events are
    replayed in (ts, event_id) order; across batches state advances in
    arrival order. Emits the series' running (points, segments) each
    update.
    """
    width = 2.0 * eps

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        segs, mn, mx, n = state.get if state.exists else (0, 0.0, 0.0, 0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                v = float(v)
                n += 1
                if segs == 0:
                    segs, mn, mx = 1, v, v
                elif max(mx, v) - min(mn, v) <= width:
                    mn, mx = min(mn, v), max(mx, v)
                else:
                    segs, mn, mx = segs + 1, v, v
        state.update((segs, mn, mx, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_points": [n],
                "n_segments": [segs],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=PMC_OUTPUT,
        stateStructType=PMC_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT = "event_type string, n_events bigint, threshold bigint"
HH_STATE = "count bigint, next_thr bigint"


def heavy_hitter_alerts(events: DataFrame, min_emit: int = 8) -> DataFrame:
    """Streaming heavy-hitter monitor: per event type, a checkpoint-backed
    running count that EMITS ONLY on doubling thresholds (min_emit, 2x,
    4x, ...) — the alerting pattern for "this key is getting hot" where a
    per-batch full dump would swamp the sink. Emission is a pure function
    of the cumulative count, so a restarted query never re-emits a
    threshold it already crossed (the state stores the next pending
    threshold, not a history).

    Scale: state is two bigints per key; output volume is logarithmic in
    the per-key count. The batch-side reconciliation is ``hot_keys``
    (q146) over the same stream's sink table.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        cnt, thr = state.get if state.exists else (0, min_emit)
        for pdf in pdfs:
            cnt += len(pdf)
        crossed = []
        while cnt >= thr:
            crossed.append(thr)
            thr *= 2
        state.update((cnt, thr))
        if crossed:
            yield pd.DataFrame(
                {
                    "event_type": [key[0]] * len(crossed),
                    "n_events": [cnt] * len(crossed),
                    "threshold": crossed,
                }
            )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT,
        stateStructType=HH_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT = (
    "series_key string, n_obs bigint, p_milli bigint, s_milli bigint,"
    " flagged int"
)
CUSUM_STATE = "n bigint, p bigint, minp bigint"


def _cusum_fn(baseline_milli: int, threshold_milli: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, p, minp = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            for v in pdf["value_milli"]:
                n += 1
                p += int(v) - baseline_milli
                if p < minp:
                    minp = p
        state.update((n, p, minp))
        s = p - min(minp, 0)
        yield pd.DataFrame(
            {
                "series_key": [key[0]],
                "n_obs": [n],
                "p_milli": [p],
                "s_milli": [s],
                "flagged": [1 if s > threshold_milli else 0],
            }
        )

    return fn


def cusum_stream(
    observations: DataFrame,
    baseline_milli: int,
    threshold_milli: int,
) -> DataFrame:
    """Streaming counterpart of ``analytics.cusum_changepoints``: per-key
    one-sided CUSUM with the (running-sum, running-min) pair as the ONLY
    state — the prefix-sum-minus-running-min identity means two bigints
    per key reproduce the full batch recursion, survive restarts via the
    checkpoint, and never grow with stream length.

    Input schema: (series_key string, value_milli bigint); emits the
    current CUSUM and drift flag per key each micro-batch."""
    return observations.groupBy("series_key").applyInPandasWithState(
        _cusum_fn(int(baseline_milli), int(threshold_milli)),
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


JSD_OUTPUT = (
    "series_key string, batch_n bigint, prev_n bigint, jsd_milli bigint"
)
JSD_STATE = "cats string, counts string"


def _jsd_fn(key, pdfs, state: GroupState):
    import json as _json
    import math as _math

    prev: dict = (
        dict(zip(_json.loads(state.get[0]), _json.loads(state.get[1])))
        if state.exists
        else {}
    )
    curr: dict = {}
    for pdf in pdfs:
        for c in pdf["category"]:
            curr[c] = curr.get(c, 0) + 1
    n_prev, n_curr = sum(prev.values()), sum(curr.values())
    jsd = 0.0
    if n_prev and n_curr:
        cats = sorted(set(prev) | set(curr))
        for c in cats:
            p = prev.get(c, 0) / n_prev
            q = curr.get(c, 0) / n_curr
            m = (p + q) / 2
            if p > 0:
                jsd += p / 2 * _math.log(p / m)
            if q > 0:
                jsd += q / 2 * _math.log(q / m)
    state.update(
        (_json.dumps(sorted(curr)), _json.dumps([curr[c] for c in sorted(curr)]))
    )
    yield pd.DataFrame(
        {
            "series_key": [key[0]],
            "batch_n": [n_curr],
            "prev_n": [n_prev],
            "jsd_milli": [int(round(jsd * 1000))],
        }
    )


def jsd_drift_stream(observations: DataFrame) -> DataFrame:
    """Streaming counterpart of ``analytics.daily_type_jsd``: per key, the
    Jensen–Shannon divergence of each micro-batch's categorical mix
    against the PREVIOUS batch's — state is just the previous batch's
    category histogram (bounded by the category alphabet, not stream
    length), checkpoint-backed.

    Input schema: (series_key string, category string); emits
    (batch_n, prev_n, jsd_milli) per key per batch."""
    return observations.groupBy("series_key").applyInPandasWithState(
        _jsd_fn,
        outputStructType=JSD_OUTPUT,
        stateStructType=JSD_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_OUTPUT = "wd bigint, n_present bigint, hll_est double"
HLL_STATE = "js string, regs string"


def _hll_fn_factory(p_bits: int):
    m = 1 << p_bits
    w_bits = 32 - p_bits
    alpha = 0.7213 / (1 + 1.079 / m)

    def fn(key, pdfs, state: GroupState):
        import hashlib as _hashlib
        import json as _json
        import math as _math

        regs: dict = (
            dict(
                zip(_json.loads(state.get[0]), _json.loads(state.get[1]))
            )
            if state.exists
            else {}
        )
        for pdf in pdfs:
            for u in pdf["u"]:
                # the batch leg's md5_hash32 family, bit-exact: first 8 hex
                # chars of md5 as a 32-bit int; register index = top p_bits,
                # rank = leading-zeros-in-the-rest + 1 (conv-length form)
                h = int(_hashlib.md5(str(u).encode()).hexdigest()[:8], 16)
                j = h >> w_bits
                rem = h % (1 << w_bits)
                r = (w_bits + 1) if rem == 0 else (w_bits + 1) - rem.bit_length()
                if r > regs.get(j, 0):
                    regs[j] = r
        state.update(
            (
                _json.dumps(sorted(regs)),
                _json.dumps([regs[j] for j in sorted(regs)]),
            )
        )
        n_present = len(regs)
        s_present = sum(2.0 ** -r for r in regs.values())
        zeros = m - n_present
        raw = alpha * m * m / (s_present + zeros)
        est = (
            m * _math.log(m / zeros)
            if raw <= 2.5 * m and zeros > 0
            else raw
        )
        yield pd.DataFrame(
            {
                "wd": [key[0]],
                "n_present": [n_present],
                "hll_est": [round(est, 6)],
            }
        )

    return fn


def hll_window_stream(observations: DataFrame, p_bits: int = 8) -> DataFrame:
    """Streaming counterpart of ``analytics.hll_window_merge``: per
    window-day key, HyperLogLog registers as the ONLY state — ≤2^p_bits
    small ints per key regardless of stream length — merged incrementally
    as user observations arrive and checkpoint-backed across restarts.
    The caller expands each (day, user) observation into the window-day
    keys it serves (the same cover-explode the batch leg uses), so the
    stateful operator itself is a plain per-key register max-merge.

    The register family is bit-exact with the batch leg (md5_hash32 +
    conv-length rank + the small-range correction), so a full replay's
    final emission per key equals the batch ``hll_est`` — the stream ==
    batch property the mergeable sketch exists for. Parity holds at EVERY
    ``p_bits``: both legs derive Flajolet's alpha_m from p_bits with the
    same formula (``analytics.hll_window_merge`` round-7 change; before
    that the batch leg hardcoded the m=256 constant and parity was
    default-p_bits-only).

    Input schema: (wd bigint, u string); emits
    (wd, n_present, hll_est) per key per micro-batch."""
    return observations.groupBy("wd").applyInPandasWithState(
        _hll_fn_factory(int(p_bits)),
        outputStructType=HLL_OUTPUT,
        stateStructType=HLL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HIST_OUTPUT = "wd bigint, q_milli bigint, n_rows bigint, pctile_cents bigint"
HIST_STATE = "bs string, ns string"


def _hist_fn_factory(bucket_cents: int, q_millis: tuple):
    qs = [int(q) for q in q_millis]

    def fn(key, pdfs, state: GroupState):
        import json as _json

        hist: dict = (
            dict(
                zip(_json.loads(state.get[0]), _json.loads(state.get[1]))
            )
            if state.exists
            else {}
        )
        for pdf in pdfs:
            for b in pdf["b"]:
                b = int(b)
                hist[b] = hist.get(b, 0) + 1
        state.update(
            (
                _json.dumps(sorted(hist)),
                _json.dumps([hist[b] for b in sorted(hist)]),
            )
        )
        total = sum(hist.values())
        out_q, out_p = [], []
        cum = 0
        want = sorted(qs)
        wi = 0
        for b in sorted(hist):
            cum += hist[b]
            while wi < len(want) and cum * 1000 >= want[wi] * total:
                out_q.append(want[wi])
                out_p.append(b * bucket_cents)
                wi += 1
            if wi == len(want):
                break
        yield pd.DataFrame(
            {
                "wd": [key[0]] * len(out_q),
                "q_milli": out_q,
                "n_rows": [total] * len(out_q),
                "pctile_cents": out_p,
            }
        )

    return fn


def histogram_window_stream(
    observations: DataFrame,
    bucket_cents: int = 500,
    q_millis: tuple = (500, 950),
) -> DataFrame:
    """Streaming counterpart of ``analytics.histogram_window_pctile``: per
    window-day key, the bounded bucket histogram is the ONLY state
    (|value range| / bucket_cents ints per key, independent of stream
    length); each micro-batch merges new bucket counts in and re-reads
    the percentiles as the first bucket whose cumulative count reaches
    q·total — the identical first-crossing rule (and bucket-lower-bound
    answer) as the batch leg, so a full replay's final emission equals
    the batch ``pctile_cents`` per (day, q).

    Input schema: (wd bigint, b bigint) — the caller buckets values and
    cover-explodes days exactly as the batch leg does; emits
    (wd, q_milli, n_rows, pctile_cents) per key per micro-batch."""
    return observations.groupBy("wd").applyInPandasWithState(
        _hist_fn_factory(int(bucket_cents), tuple(q_millis)),
        outputStructType=HIST_OUTPUT,
        stateStructType=HIST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
