"""PID rate estimator: convergence, overload shedding, backlog drain."""

from __future__ import annotations

from edu_online_spark.streaming.backpressure import (
    BatchStats,
    PIDRateEstimator,
    stats_from_progress,
)


def test_converges_to_processing_rate():
    """Steady pipeline processing 1000 rows/s → estimate settles there."""
    est = PIDRateEstimator(batch_interval_sec=3.0)
    rate = None
    for i in range(1, 20):
        # each batch: 3000 rows in 3s → 1000 rows/s, no backlog
        rate = est.update(BatchStats(i * 3.0, 3000, 3.0))
    assert rate is not None and abs(rate - 1000.0) < 1.0
    assert est.suggested_max_per_trigger() == int(rate * 3.0)


def test_overload_cuts_rate():
    """Batches taking 2x the interval → the estimator cuts the ingest
    rate toward what the pipeline actually sustains."""
    est = PIDRateEstimator(batch_interval_sec=3.0)
    est.update(BatchStats(3.0, 6000, 3.0))  # bootstrap at 2000/s
    rate = est.update(BatchStats(9.0, 6000, 6.0))  # same rows, 2x time
    assert rate is not None and rate < 2000.0
    assert rate >= 1000.0 - 1e-9  # no overshoot past measured capacity


def test_backlog_pushes_below_processing_rate():
    """With scheduling delay (queued batches), the integral term drives
    the rate BELOW the processing rate to drain the backlog."""
    est = PIDRateEstimator(batch_interval_sec=3.0)
    est.update(BatchStats(3.0, 3000, 3.0))
    no_backlog = est.update(BatchStats(6.0, 3000, 3.0, scheduling_delay_sec=0.0))
    est2 = PIDRateEstimator(batch_interval_sec=3.0)
    est2.update(BatchStats(3.0, 3000, 3.0))
    backlog = est2.update(BatchStats(6.0, 3000, 3.0, scheduling_delay_sec=6.0))
    assert backlog is not None and no_backlog is not None
    assert backlog < no_backlog


def test_min_rate_floor():
    est = PIDRateEstimator(batch_interval_sec=1.0, min_rate=100.0)
    est.update(BatchStats(1.0, 1000, 1.0))
    # catastrophic slowdown cannot drive the rate to zero
    rate = est.update(BatchStats(2.0, 10, 100.0, scheduling_delay_sec=500.0))
    assert rate == 100.0


def test_stats_from_progress_adapter():
    p = {"durationMs": {"triggerExecution": 1500}, "numInputRows": 4500}
    s = stats_from_progress(p, time_sec=42.0)
    assert s is not None
    assert s.num_elements == 4500 and s.processing_delay_sec == 1.5
    assert stats_from_progress({}, 0.0) is None


def test_progress_adapter_lags_overrun_one_batch():
    """Scheduling delay is the wait caused by PRIOR batches: a slow
    batch must not self-report its own overrun, and the fast batch that
    queued behind it must report the backlog it actually suffered."""
    from edu_online_spark.streaming.backpressure import ProgressStatsAdapter

    adapter = ProgressStatsAdapter(trigger_interval_sec=3.0)
    slow = {"durationMs": {"triggerExecution": 5000}, "numInputRows": 100}
    fast = {"durationMs": {"triggerExecution": 1000}, "numInputRows": 100}

    s1 = adapter(slow, time_sec=1.0)
    assert s1.scheduling_delay_sec == 0.0  # no prior batch → no backlog
    s2 = adapter(fast, time_sec=2.0)
    assert s2.scheduling_delay_sec == 2.0  # queued behind the 2s overrun
    s3 = adapter(fast, time_sec=3.0)
    assert s3.scheduling_delay_sec == 0.0  # fast batch left no backlog

    # without a trigger interval the backlog term is (documented) off
    off = ProgressStatsAdapter()
    assert off(slow, time_sec=4.0).scheduling_delay_sec == 0.0


def test_observe_live_query_end_to_end(spark, tmp_path):
    """T5 closed against a REAL StreamingQuery: drive a file-source job,
    poll its lastProgress through observe_query, and get a positive
    finite rate cap out — the estimator consumes genuine engine
    progress records, not just synthetic dicts."""
    import os

    from edu_online_spark.streaming import jobs
    from edu_online_spark.streaming.backpressure import (
        PIDRateEstimator,
        ProgressStatsAdapter,
        observe_query,
    )
    from edu_online_spark.streaming.sources import file_stream

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    est = PIDRateEstimator(batch_interval_sec=3.0, min_rate=1.0)
    adapter = ProgressStatsAdapter(trigger_interval_sec=3.0)

    cap = None
    for wave in range(3):
        with open(os.path.join(src, f"b{wave}.txt"), "w") as f:
            for i in range(50):
                f.write(f"u{wave}-{i}\t1\t2026-08-13 10:00:0{wave}\n")
        q = jobs.register_totals_job(
            file_stream(spark, src), out, ckpt, available_now=True
        )
        q.awaitTermination(120)
        cap = observe_query(q, est, adapter)
    assert cap is not None and cap >= 1


def test_observe_query_default_adapter_keeps_backlog_signal():
    """Without an explicit adapter, observe_query must still thread the
    prior batch's overrun between calls (a throwaway adapter per call
    would permanently disable the integral term)."""
    from edu_online_spark.streaming.backpressure import (
        PIDRateEstimator,
        observe_query,
    )

    class FakeQuery:
        def __init__(self):
            self.lastProgress = None

    est = PIDRateEstimator(batch_interval_sec=3.0, min_rate=1.0)
    q = FakeQuery()
    # batch 0: overruns the interval (9s for 900 rows)
    q.lastProgress = {"batchId": 0, "durationMs": {"triggerExecution": 9000},
                      "numInputRows": 900}
    observe_query(q, est)
    # batch 1: fast — but queued behind batch 0's 6s overrun
    q.lastProgress = {"batchId": 3, "durationMs": {"triggerExecution": 3000},
                      "numInputRows": 300}
    observe_query(q, est)
    adapter = est._default_adapter
    assert adapter is not None
    # the overrun was consumed: batch 1 reported 6s backlog and left none
    assert adapter._pending_overrun == 0.0
    # with the backlog signal the rate lands BELOW the 100/s processing
    # rate (integral term engaged); a dead adapter would give exactly 100
    cap = observe_query(q, est)
    assert cap is not None and cap < 100 * 3.0
