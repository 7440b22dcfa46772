"""PID-based ingest backpressure (SURVEY §2.8 T5).

The reference turns on `spark.streaming.backpressure.enabled`
(QzPointStreaming.scala:34-35) — DStream's PID controller that adapts
maxRatePerPartition to the measured processing rate. Structured
Streaming has no runtime-adjustable rate cap (maxOffsetsPerTrigger /
maxFilesPerTrigger are fixed at query start), so the equivalent is a
CONTROLLER OUTSIDE the query: measure each micro-batch from
StreamingQuery.lastProgress, run the same PID law, and apply the
suggested cap at the next (re)start — the standard pattern for
long-running SS jobs that restart on deploys anyway.

The control law follows the published PID design of Spark's DStream
rate estimator (proportional on the rate error, integral on the queued
backlog via scheduling delay, optional derivative), re-derived here —
not a code translation.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class BatchStats:
    """One micro-batch observation.

    time_sec: completion timestamp (any monotonic clock);
    num_elements: input rows processed;
    processing_delay_sec: how long the batch took to process;
    scheduling_delay_sec: how long it waited before processing
    (backlog signal — 0 when the engine keeps up).
    """

    time_sec: float
    num_elements: int
    processing_delay_sec: float
    scheduling_delay_sec: float = 0.0


class PIDRateEstimator:
    """Estimate the per-second ingest rate the pipeline can sustain.

    rate' = rate − Kp·error − Ki·historical_error − Kd·d(error)/dt
      error            = rate − measured processing rate
      historical_error = backlog drained per interval
                         (scheduling_delay · processing_rate / interval)

    With the default gains the estimate converges to the measured
    processing rate and additionally sheds the backlog: if batches
    queue up, the integral term pushes the rate below the processing
    rate until the scheduling delay returns to zero.
    """

    def __init__(
        self,
        batch_interval_sec: float,
        proportional: float = 1.0,
        integral: float = 0.2,
        derivative: float = 0.0,
        min_rate: float = 100.0,
    ) -> None:
        if batch_interval_sec <= 0:
            raise ValueError("batch_interval_sec must be positive")
        self.batch_interval_sec = batch_interval_sec
        self.kp = proportional
        self.ki = integral
        self.kd = derivative
        self.min_rate = min_rate
        self._latest_time: float | None = None
        self._latest_rate: float | None = None
        self._latest_error = 0.0

    def update(self, stats: BatchStats) -> float | None:
        """Feed one batch; returns the new rate estimate (elements/sec)
        or None until a second valid observation arrives."""
        if stats.num_elements <= 0 or stats.processing_delay_sec <= 0:
            return self._latest_rate
        processing_rate = stats.num_elements / stats.processing_delay_sec
        if self._latest_time is None or self._latest_rate is None:
            # bootstrap: trust the first measurement outright
            self._latest_time = stats.time_sec
            self._latest_rate = processing_rate
            self._latest_error = 0.0
            return None
        dt = stats.time_sec - self._latest_time
        if dt <= 0:
            return self._latest_rate
        error = self._latest_rate - processing_rate
        historical_error = (
            stats.scheduling_delay_sec * processing_rate / self.batch_interval_sec
        )
        derror = (error - self._latest_error) / dt
        new_rate = max(
            self._latest_rate
            - self.kp * error
            - self.ki * historical_error
            - self.kd * derror,
            self.min_rate,
        )
        self._latest_time = stats.time_sec
        self._latest_rate = new_rate
        self._latest_error = error
        return new_rate

    def suggested_max_per_trigger(self) -> int | None:
        """The cap to pass as maxOffsetsPerTrigger (Kafka) or to scale
        maxFilesPerTrigger by, at the next query (re)start."""
        if self._latest_rate is None:
            return None
        return max(int(self._latest_rate * self.batch_interval_sec), 1)


def stats_from_progress(
    progress: dict,
    time_sec: float,
    trigger_interval_sec: float | None = None,
    prev_overrun_sec: float = 0.0,
) -> BatchStats | None:
    """Adapt a StreamingQuery.lastProgress dict to BatchStats.

    processing delay  := durationMs.triggerExecution
    scheduling delay  := the PRIOR batch's interval overrun
    (prev_overrun_sec) — the wait THIS batch suffered is caused by the
    batches before it, not by its own runtime; a batch that queued but
    ran fast must still report the backlog, and a slow batch must not
    self-report one it didn't experience. SS has no explicit queueing
    metric, so callers thread the overrun between calls (or use
    ProgressStatsAdapter, which does it for them). Without a trigger
    interval the overrun is unknowable and the integral
    (backlog-shedding) term stays off — the controller then only
    converges TO the processing rate, never below it.
    """
    if not progress:
        return None
    dur = progress.get("durationMs", {})
    exec_ms = dur.get("triggerExecution")
    rows = progress.get("numInputRows", 0)
    if exec_ms is None:
        return None
    exec_sec = exec_ms / 1000.0
    return BatchStats(
        time_sec=time_sec,
        num_elements=int(rows),
        processing_delay_sec=exec_sec,
        scheduling_delay_sec=prev_overrun_sec if trigger_interval_sec else 0.0,
    )


class ProgressStatsAdapter:
    """Stateful lastProgress → BatchStats adapter: carries each batch's
    interval overrun forward so the NEXT observation reports it as its
    scheduling delay (mirroring the DStream estimator, whose
    schedulingDelay is the wait caused by prior batches)."""

    def __init__(self, trigger_interval_sec: float | None = None) -> None:
        self.trigger_interval_sec = trigger_interval_sec
        self._pending_overrun = 0.0

    def __call__(self, progress: dict, time_sec: float) -> BatchStats | None:
        stats = stats_from_progress(
            progress,
            time_sec,
            trigger_interval_sec=self.trigger_interval_sec,
            prev_overrun_sec=self._pending_overrun,
        )
        if stats is not None and self.trigger_interval_sec is not None:
            self._pending_overrun = max(
                0.0, stats.processing_delay_sec - self.trigger_interval_sec
            )
        return stats


def observe_query(
    query,
    estimator: PIDRateEstimator,
    adapter: "ProgressStatsAdapter | None" = None,
    time_source=None,
) -> int | None:
    """Feed a live StreamingQuery's lastProgress into the estimator;
    returns the current suggested maxOffsetsPerTrigger (None until two
    valid observations).

    The polling loop a supervisor runs between (re)starts:

        est = PIDRateEstimator(batch_interval_sec=3.0)
        adapter = ProgressStatsAdapter(trigger_interval_sec=3.0)
        while query.isActive:
            cap = observe_query(query, est, adapter)
            ...
        # on restart: .option("maxOffsetsPerTrigger", cap)

    `time_source` is injectable for tests; defaults to the progress
    record's own batch timestamp when present so replayed progress
    sequences produce identical estimates.
    """
    progress = query.lastProgress
    if not progress:
        return estimator.suggested_max_per_trigger()
    if time_source is not None:
        now = time_source()
    else:
        # batchId is monotone per query; scale by the trigger interval
        # so dt between consecutive batches is physically meaningful
        now = float(progress.get("batchId", 0)) * estimator.batch_interval_sec
    if adapter is None:
        # The default adapter must PERSIST across calls (it carries the
        # prior batch's overrun — a fresh throwaway adapter per call
        # would silence the backlog/integral term forever), so it is
        # cached on the estimator. One estimator + one adapter serve
        # exactly ONE query: PID state is per-stream, so don't mix
        # explicit and default adapters for the same estimator, and
        # build a fresh estimator per query.
        adapter = getattr(estimator, "_default_adapter", None)
        if adapter is None:
            adapter = ProgressStatsAdapter(estimator.batch_interval_sec)
            estimator._default_adapter = adapter
    stats = adapter(progress, now)
    if stats is not None:
        estimator.update(stats)
    return estimator.suggested_max_per_trigger()
