"""Incremental event-time operators, batch/stream agnostic.

Each transformation takes a DataFrame (batch or streaming) and returns one;
``read_event_stream`` + ``run_available_now`` wire them to a parquet-backed
stream for tests and to any real source (Kafka etc.) in production.

Watermarks bound state: a tumbling-window aggregation with a ``delay``
watermark keeps only windows newer than ``max(event_time) - delay`` in the
state store — the property that makes these run forever at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseries_spark import schemas


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events directory (parquet files appear over
    time). Schema must be explicit — streaming sources never infer."""
    return (
        spark.readStream.schema(schemas.EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_type_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Late data beyond ``watermark`` is dropped (streaming) — batch mode
    computes the same result exactly since nothing is late at rest.
    Output: (window_start_s, event_type, n, total_value)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "2 hours",
    streaming: bool = False,
    watermark: str = "4 hours",
) -> DataFrame:
    """Session-window aggregation per user (gap-based session merge via
    the native ``session_window`` — no custom state handler needed).

    Output: (user_id, session_start_s, n_events, total_value); the session
    spans all events whose inter-arrival gap stays under ``gap``."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            "n_events",
            "total_value",
        )
    )


def running_peaks(
    events: DataFrame, streaming: bool = False
) -> DataFrame:
    """Per-user record detector: emit every event whose ``value`` exceeds
    all of that user's earlier values, with the previous record attached.

    Batch mode is a running-max window (pure Catalyst). Streaming mode is
    the engine's custom stateful operator surface: ``applyInPandasWithState``
    holds one double per user (the record so far) across micro-batches —
    O(|users|) state forever, no watermark needed, arbitrarily late keys
    resume from their stored record. Output:
    (user_id, event_id, ts, value, prev_peak nullable)."""
    if not streaming:
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max("value").over(w)
        return (
            events.select(
                "user_id", "event_id", "ts", "value", prev.alias("prev_peak")
            )
            .filter(
                F.col("prev_peak").isNull()
                | (F.col("value") > F.col("prev_peak"))
            )
        )

    import pandas as pd  # noqa: PLC0415 — worker-side dependency
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id bigint, event_id bigint, ts timestamp, "
        "value double, prev_peak double"
    )

    def emit_records(key, pdf_iter, state):
        peak = state.get[0] if state.exists else None
        rows = []
        for pdf in pdf_iter:
            for r in pdf.sort_values("ts").itertuples(index=False):
                if peak is None or r.value > peak:
                    rows.append((key[0], r.event_id, r.ts, r.value, peak))
                    peak = float(r.value)
        if peak is not None:
            state.update((peak,))
        yield pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "value", "prev_peak"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        emit_records,
        out_schema,
        "peak double",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def dedup_events(
    events: DataFrame,
    streaming: bool = False,
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
) -> DataFrame:
    """Exact dedup for at-least-once event streams — the streaming face of
    the dedup extension family: replays/retries collapse to exactly-once
    rows on the key.

    Streaming mode uses ``dropDuplicatesWithinWatermark``: the state store
    holds keys only within the watermark horizon (old keys are evicted
    once no duplicate can still arrive), so state is bounded by arrival
    rate × watermark — not by stream lifetime, which is what lets this
    run forever. Batch mode is a plain ``dropDuplicates`` and returns the
    same surviving key set."""
    if streaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(list(key_cols))
    return events.dropDuplicates(list(key_cols))


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    spark: SparkSession,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain all currently-available input through the streaming plan into
    an in-memory sink and return the materialized result (test harness)."""
    # complete mode for windowed aggs: append would hold back windows not
    # yet past the watermark, so a drained test run would miss the newest
    # windows; stateful flat-map operators are append-only.
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


class IncrementalAssociationSink:
    """foreachBatch bridge from a stream of new evidence to the engine's
    incremental recompute (plans/incremental.py): each micro-batch appends
    to the evidence store, recomputes ONLY the touched (d,t,ds) groups,
    and publishes a new immutable association version.

    Versioned publication (``assoc_dir/v<batch_id>``) instead of
    read-modify-overwrite: readers always see a complete consistent
    version (the reference overwrites the table it is reading,
    timeseries.py:632-634 — SURVEY.md §7 risk), and the previous version
    stays queryable during the write. ``current_version`` returns the
    newest published path. State across restarts is the evidence store
    plus the version directory — both idempotent under micro-batch replay
    because the append is keyed by batch id and versions overwrite."""

    def __init__(self, cfg, evidence_dir: str, assoc_dir: str, key_cols=None):
        from timeseries_spark.plans.incremental import incremental_association

        self._incremental = incremental_association
        self.cfg = cfg
        self.evidence_dir = evidence_dir
        self.assoc_dir = assoc_dir
        self.keys = list(key_cols or ("diseaseId", "targetId", "datasourceId"))

    def current_version(self, spark: SparkSession) -> str | None:
        from timeseries_spark.sources.io import table_exists

        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.assoc_dir)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return None
        versions = [
            f.getPath().getName()
            for f in fs.listStatus(path)
            if f.getPath().getName().startswith("v")
        ]
        if not versions:
            return None
        latest = max(versions, key=lambda v: int(v[1:]))
        out = f"{self.assoc_dir}/{latest}"
        return out if table_exists(spark, out) else None

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (bind with ``.foreachBatch(sink.process)``)."""
        from timeseries_spark.operators.novelty import add_novelty
        from timeseries_spark.operators.scoring import association_score

        spark = batch_df.sparkSession
        # idempotent append: replayed batches land in the same subdir
        batch_df.write.mode("overwrite").parquet(
            f"{self.evidence_dir}/batch={batch_id}"
        )
        all_evidence = spark.read.parquet(self.evidence_dir)
        current = self.current_version(spark)
        if current is None:
            fresh = add_novelty(
                association_score(all_evidence, self.cfg, self.keys),
                self.cfg,
                self.keys,
            )
        else:
            fresh = self._incremental(
                spark.read.parquet(current),
                all_evidence,
                batch_df,
                self.cfg,
                self.keys,
            )
        fresh.write.mode("overwrite").parquet(f"{self.assoc_dir}/v{batch_id}")


class SemanticIngestSink:
    """foreachBatch bridge from a stream of new document shards to
    incremental SEMANTIC dedup (extensions/dedup.py:
    incremental_semantic_dedup) — the streaming face of ingestion-time
    embedding dedup: each micro-batch is judged against the CURRENT
    accepted corpus (the base corpus plus every previously accepted
    shard row) under a FIXED quantizer, and the surviving rows publish
    as an idempotent batch-keyed append.

    Stream rows carry (doc_id, source, embedding) — one vector per doc
    (the corpus contract). Invariants:

    - the quantizer (a staged centroid table; extensions/staging.py)
      never refits inside the stream: a shard must not move the blocks
      it is judged against, and block assignment stays replayable —
      refit cadence is an offline decision, after which the stream
      restarts against the new artifact;
    - the accepted store is append-only (``accepted_dir/batch=<id>``)
      and micro-batch replay after a crash overwrites its own subdir —
      the replayed batch's previous output is EXCLUDED from the corpus
      it is judged against (see ``corpus_vectors``) — so the corpus a
      later shard sees is always a complete, deterministic prefix of
      the stream;
    - within a shard, near-dups BOTH survive (the incremental contract
      — shard-internal dedup belongs to the periodic full
      ``semantic_dedup`` pass), so acceptance depends only on the
      corpus prefix, never on intra-batch ordering.

    State across restarts is the accepted directory itself — no state
    store, no watermark: dedup state IS the corpus, which a 100 TB
    deployment already persists."""

    def __init__(
        self,
        corpus_path: str,
        accepted_dir: str,
        centroids: DataFrame,
        threshold: float = 0.40,
        doc_id_col: str = "doc_id",
        vec_col: str = "embedding",
        carry_cols: tuple[str, ...] = ("source",),
    ):
        self.corpus_path = corpus_path
        self.accepted_dir = accepted_dir
        self.centroids = centroids
        self.threshold = threshold
        self.doc_id_col = doc_id_col
        self.vec_col = vec_col
        self.carry_cols = tuple(carry_cols)

    def _accepted_batches(
        self, spark: SparkSession, exclude_batch_id: int | None = None
    ) -> list[str]:
        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.accepted_dir)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return []
        skip = (
            None
            if exclude_batch_id is None
            else f"batch={exclude_batch_id}"
        )
        dirs = [
            f"{self.accepted_dir}/{f.getPath().getName()}"
            for f in fs.listStatus(path)
            if f.getPath().getName().startswith("batch=")
            and f.getPath().getName() != skip
        ]
        # only COMPLETE publications join the corpus: the _SUCCESS marker
        # must itself exist (listStatus already proved the directory
        # does, so a bare dir-exists check gated nothing) — a torn write
        # from a killed micro-batch has no marker, is excluded here, and
        # is overwritten whole on replay
        return sorted(
            d
            for d in dirs
            if fs.exists(jvm.org.apache.hadoop.fs.Path(d + "/_SUCCESS"))
        )

    def corpus_vectors(
        self, spark: SparkSession, exclude_batch_id: int | None = None
    ) -> DataFrame:
        """Base corpus ∪ all accepted shard rows, as (doc_id, embedding).

        ``exclude_batch_id`` drops ``batch=<id>`` from the union — the
        checkpoint-replay guard: when micro-batch N completed its write
        but crashed before the offset commit, the replay of batch N must
        NOT be judged against its own previous output (reading the path
        it is about to overwrite raises Spark's cannot-overwrite-a-path-
        being-read error, and semantically self-inclusion would drop
        every previously accepted row at cosine 1.0). A compacted dir
        ``batch=c<id>`` that swallowed batch N between the crash and the
        restart is deliberately KEPT: its batch-N rows make the replay
        drop those rows again (they are already in the corpus), so the
        replayed ``batch=<id>`` publishes empty and the corpus row-set
        is unchanged — whereas excluding the c-dir would wrongly remove
        every PRIOR batch from the corpus."""
        cols = [self.doc_id_col, self.vec_col]
        corpus = spark.read.parquet(self.corpus_path).select(*cols)
        for d in self._accepted_batches(spark, exclude_batch_id):
            corpus = corpus.unionByName(spark.read.parquet(d).select(*cols))
        return corpus

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback (bind with ``.foreachBatch(sink.process)``)."""
        from timeseries_spark.extensions.dedup import (
            incremental_semantic_dedup,
        )

        spark = batch_df.sparkSession
        survivors = incremental_semantic_dedup(
            batch_df.select(self.doc_id_col, *self.carry_cols),
            batch_df.select(
                F.col(self.doc_id_col).alias("vec_id"), self.vec_col
            ),
            self.corpus_vectors(spark, exclude_batch_id=batch_id).select(
                F.col(self.doc_id_col).alias("vec_id"), self.vec_col
            ),
            threshold=self.threshold,
            centroids=self.centroids,
            doc_id_col=self.doc_id_col,
            carry_cols=(),
        )
        batch_df.join(
            survivors.select(self.doc_id_col), self.doc_id_col, "left_semi"
        ).write.mode("overwrite").parquet(
            f"{self.accepted_dir}/batch={batch_id}"
        )

    def compact(self, spark: SparkSession) -> int:
        """Rewrite all complete accepted batch dirs into ONE consolidated
        dir (``batch=c<max_id>``) and remove the originals. Past ~10^4
        shards the per-read file listing and union fan-in dominate the
        corpus read; compaction restores O(1) dirs and composes with the
        atomic rename-publish (extensions/staging.py), so a reader only
        ever sees complete artifacts. The transient window where the
        consolidated dir and the originals coexist (crash between
        publish and cleanup, or a checkpoint-replayed micro-batch
        re-publishing a compacted id) double-counts corpus ROWS but can
        never change an ANSWER: the corpus side of incremental semantic
        dedup is an existential near-neighbor test, insensitive to
        duplicates, and the next compaction folds the stragglers in.
        Returns the number of dirs compacted away (0 = nothing to do)."""
        import re

        from timeseries_spark.extensions.staging import _publish_atomic

        dirs = self._accepted_batches(spark)
        if len(dirs) < 2:
            return 0
        max_id = max(
            int(re.search(r"batch=c?(\d+)$", d).group(1)) for d in dirs
        )
        out = f"{self.accepted_dir}/batch=c{max_id}"
        merged = spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            merged = merged.unionByName(spark.read.parquet(d))
        _publish_atomic(
            lambda tmp: merged.write.mode("overwrite").parquet(tmp), out
        )
        jvm = spark.sparkContext._jvm
        fs = jvm.org.apache.hadoop.fs.Path(self.accepted_dir).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        removed = 0
        for d in dirs:
            if d == out:
                continue  # the collision case: out replaced an old c-dir
            fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
            removed += 1
        return removed

    def run(self, shard_stream: DataFrame):
        """Attach the sink and drain everything currently available."""
        q = (
            shard_stream.writeStream.foreachBatch(self.process)
            .option(
                "checkpointLocation", f"{self.accepted_dir}/_checkpoint"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q


def run_incremental(
    new_evidence_stream: DataFrame, sink: IncrementalAssociationSink
):
    """Attach the sink and drain everything currently available."""
    q = (
        new_evidence_stream.writeStream.foreachBatch(sink.process)
        .option("checkpointLocation", f"{sink.assoc_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def attribute_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    max_delay: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to every
    click by the same user within ``max_delay`` BEFORE it — the
    canonical conversion-attribution join. In streaming mode both sides
    carry watermarks and the join condition is time-bounded, so Spark
    can expire buffered state: per-key state is max_delay + watermark
    of events, never unbounded. Batch mode computes the identical
    result (nothing is late at rest), which is what the DuckDB oracle
    gates. Output: (user_id, click_id, purchase_id, value, delay_us).
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if streaming:
        c = c.withWatermark("click_ts", "2 hours")
        p = p.withWatermark("purchase_ts", "2 hours")
    cond = (
        (c.user_id == p.p_user_id)
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return c.join(p, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        "value",
        # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike and
        # never round-trips through the session zone (a cast-to-TIMESTAMP
        # pair would shift each side by ITS OWN utc offset — off by an
        # hour across a DST transition)
        F.expr(
            "timestampdiff(MICROSECOND, click_ts, purchase_ts)"
        ).alias("delay_us"),
    )
