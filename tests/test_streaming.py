"""Streaming pipeline: batch parity, watermarked dedup, exactly-once resume."""

import pytest
from pyspark.sql import functions as F

from dq import streaming
from dq.pipeline import enrich


@pytest.fixture(scope="module")
def staged_pages(spark, pages, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    pages.write.mode("overwrite").parquet(str(d / "drop1"))
    return str(d / "drop1")


def test_stream_matches_batch_keep_counts(spark, pages, staged_pages, tmp_path):
    q = streaming.run_stream(
        spark, staged_pages, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "out"))
    # batch reference: same keep logic; batch dedup keeps 1 survivor per
    # text, streaming dropDuplicates keeps 1 arrival per content hash ->
    # identical KEPT COUNT per partition (survivor identity may differ)
    b = enrich(pages.drop("html"), verify_extraction=False)
    want = b.where("keep").groupBy("dt_foto").count().orderBy("dt_foto").collect()
    have = got.groupBy("dt_foto").count().orderBy("dt_foto").collect()
    assert [(r.dt_foto, r["count"]) for r in have] == [(r.dt_foto, r["count"]) for r in want]


def test_stream_ledger_dedup_across_runs(spark, tmp_path):
    """Cross-RUN dedup through the durable fingerprint ledger: a second
    stream run sees a re-crawl of run-1 content under a new url and drops
    it — beyond the watermark horizon dropDuplicatesWithinWatermark covers.
    The ledger accumulates exactly one fingerprint per distinct content."""
    from dq.pipeline import PipelineConfig
    from dq import heuristics

    permissive = PipelineConfig(
        target_lang=None,
        max_perplexity=float("inf"),
        thresholds={
            **heuristics.THRESHOLDS,
            "min_words": 0, "min_mean_word_len": 0.0, "max_mean_word_len": 1e9,
            "max_symbol_ratio": 1.0, "min_stop_ratio": 0.0,
            "min_distinct_stops": 0, "max_dup_line_ratio": 1.0,
            "max_ellipsis_line_ratio": 1.0, "min_alpha_word_ratio": 0.0,
        },
    )
    in_dir = str(tmp_path / "in")
    out, ck, ledger = (str(tmp_path / d) for d in ("out", "ck", "ledger"))
    alpha = "alpha content prose " * 10
    beta = "beta content prose " * 10

    def drop(name, rows):
        df = spark.createDataFrame(rows, "url string, warc_ts string, text string").withColumn(
            "warc_ts", F.to_timestamp("warc_ts")
        ).withColumn("html", F.lit(None).cast("binary")).withColumn("lang", F.lit("en"))
        df.select("url", "warc_ts", "html", "text", "lang").write.parquet(f"{in_dir}/{name}")

    drop("d1", [("u://1", "2024-03-01 01:00:00", alpha),
                ("u://2", "2024-03-01 02:00:00", beta),
                ("u://3", "2024-03-01 03:00:00", alpha)])  # within-batch dup
    # the file source does not recurse into per-drop subdirs: glob them
    q1 = streaming.run_stream_with_ledger(spark, f"{in_dir}/*", out, ck, ledger, config=permissive)
    q1.awaitTermination(120)
    kept1 = {r.url for r in spark.read.parquet(out).collect()}
    assert kept1 == {"u://1", "u://2"}
    # run 2: new file with fresh content + a re-crawl of alpha
    drop("d2", [("u://4", "2024-03-10 01:00:00", "gamma content prose " * 10),
                ("u://5", "2024-03-10 02:00:00", alpha)])
    q2 = streaming.run_stream_with_ledger(spark, f"{in_dir}/*", out, ck, ledger, config=permissive)
    q2.awaitTermination(120)
    kept2 = {r.url for r in spark.read.parquet(out).collect()}
    assert kept2 == {"u://1", "u://2", "u://4"}  # the alpha re-crawl dropped
    assert spark.read.parquet(ledger).distinct().count() == 3  # alpha, beta, gamma


def test_stream_resume_no_duplicates(spark, staged_pages, tmp_path):
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q1 = streaming.run_stream(spark, staged_pages, out, ck)
    q1.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    # restart over the same input + checkpoint: nothing new to process
    q2 = streaming.run_stream(spark, staged_pages, out, ck)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_streaming_lineage_window(spark, pages, staged_pages, tmp_path):
    # complete mode emits every window (append would hold back windows the
    # watermark hasn't passed — there is no later trigger to flush them)
    enriched = streaming.streaming_enrich(
        streaming.stream_pages(spark, staged_pages), dedup=False
    )
    lineage = streaming.streaming_lineage(enriched)
    q = (
        lineage.writeStream.format("memory")
        .queryName("lineage_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from lineage_mem order by dt_foto").collect()
    assert [r.dt_foto for r in got] == ["20240301", "20240302", "20240303", "20240305"]
    assert all(r.n_input == r.n_kept + r.n_dropped for r in got)


def test_domain_running_counts_state_survives_batches(spark, pages, tmp_path):
    """applyInPandasWithState: the per-domain counter accumulates ACROSS
    micro-batches (two file drops, maxFilesPerTrigger=1), and the final
    update per domain equals the batch ground truth."""
    from dq.streaming import domain_col, domain_running_counts, stream_pages

    in_dir = str(tmp_path / "in")
    half = pages.count() // 2
    pages.limit(half).write.mode("append").parquet(in_dir)
    pages.subtract(pages.limit(half)).write.mode("append").parquet(in_dir)

    counts = domain_running_counts(stream_pages(spark, in_dir, max_files_per_trigger=1))
    q = (
        counts.writeStream.format("memory")
        .queryName("domain_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select domain, max(n_docs) as n from domain_counts group by domain"
    ).toPandas().set_index("domain")["n"]
    want = (
        pages.select(domain_col().alias("domain"))
        .groupBy("domain").count().toPandas().set_index("domain")["count"]
    )
    assert got.sort_index().astype(int).to_dict() == want.sort_index().astype(int).to_dict()
    # state actually crossed batches: some domain must have been updated twice
    n_updates = spark.sql("select count(*) c from domain_counts").collect()[0].c
    assert n_updates > len(want)


def test_stream_neardup_ledger_drops_cross_run_near_copies(spark, tmp_path):
    """Cross-RUN near-dup suppression through the durable LSH band ledger:
    run 2 sees a near-copy (one appended word) of run-1 content under a new
    url and drops it; genuinely fresh content passes; within-run-1 docs all
    pass (first run has no prior)."""
    from dq import heuristics
    from dq.pipeline import PipelineConfig

    permissive = PipelineConfig(
        target_lang=None,
        max_perplexity=float("inf"),
        thresholds={
            **heuristics.THRESHOLDS,
            "min_words": 0, "min_mean_word_len": 0.0, "max_mean_word_len": 1e9,
            "max_symbol_ratio": 1.0, "min_stop_ratio": 0.0,
            "min_distinct_stops": 0, "max_dup_line_ratio": 1.0,
            "max_ellipsis_line_ratio": 1.0, "min_alpha_word_ratio": 0.0,
        },
    )
    in_dir = str(tmp_path / "in")
    out, ck, ledger = (str(tmp_path / d) for d in ("out", "ck", "ledger"))
    alpha = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
             "kilo lima mike november oscar papa quebec romeo sierra tango")
    fresh = ("uno dos tres cuatro cinco seis siete ocho nueve diez "
             "once doce trece catorce quince dieciseis diecisiete dieciocho")

    def drop(name, rows):
        df = spark.createDataFrame(
            rows, "url string, warc_ts string, text string"
        ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn(
            "html", F.lit(None).cast("binary")
        ).withColumn("lang", F.lit("en"))
        df.select("url", "warc_ts", "html", "text", "lang").write.parquet(
            f"{in_dir}/{name}"
        )

    drop("d1", [("u://1", "2024-03-01 01:00:00", alpha)])
    q1 = streaming.run_stream_with_neardup_ledger(
        spark, f"{in_dir}/*", out, ck, ledger, config=permissive
    )
    q1.awaitTermination(120)
    assert {r.url for r in spark.read.parquet(out).collect()} == {"u://1"}
    drop("d2", [("u://2", "2024-03-10 01:00:00", alpha + " extra"),  # near-copy
                ("u://3", "2024-03-10 02:00:00", fresh)])
    q2 = streaming.run_stream_with_neardup_ledger(
        spark, f"{in_dir}/*", out, ck, ledger, config=permissive
    )
    q2.awaitTermination(120)
    assert {r.url for r in spark.read.parquet(out).collect()} == {"u://1", "u://3"}


def test_stream_neardup_within_single_batch_keeps_one(spark, tmp_path):
    """WITHIN-batch near-dup suppression: a backlog drained in ONE
    micro-batch containing a near-copy family emits exactly one
    representative (the minimal url) — the band ledger alone only knows
    PRIOR batches, so without the in-batch pick the whole family would
    pass."""
    from dq import heuristics
    from dq.pipeline import PipelineConfig

    permissive = PipelineConfig(
        target_lang=None,
        max_perplexity=float("inf"),
        thresholds={
            **heuristics.THRESHOLDS,
            "min_words": 0, "min_mean_word_len": 0.0, "max_mean_word_len": 1e9,
            "max_symbol_ratio": 1.0, "min_stop_ratio": 0.0,
            "min_distinct_stops": 0, "max_dup_line_ratio": 1.0,
            "max_ellipsis_line_ratio": 1.0, "min_alpha_word_ratio": 0.0,
        },
    )
    in_dir = str(tmp_path / "in")
    out, ck, ledger = (str(tmp_path / d) for d in ("out", "ck", "ledger"))
    alpha = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
             "kilo lima mike november oscar papa quebec romeo sierra tango")
    fresh = ("uno dos tres cuatro cinco seis siete ocho nueve diez "
             "once doce trece catorce quince dieciseis diecisiete dieciocho")
    df = spark.createDataFrame(
        [("u://1", "2024-03-01 01:00:00", alpha),
         ("u://2", "2024-03-01 02:00:00", alpha + " extra"),  # in-batch near-copy
         ("u://3", "2024-03-01 03:00:00", fresh)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn(
        "html", F.lit(None).cast("binary")
    ).withColumn("lang", F.lit("en"))
    df.select("url", "warc_ts", "html", "text", "lang").write.parquet(f"{in_dir}/d1")

    q = streaming.run_stream_with_neardup_ledger(
        spark, f"{in_dir}/*", out, ck, ledger, config=permissive
    )
    q.awaitTermination(120)
    assert {r.url for r in spark.read.parquet(out).collect()} == {"u://1", "u://3"}


def test_stream_neardup_keeps_null_url_rows(spark, tmp_path):
    """Anti-join shape parity with the exact-ledger sibling: a NULL-url row
    that passes the keep gate is RETAINED (an inner join on url silently
    drops NULL keys — the two streaming variants must not diverge)."""
    from dq import heuristics
    from dq.pipeline import PipelineConfig

    permissive = PipelineConfig(
        target_lang=None,
        max_perplexity=float("inf"),
        thresholds={
            **heuristics.THRESHOLDS,
            "min_words": 0, "min_mean_word_len": 0.0, "max_mean_word_len": 1e9,
            "max_symbol_ratio": 1.0, "min_stop_ratio": 0.0,
            "min_distinct_stops": 0, "max_dup_line_ratio": 1.0,
            "max_ellipsis_line_ratio": 1.0, "min_alpha_word_ratio": 0.0,
        },
    )
    in_dir = str(tmp_path / "in")
    out, ck, ledger = (str(tmp_path / d) for d in ("out", "ck", "ledger"))
    df = spark.createDataFrame(
        [(None, "2024-03-01 01:00:00", "orphan prose without a url " * 8),
         ("u://1", "2024-03-01 02:00:00", "regular prose with a url here " * 8)],
        "url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts")).withColumn(
        "html", F.lit(None).cast("binary")
    ).withColumn("lang", F.lit("en"))
    df.select("url", "warc_ts", "html", "text", "lang").write.parquet(f"{in_dir}/d1")

    q = streaming.run_stream_with_neardup_ledger(
        spark, f"{in_dir}/*", out, ck, ledger, config=permissive
    )
    q.awaitTermination(120)
    assert {r.url for r in spark.read.parquet(out).collect()} == {None, "u://1"}
