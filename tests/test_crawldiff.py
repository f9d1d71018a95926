"""Crawl snapshot diff: planted statuses, null semantics, narrow exchange."""

from pyspark.sql import functions as F

from dq import crawldiff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_diff_all_four_statuses(spark):
    old = _snap(
        spark,
        [
            ("u/same", "alpha"),
            ("u/edit", "before"),
            ("u/gone", "bye"),
        ],
    )
    new = _snap(
        spark,
        [
            ("u/same", "alpha"),
            ("u/edit", "after"),
            ("u/new", "hi"),
        ],
    )
    out = {r.url: r for r in crawldiff.crawl_diff(old, new).collect()}
    assert out["u/same"].status == "unchanged"
    assert out["u/edit"].status == "changed"
    assert out["u/gone"].status == "removed" and out["u/gone"].new_fp is None
    assert out["u/new"].status == "added" and out["u/new"].old_fp is None


def test_null_text_diffs_with_dedup_sentinel(spark):
    # the SHARED null-safe fingerprint (dq.dedup.fingerprint_col): a
    # NULL-text url present in both crawls is 'unchanged' (never silently
    # dropped), while NULL vs '' is a real content change
    old = _snap(spark, [("u/null", None), ("u/became_empty", None)])
    new = _snap(spark, [("u/null", None), ("u/became_empty", "")])
    out = {r.url: r.status for r in crawldiff.crawl_diff(old, new).collect()}
    assert out == {"u/null": "unchanged", "u/became_empty": "changed"}


def test_planted_snapshots_statuses(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id bigint, text string"
    )
    old, new = crawldiff.planted_snapshots(
        docs, F.concat(F.lit("https://x/"), F.col("doc_id").cast("string"))
    )
    out = {r.url: r.status for r in crawldiff.crawl_diff(old, new).collect()}
    assert out["https://x/3"] == "added"        # 3 % 11 == OLD_DROP_REM
    assert out["https://x/5"] == "removed"      # 5 % 13 == NEW_DROP_REM
    assert out["https://x/2"] == "changed"      # 2 % 7 == CHANGED_REM
    assert out["https://x/1"] == "unchanged"
    counts = {
        r.status: r.n_urls
        for r in crawldiff.diff_counts(crawldiff.crawl_diff(old, new)).collect()
    }
    # ids dropped from old: 3,14,25,36; from new: 5,18,31; changed: 2,9,16,...
    assert counts["added"] == 4
    assert counts["removed"] == 3
    # changed = {2,9,16,23,30,37} minus any dropped id (none overlap here)
    assert counts["changed"] == 6
    assert sum(counts.values()) == 40 + 0  # full outer covers every url once


def test_diff_counts_four_rows_only(spark):
    old = _snap(spark, [("u/a", "x"), ("u/b", "y")])
    new = _snap(spark, [("u/a", "x"), ("u/c", "z")])
    out = crawldiff.diff_counts(crawldiff.crawl_diff(old, new))
    assert {r.status for r in out.collect()} <= {
        "added",
        "removed",
        "changed",
        "unchanged",
    }


def test_token_drift_surfaces_planted_churn(spark):
    """The planted CHANGED_SUFFIX tokens are absent from the old snapshot
    and present in the new one — they must rank at the very top of the
    drift report; every figure is integer-exact."""
    from dq.crawldiff import DRIFT_TOP_K, planted_snapshots, token_drift_topk
    from dq.urlstats import url_expr
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old, new = planted_snapshots(docs, url_expr(F.col("doc_id")))
    rows = token_drift_topk(old, new).collect()
    assert 0 < len(rows) <= DRIFT_TOP_K
    planted = {"[revised", "edition]"}
    top2 = {r.token for r in rows[:2]}
    assert top2 == planted
    for r in rows:
        assert r.drift_score >= 0 and isinstance(r.drift_score, int)
        if r.token in planted:
            assert r.n_old == 0 and r.n_new > 0 and r.old_bp == 0


def test_token_drift_zero_on_identical_snapshots(spark):
    """Same corpus on both sides: every token's drift is exactly zero (the
    cross-multiplication cancels — no float noise can leak in)."""
    from dq.crawldiff import token_drift_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = token_drift_topk(docs, docs).collect()
    assert rows and all(r.drift_score == 0 for r in rows)
    assert all(r.n_old == r.n_new for r in rows)


# ---- line churn -------------------------------------------------------------


def test_line_churn_identical_and_disjoint(spark):
    old = _snap(spark, [("u/same", "h\nb\nf"), ("u/rewrite", "a\nb")])
    new = _snap(spark, [("u/same", "h\nb\nf"), ("u/rewrite", "x\ny\nz")])
    out = {r.url: r for r in crawldiff.line_churn(old, new).collect()}
    assert out["u/same"].churn_bp == 0
    assert out["u/rewrite"].churn_bp == crawldiff.CHURN_BP
    assert (out["u/rewrite"].n_added, out["u/rewrite"].n_removed) == (3, 2)


def test_line_churn_one_line_edit(spark):
    old = _snap(spark, [("u", "h\nbody one\nf")])
    new = _snap(spark, [("u", "h\nbody two\nf")])
    r = crawldiff.line_churn(old, new).collect()[0]
    assert (r.n_old_lines, r.n_new_lines, r.n_added, r.n_removed) == (3, 3, 1, 1)
    assert r.churn_bp == 2 * crawldiff.CHURN_BP // 6


def test_line_churn_excludes_one_sided_urls(spark):
    old = _snap(spark, [("u/gone", "a"), ("u/both", "a")])
    new = _snap(spark, [("u/new", "a"), ("u/both", "a")])
    urls = {r.url for r in crawldiff.line_churn(old, new).collect()}
    assert urls == {"u/both"}


def test_line_churn_set_semantics_and_null(spark):
    # duplicate lines collapse (distinct-line units); NULL text is the
    # single empty line its split produces -- parity with the oracle
    old = _snap(spark, [("u/dup", "a\na\nb"), ("u/null", None)])
    new = _snap(spark, [("u/dup", "a\nb"), ("u/null", "x")])
    out = {r.url: r for r in crawldiff.line_churn(old, new).collect()}
    assert out["u/dup"].churn_bp == 0 and out["u/dup"].n_old_lines == 2
    r = out["u/null"]
    assert (r.n_old_lines, r.n_new_lines, r.n_added, r.n_removed) == (1, 1, 1, 1)
    assert r.churn_bp == crawldiff.CHURN_BP


def test_recrawl_bands_cover_all_churn(spark):
    # one url per band edge: 0 / 1 / 499 / 500 / 1999 / 2000 / 4999 / 5000+
    rows = [(f"u/{bp}", bp) for bp in (0, 1, 499, 500, 1999, 2000, 4999, 5000, 10000)]
    churn = spark.createDataFrame(
        [(u, 1, 1, 0, 0, bp) for u, bp in rows],
        "url string, n_old_lines bigint, n_new_lines bigint, "
        "n_added bigint, n_removed bigint, churn_bp bigint",
    )
    out = {r.url: r for r in crawldiff.recrawl_schedule(churn).collect()}
    want = {0: 30, 1: 14, 499: 14, 500: 7, 1999: 7, 2000: 3, 4999: 3,
            5000: 1, 10000: 1}
    for bp, days in want.items():
        r = out[f"u/{bp}"]
        assert r.interval_days == days, (bp, r.interval_days)
        assert r.daily_cost_bp == crawldiff.CHURN_BP // days
        assert r.next_fetch is not None and len(r.next_fetch) == 8
    # anchor math: churn 0 -> 30 days after 2024-03-01
    assert out["u/0"].next_fetch == "20240331"
    assert out["u/10000"].next_fetch == "20240302"
