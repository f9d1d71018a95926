"""Category blocklist: verdict semantics vs the python twin, plan width."""

from pyspark.sql import functions as F

from dq import blocklist


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run(spark, rows):
    df = blocklist.doc_blocklist_verdicts(
        _docs(spark, rows), blocklist.blocklist_frame(spark)
    )
    return {r.doc_id: r for r in df.collect()}


def test_verdicts_match_python_twin(spark):
    rows = [
        (0, "plain words only here"),
        (1, "visit our casino jackpot roulette tonight"),     # dense soft
        (2, "one viagra mention in a long enough document " + "filler " * 60),
        (3, "pornhub link"),                                   # hard
        (4, None),
        (5, ""),
        (6, "casino " * 3 + "pornhub " + "warez"),             # hard + soft mix
        (7, "CASINO Jackpot"),                                 # case folding
    ]
    got = sorted(tuple(r) for r in _run(spark, rows).values())
    want = sorted(blocklist.verdicts_py(rows))
    assert got == want


def test_hard_hit_always_drops(spark):
    out = _run(spark, [(0, "a perfectly fine page mentioning pornhub once " + "x " * 500)])
    r = out[0]
    assert r.hard_hits == 1 and not r.keep
    # density is irrelevant for hard categories
    assert r.soft_bp <= blocklist.SOFT_MAX_BP


def test_soft_ratio_both_branches(spark):
    dense = "casino jackpot roulette casino"                   # 4/4 tokens
    sparse = "casino " + "word " * 200                          # 1/201 tokens
    out = _run(spark, [(0, dense), (1, sparse)])
    assert not out[0].keep and out[0].soft_bp > blocklist.SOFT_MAX_BP
    assert out[1].keep and out[1].soft_bp <= blocklist.SOFT_MAX_BP


def test_null_and_empty_text_kept(spark):
    out = _run(spark, [(0, None), (1, "")])
    for r in out.values():
        assert (r.n_tokens, r.hard_hits, r.soft_hits, r.soft_bp) == (0, 0, 0, 0)
        assert r.keep is True


def test_category_hits_long_form(spark):
    rows = [(0, "casino viagra casino"), (1, "clean text")]
    hits = blocklist.doc_category_hits(
        _docs(spark, rows), blocklist.blocklist_frame(spark)
    ).collect()
    got = {(r.doc_id, r.category): r.n_hits for r in hits}
    assert got == {(0, "gambling"): 2, (0, "pharma"): 1}


def test_no_text_in_exchange(spark):
    """The only exchange carries (doc_id, partial counts) — the document
    text never shuffles."""
    df = blocklist.doc_blocklist_verdicts(
        _docs(spark, [(0, "casino words")]), blocklist.blocklist_frame(spark)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.split("\n"):
        if "Exchange" in line and "hashpartitioning" in line:
            assert "text" not in line, line
