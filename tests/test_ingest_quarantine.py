"""Raw-file ingestion with corrupt-record quarantine.

The landing step in front of the staging surface: PERMISSIVE parse
against an explicit schema, one-pass split into good parquet +
quarantined raw lines, gate on bad fraction, replay after a fix.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from goe_spark.sources.ingest_files import (
    CORRUPT_COL,
    IngestValidationError,
    ingest_with_quarantine,
    quarantine_summary,
    read_with_quarantine,
    replay_quarantine,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en"},
    {"doc_id": 2, "text": "hola mundo", "lang": "es"},
    {"doc_id": 3, "text": "bonjour", "lang": "fr"},
]
BAD_LINES = ['{"doc_id": 4, "text": "truncated', "plainly not json at all"]


@pytest.fixture
def jsonl_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    with open(d / "part1.jsonl", "w") as f:
        for rec in GOOD[:2]:
            f.write(json.dumps(rec) + "\n")
        f.write(BAD_LINES[0] + "\n")
    with open(d / "part2.jsonl", "w") as f:
        f.write(json.dumps(GOOD[2]) + "\n")
        f.write(BAD_LINES[1] + "\n")
    return str(d)


def test_read_classifies_good_and_bad(spark, jsonl_dir):
    df = read_with_quarantine(spark, jsonl_dir, SCHEMA)
    good = df.where(F.col(CORRUPT_COL).isNull())
    bad = df.where(F.col(CORRUPT_COL).isNotNull())
    assert good.count() == 3
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 3]
    assert sorted(r[CORRUPT_COL] for r in bad.collect()) == sorted(BAD_LINES)


def test_ingest_splits_and_reports(spark, jsonl_dir, tmp_path):
    rep = ingest_with_quarantine(
        spark,
        jsonl_dir,
        SCHEMA,
        good_path=str(tmp_path / "good"),
        quarantine_path=str(tmp_path / "quar"),
    )
    assert (rep.n_good, rep.n_bad) == (3, 2)
    assert abs(rep.bad_fraction - 0.4) < 1e-9
    landed = spark.read.parquet(rep.good_path)
    assert landed.count() == 3
    assert CORRUPT_COL not in landed.columns
    quar = spark.read.json(rep.quarantine_path)
    assert sorted(r.raw_record for r in quar.collect()) == sorted(BAD_LINES)
    # provenance: each quarantined line knows its source file
    files = {os.path.basename(r._source_file) for r in quar.collect()}
    assert files == {"part1.jsonl", "part2.jsonl"}
    summ = {
        os.path.basename(r.source_file): r.n_bad
        for r in quarantine_summary(spark, rep.quarantine_path).collect()
    }
    assert summ == {"part1.jsonl": 1, "part2.jsonl": 1}


def test_gate_rejects_excessive_bad_fraction(spark, jsonl_dir, tmp_path):
    with pytest.raises(IngestValidationError, match="0.4000 exceeds"):
        ingest_with_quarantine(
            spark,
            jsonl_dir,
            SCHEMA,
            good_path=str(tmp_path / "good"),
            quarantine_path=str(tmp_path / "quar"),
            max_bad_fraction=0.25,
        )
    # the gate fired before either sink was written
    assert not os.path.exists(tmp_path / "good")
    assert not os.path.exists(tmp_path / "quar")


def test_replay_after_fix(spark, jsonl_dir, tmp_path):
    rep = ingest_with_quarantine(
        spark,
        jsonl_dir,
        SCHEMA,
        good_path=str(tmp_path / "good"),
        quarantine_path=str(tmp_path / "quar"),
    )
    replayed = replay_quarantine(spark, rep.quarantine_path, SCHEMA)
    # nothing was fixed upstream, so everything stays corrupt
    assert replayed.where(F.col(CORRUPT_COL).isNull()).count() == 0
    # widen the schema's contract: simulate an upstream fix by
    # rewriting the quarantine with repaired lines, then replay clean
    fixed = [
        {"raw_record": '{"doc_id": 4, "text": "truncated", "lang": "en"}'},
        {"raw_record": '{"doc_id": 5, "text": "ok", "lang": "en"}'},
    ]
    fixdir = tmp_path / "quar_fixed"
    fixdir.mkdir()
    with open(fixdir / "f.json", "w") as f:
        for rec in fixed:
            f.write(json.dumps(rec) + "\n")
    replayed2 = replay_quarantine(spark, str(fixdir), SCHEMA)
    assert replayed2.where(F.col(CORRUPT_COL).isNotNull()).count() == 0
    assert sorted(r.doc_id for r in replayed2.collect()) == [4, 5]


def test_csv_quarantine(spark, tmp_path):
    d = tmp_path / "csv_in"
    d.mkdir()
    with open(d / "a.csv", "w") as f:
        f.write("1,alpha,en\n")
        f.write("2,beta\n")  # missing column -> malformed
        f.write("notanumber,gamma,fr\n")  # type mismatch -> malformed
    df = read_with_quarantine(spark, str(d), SCHEMA, fmt="csv")
    assert df.where(F.col(CORRUPT_COL).isNull()).count() == 1
    assert df.where(F.col(CORRUPT_COL).isNotNull()).count() == 2


def test_schema_must_not_predeclare_corrupt_col(spark, tmp_path):
    # build a COPY: StructType.add mutates (and returns) the receiver,
    # which would pollute the shared SCHEMA for every later test
    bad_schema = StructType(
        SCHEMA.fields + [StructField(CORRUPT_COL, StringType())]
    )
    with pytest.raises(ValueError, match="must not pre-declare"):
        read_with_quarantine(spark, str(tmp_path), bad_schema)


def test_cli_ingest_command(spark, jsonl_dir, tmp_path, capsys, monkeypatch):
    import json as _json

    from goe_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda name: spark)
    rc = cli.main(
        [
            "ingest",
            "--input", jsonl_dir,
            "--schema", "doc_id BIGINT, text STRING, lang STRING",
            "--good-dir", str(tmp_path / "good"),
            "--quarantine-dir", str(tmp_path / "quar"),
        ]
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["n_good"] == 3 and out["n_bad"] == 2

    rc2 = cli.main(
        [
            "ingest",
            "--input", jsonl_dir,
            "--schema", "doc_id BIGINT, text STRING, lang STRING",
            "--good-dir", str(tmp_path / "good2"),
            "--quarantine-dir", str(tmp_path / "quar2"),
            "--max-bad-fraction", "0.1",
        ]
    )
    err = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc2 == 1 and "exceeds gate" in err["error"]


def test_clean_rerun_clears_stale_quarantine(spark, jsonl_dir, tmp_path):
    """Run with bad rows (quarantine written), then rerun over a CLEAN
    input to the same paths: the report says quarantine_path=None AND
    the old quarantine directory is gone from disk — an operator
    inspecting the path must not read a previous run's bad rows as
    current."""
    good_p = str(tmp_path / "good")
    quar_p = str(tmp_path / "quar")
    rpt1 = ingest_with_quarantine(
        spark, str(jsonl_dir), SCHEMA, good_p, quar_p
    )
    assert rpt1.n_bad > 0 and os.path.exists(quar_p)

    clean = tmp_path / "clean_in"
    clean.mkdir()
    with open(clean / "ok.jsonl", "w") as f:
        for rec in GOOD:
            f.write(json.dumps(rec) + "\n")
    rpt2 = ingest_with_quarantine(
        spark, str(clean), SCHEMA, good_p, quar_p
    )
    assert rpt2.n_bad == 0
    assert rpt2.quarantine_path is None
    assert not os.path.exists(quar_p)
