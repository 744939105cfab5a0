"""JSONL/CSV corpus-drop readers: schema-first parse, quarantine path,
identifier lowercasing, derived n_chars."""

from __future__ import annotations

import json


def test_jsonl_reader_good_and_quarantine(spark, tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1"}),
        json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}),
        "{not valid json",                                   # parse-corrupt
        json.dumps({"doc_id": None, "text": "orphan"}),      # null key
        json.dumps({"doc_id": 5, "lang": "en"}),             # missing text
    ]
    p = tmp_path / "drop.jsonl"
    p.write_text("\n".join(lines) + "\n")

    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_jsonl,
    )

    good, bad = read_documents_jsonl(spark, str(p), quarantine=True)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_chars"] == len("hello world")
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert bad.count() == 3
    raws = [r["raw_record"] for r in bad.collect()]
    assert any("not valid json" in r for r in raws)


def test_jsonl_reader_lowercases_identifiers(spark, tmp_path):
    import pyspark.sql.types as T

    p = tmp_path / "mixed.jsonl"
    p.write_text(json.dumps({"Doc_ID": 7, "Text": "MiXeD", "Lang": "en", "Source": "x"}) + "\n")
    schema = T.StructType(
        [
            T.StructField("Doc_ID", T.LongType()),
            T.StructField("Text", T.StringType()),
            T.StructField("Lang", T.StringType()),
            T.StructField("Source", T.StringType()),
        ]
    )
    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_jsonl,
    )

    got = read_documents_jsonl(spark, str(p), schema)
    assert got.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert got.first()["doc_id"] == 7


def test_csv_reader_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        "1,alpha beta,en,s1\n"
        "2,gamma,en,s2\n"
        "notanumber,oops,en,s3\n"   # doc_id fails the long parse
        ",missing key,en,s4\n"
    )
    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_csv,
    )

    good, bad = read_documents_csv(spark, str(p), quarantine=True)
    ids = sorted(r["doc_id"] for r in good.collect())
    assert ids == [1, 2]
    assert bad.count() == 2


def test_readers_feed_text_operators(spark, tmp_path):
    """The normalized output drops straight into the text/corpus operator
    family (same shape as the documents table)."""
    p = tmp_path / "drop.jsonl"
    p.write_text(
        "\n".join(
            json.dumps(
                {"doc_id": i, "text": "the a of and to spark table", "lang": "en", "source": "s"}
            )
            for i in range(4)
        )
    )
    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_jsonl,
    )
    import pyspark.sql.functions as F
    from priority_data_pipeline_postgres_db_spark.operators.dedup import (
        exact_dedup,
        normalized_text,
    )

    docs = read_documents_jsonl(spark, str(p))
    # identical texts: exact dedup keeps one survivor
    got = exact_dedup(docs, F.md5(normalized_text()), "doc_id", ["doc_id"])
    assert got.count() == 1 and got.first()["doc_id"] == 0


def test_read_documents_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC drop: parquet fixture → ORC → reader yields identical rows;
    extra columns pruned, missing columns fail fast."""
    import pytest

    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_orc,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    drop = f"{tmp_path}/drop_orc"
    docs.withColumn("extra", docs.doc_id * 2).withColumnRenamed(
        "doc_id", "DOC_ID"
    ).write.orc(drop)
    got = read_documents_orc(spark, drop)
    assert got.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert got.count() == docs.count()
    a = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source").collect()}
    b = {tuple(r) for r in got.select("doc_id", "text", "lang", "source").collect()}
    assert a == b

    bad = f"{tmp_path}/drop_orc_bad"
    docs.drop("text").write.orc(bad)
    with pytest.raises(ValueError, match="text"):
        read_documents_orc(spark, bad)


def test_read_documents_text_one_doc_per_line(spark, tmp_path):
    """Raw text drop: blank lines dropped, content-hash ids are stable
    across re-lands and collapse byte-identical lines."""
    from priority_data_pipeline_postgres_db_spark.sources.files import (
        read_documents_text,
    )

    p = tmp_path / "drop.txt"
    p.write_text("alpha beta\n\n  \ngamma delta\nalpha beta\n")
    got = read_documents_text(spark, str(p), source="crawl1").collect()
    assert len(got) == 3  # blanks dropped, dup line kept as a row
    by_text = {}
    for r in got:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
        assert r["source"] == "crawl1" and r["lang"] is None
        assert r["n_chars"] == len(r["text"])
        # identity carries the FULL 128-bit md5 (collision-safe at
        # billion-doc scale), not the 60-bit LSH-style truncation
        assert len(r["doc_id"]) == 32 and int(r["doc_id"], 16) >= 0
    assert len(set(by_text["alpha beta"])) == 1  # same content → same id
    again = read_documents_text(spark, str(p), source="crawl1").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in got}
