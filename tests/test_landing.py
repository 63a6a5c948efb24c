import json

from pyspark.sql import functions as F

from tests.fixtures import feed


def test_landing_counts_and_parse_skip(landed):
    df, _ = landed
    # batch1: 4 valid docs (malformed line skipped)
    b1 = df.filter(F.col("batch_date") == feed.BATCH_DATES[0])
    assert b1.count() == 4
    # batch2: 5 docs, tkt-0001 split into chunk 0 + 3 chunk rows (25 items @ 10)
    b2 = df.filter(F.col("batch_date") == feed.BATCH_DATES[1])
    assert b2.count() == 5 + 3
    # unknown doc type still lands (views just won't cover it)
    assert b2.filter(F.col("type") == "WIDGET").count() == 1


def test_metadata_extraction(landed):
    df, _ = landed
    row = df.filter(
        (F.col("id") == "afe-0002") & (F.col("version") == 3)
    ).first()
    assert row.type == "AFE"
    assert row.deleted is True
    assert row.author == "u-7"
    assert row.date is not None
    assert row.chunk == 0


def test_chunk_split_shapes(landed):
    df, _ = landed
    tkt = df.filter(F.col("id") == "tkt-0001").orderBy("chunk").collect()
    assert [r.chunk for r in tkt] == [0, 1, 2, 3]
    # chunk 0 has the list removed but keeps metadata + SUBJECT
    doc0 = json.loads(tkt[0].data)
    assert "LINES" not in doc0
    assert doc0["SUBJECT"] == "large ticket"
    # chunk rows carry only {DOCUMENT_ID, LINES: slice}
    doc1 = json.loads(tkt[1].data)
    assert set(doc1.keys()) == {"DOCUMENT_ID", "LINES"}
    assert [len(json.loads(r.data)["LINES"]) for r in tkt[1:]] == [10, 10, 5]
    # all chunk rows share the PK prefix
    assert all(r.version == 1 and r.type == "TICKET" for r in tkt)


def test_small_lists_not_chunked(landed):
    df, _ = landed
    afe1 = df.filter((F.col("id") == "afe-0001") & (F.col("version") == 2))
    assert afe1.select("chunk").distinct().collect()[0].chunk == 0
    doc = json.loads(afe1.first().data)
    assert len(doc["PARTNERS"]) == 2  # 2 <= CHUNK_SIZE, untouched


def test_csv_stage_roundtrip(spark, tmp_path):
    """The reference's bulk-load wire format (quoted CSV, snowflake.go
    temp-CSV -> PUT -> COPY): a landing batch staged as CSV and read back
    with the landing schema is bit-identical — including JSON payloads full
    of quotes, commas, and unicode."""
    from execute_sync_spark.landing import land_ndjson_lines
    from execute_sync_spark.landing.stage import read_csv_stage, write_csv_stage
    from tests.fixtures import feed

    batches = [
        land_ndjson_lines(spark, lines, bd, chunk_size=10)
        for lines, bd in zip(feed.batch_lines(), feed.BATCH_DATES)
    ]
    landing = batches[0]
    for b in batches[1:]:
        landing = landing.unionByName(b)

    path = str(tmp_path / "stage_csv")
    write_csv_stage(landing, path)
    back = read_csv_stage(spark, path)
    orig = sorted(map(tuple, landing.collect()))
    rt = sorted(map(tuple, back.collect()))
    assert rt == orig
