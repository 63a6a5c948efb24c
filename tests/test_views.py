"""View-forest golden + DuckDB-oracle tests (SURVEY §2.V, V1-V7).

The oracle SQL mirrors the reference's generated view semantics
(snowflake.go:314-379) in DuckDB JSON functions over the exact same landed
rows (table ``landing`` registered in conftest).
"""

import pytest
from pyspark.sql import functions as F

from execute_sync_spark.operators import latest, create_views
from tests.util import assert_df_equal

D2_SQL = """
    SELECT ed.* FROM (
        SELECT ed.* FROM landing ed
        JOIN (SELECT type, id, version, MAX(batch_date) AS batch_date
              FROM landing GROUP BY type, id, version) k
        USING (type, id, version, batch_date)
    ) ed
    JOIN (SELECT type, id, MAX(version) AS version
          FROM landing GROUP BY type, id) k2
    USING (type, id, version)
"""


@pytest.fixture(scope="module")
def views(landed, root_schema):
    df, con = landed
    return create_views(latest(df), root_schema, register=True), con


AFE_ORACLE = f"""
    SELECT id AS DOCUMENT_ID, deleted AS _DELETED, author AS _AUTHOR,
           version AS _VERSION, date AS _DATE,
           json_extract_string(data, '$.AFE_NUMBER') AS AFE_NUMBER,
           json_extract_string(data, '$.WELL_UWI') AS WELL_UWI,
           json_extract_string(data, '$.EXT_GUID') AS EXT_GUID,
           CAST(json_extract(data, '$.LINE_COUNT') AS BIGINT) AS LINE_COUNT,
           CAST(json_extract(data, '$.ESTIMATE') AS DOUBLE) AS ESTIMATE,
           CAST(json_extract(data, '$.IS_CAPITAL') AS BOOLEAN) AS IS_CAPITAL,
           CAST(json_extract_string(data, '$.SPUD_DATE') AS TIMESTAMP) AS SPUD_DATE,
           timezone('UTC', CAST(json_extract_string(data, '$.APPROVED_AT') AS TIMESTAMPTZ)) AS APPROVED_AT,
           json_extract_string(data, '$.OPERATOR.DOCUMENT_ID') AS OPERATOR,
           json_extract_string(data, '$.RETIRED_FLD') AS RETIRED_FLD,
           CAST(json_extract(data, '$.EST_TOTAL') AS DOUBLE) AS EST_TOTAL
    FROM ({D2_SQL}) WHERE type = 'AFE' AND chunk = 0
"""


def test_afe_root_view(views, landed):
    vs, con = views
    assert_df_equal(vs["AFE"], con.sql(AFE_ORACLE), "AFE")
    # golden spot-checks
    rows = {r.DOCUMENT_ID: r for r in vs["AFE"].collect()}
    assert len(rows) == 3
    assert rows["afe-0001"]._VERSION == 2 and rows["afe-0001"].ESTIMATE == 125000.5
    assert rows["afe-0002"]._DELETED is True
    assert rows["afe-0001"].OPERATOR == "vnd-01"
    assert rows["afe-0003"].LINE_COUNT is None


def test_afe_details_views(views):
    vs, con = views
    oracle = f"""
        SELECT id AS DOCUMENT_ID,
               json_extract_string(data, '$.DETAILS.COST_CENTER') AS COST_CENTER,
               CAST(json_extract(data, '$.DETAILS.DEPTH_M') AS DOUBLE) AS DEPTH_M
        FROM ({D2_SQL}) WHERE type = 'AFE' AND chunk = 0
    """
    assert_df_equal(vs["AFE_DETAILS"], con.sql(oracle), "AFE_DETAILS")
    oracle_audit = f"""
        SELECT id AS DOCUMENT_ID,
               CAST(json_extract(data, '$.DETAILS.AUDIT.REVIEWED') AS BOOLEAN) AS REVIEWED
        FROM ({D2_SQL}) WHERE type = 'AFE' AND chunk = 0
    """
    assert_df_equal(vs["AFE_DETAILS_AUDIT"], con.sql(oracle_audit), "AFE_DETAILS_AUDIT")


def test_afe_partners_flatten(views):
    vs, con = views
    oracle = f"""
        SELECT id AS DOCUMENT_ID,
               json_extract_string(u, '$.LISTITEM_ID') AS LISTITEM_ID,
               json_extract_string(u, '$.PARTNER.DOCUMENT_ID') AS PARTNER,
               CAST(json_extract(u, '$.SHARE') AS DOUBLE) AS SHARE
        FROM (SELECT id, unnest(CAST(json_extract(data, '$.PARTNERS') AS JSON[])) AS u
              FROM ({D2_SQL}) WHERE type = 'AFE')
    """
    assert_df_equal(vs["AFE_PARTNERS"], con.sql(oracle), "AFE_PARTNERS")
    rows = vs["AFE_PARTNERS"].orderBy("LISTITEM_ID").collect()
    assert [r.LISTITEM_ID for r in rows] == ["li-1", "li-2"]
    assert rows[0].PARTNER == "vnd-01" and rows[0].SHARE == 0.6


def test_record_under_list(views):
    vs, con = views
    oracle = f"""
        SELECT id AS DOCUMENT_ID,
               json_extract_string(u, '$.LISTITEM_ID') AS LISTITEM_ID,
               json_extract_string(u, '$.NOTE.KIND') AS KIND
        FROM (SELECT id, unnest(CAST(json_extract(data, '$.PARTNERS') AS JSON[])) AS u
              FROM ({D2_SQL}) WHERE type = 'AFE')
    """
    assert_df_equal(vs["AFE_PARTNERS_NOTE"], con.sql(oracle), "AFE_PARTNERS_NOTE")


def test_ticket_chunked_list_union(views):
    """V6 must union list slices across chunk rows (snowflake.go:369-371
    inverse): 25 LINES landed as chunks 1..3 all reappear."""
    vs, con = views
    oracle = f"""
        SELECT id AS DOCUMENT_ID,
               json_extract_string(u, '$.LISTITEM_ID') AS LISTITEM_ID,
               CAST(json_extract(u, '$.QTY') AS BIGINT) AS QTY,
               CAST(json_extract(u, '$.COST') AS DOUBLE) AS COST
        FROM (SELECT id, unnest(CAST(json_extract(data, '$.LINES') AS JSON[])) AS u
              FROM ({D2_SQL}) WHERE type = 'TICKET')
    """
    assert_df_equal(vs["TICKET_LINES"], con.sql(oracle), "TICKET_LINES")
    assert vs["TICKET_LINES"].count() == 25
    # scalar view reads chunk 0 only -> exactly one TICKET row
    assert vs["TICKET"].count() == 1
    assert vs["TICKET"].first().SUBJECT == "large ticket"


def test_vendor_fk_join(views, spark):
    vs, _ = views
    joined = (
        vs["AFE"]
        .join(vs["VENDOR"], vs["AFE"].OPERATOR == vs["VENDOR"].DOCUMENT_ID)
        .select("AFE_NUMBER", "VENDOR_NAME")
        .collect()
    )
    assert [(r.AFE_NUMBER, r.VENDOR_NAME) for r in joined] == [("AFE-001", "Acme Drilling")]


def test_unknown_doc_type_not_compiled(views):
    vs, _ = views
    assert "WIDGET" not in vs  # landed but not in schema -> no view


def test_views_registered_for_sql(views, spark):
    vs, _ = views
    n = spark.sql(
        "SELECT count(*) AS n FROM AFE_PARTNERS p JOIN AFE a USING (DOCUMENT_ID)"
    ).first().n
    assert n == 2
