"""Round-8 additions: sweep_index multi-process guard, legacy-layout
append refusal, and this round's new declared operators."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_sweep_index_min_age_skips_fresh_dirs(spark, tmp_path):
    """ADVICE r7 (medium): sweep_index run while ANOTHER process is
    mid-compact must not delete that run's fresh staging dir or resolve
    its fresh asides — min_age_s skips anything younger, exactly like
    HourlyRollup.sweep."""
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 4)
    idx = similarity.build_cell_index(
        emb.filter(F.col("vec_id") < 40), centroids, str(tmp_path / "ivf")
    )
    # simulate a concurrent compact mid-window: live cell renamed aside,
    # staging dir (with manifest) holds the replacement
    cells = [n for n in os.listdir(idx) if n.startswith("cell_id=")]
    cell = cells[0][len("cell_id="):]
    staged_root = f"{idx}_compact_99999"
    os.makedirs(os.path.join(staged_root, f"cell_id={cell}"))
    with open(
        os.path.join(staged_root, f"cell_id={cell}", "_absorbed.json"), "w"
    ) as f:
        f.write('{"batches": []}')
    os.rename(
        os.path.join(idx, f"cell_id={cell}"),
        os.path.join(idx, f"_old_cell_{cell}_99999"),
    )

    # fresh dirs + a large min_age: sweep must touch NOTHING
    rep = similarity.sweep_index(idx, min_age_s=3600)
    assert rep == {"restored": [], "reclaimed": []}
    assert os.path.isdir(os.path.join(idx, f"_old_cell_{cell}_99999"))
    assert os.path.isdir(staged_root)

    # min_age_s=0 (single-process recovery): forward-finish + reclaim
    rep = similarity.sweep_index(idx, min_age_s=0)
    assert f"_old_cell_{cell}_99999" in rep["restored"]
    assert os.path.isdir(os.path.join(idx, f"cell_id={cell}"))
    assert not os.path.isdir(staged_root)


def test_append_refuses_legacy_single_level_layout(spark, tmp_path):
    """ADVICE r7: appending two-level (cell_id, batch_id) partitions into
    a legacy single-level cell_id= index would create a mixed layout that
    Spark's partition discovery rejects on the NEXT read — the append
    must fail loudly at write time instead."""
    from execute_sync_spark.functions import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centroids = emb.filter(F.col("vec_id") < 4)
    legacy = str(tmp_path / "legacy_ivf")
    # the pre-append layout: cell_id= partitions only, data files directly
    # inside (what build_cell_index wrote before batch_id existed)
    similarity.assign_cells(
        emb.filter(F.col("vec_id") < 40), centroids
    ).write.partitionBy("cell_id").parquet(legacy)

    new = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 50))
    with pytest.raises(ValueError, match="legacy"):
        similarity.append_cell_index(new, centroids, legacy, batch_id=1)
    # the legacy index is untouched — still readable single-level
    assert spark.read.parquet(legacy).count() == 40
