"""Round-9 regressions: the three ADVICE r8 hardening items on the
persisted-ANN index lifecycle (`functions/similarity.py`), then the
round's new gated operators (added below as they land)."""

import os
import time

import pytest

from execute_sync_spark.functions import similarity as sim


# ---------------------------------------------------------------------------
# ADVICE r8 #2: _index_check_layout must scan ALL cells — an already-mixed
# index (legacy flat cell + two-level cell) must raise regardless of the
# order os.listdir happens to return the cells in.


def _mk_flat_cell(root, cell):
    p = os.path.join(root, f"cell_id={cell}")
    os.makedirs(p)
    with open(os.path.join(p, "part-0000.parquet"), "w") as f:
        f.write("x")


def _mk_batch_cell(root, cell):
    p = os.path.join(root, f"cell_id={cell}", "batch_id=b1")
    os.makedirs(p)
    with open(os.path.join(p, "part-0000.parquet"), "w") as f:
        f.write("x")


def test_layout_check_rejects_mixed_index_any_order(tmp_path):
    # two-level cell sorts FIRST (cell_id=0) so a first-hit short-circuit
    # would wrongly pass; the flat legacy cell must still be found
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _mk_batch_cell(root, 0)
    _mk_flat_cell(root, 1)
    with pytest.raises(ValueError, match="legacy single-level"):
        sim._index_check_layout(root)


def test_layout_check_passes_uniform_two_level(tmp_path):
    root = str(tmp_path / "idx")
    os.makedirs(root)
    _mk_batch_cell(root, 0)
    _mk_batch_cell(root, 1)
    sim._index_check_layout(root)  # no raise


# ---------------------------------------------------------------------------
# ADVICE r8 #1: the min_age_s freshness guard must gate on max(mtime,
# ctime) — os.rename(live, aside) preserves mtime, so an aside created
# seconds ago by a concurrent compact can carry an hours-old mtime. A
# freshly-renamed aside must NOT be swept inside the min_age_s window.


def test_sweep_min_age_uses_ctime_not_just_mtime(tmp_path):
    root = str(tmp_path / "idx")
    live = os.path.join(root, "cell_id=7")
    os.makedirs(live)
    aside = os.path.join(root, "_old_cell_7_12345")
    os.rename(live, aside)  # simulate compact's first rename (mtime preserved)
    old = time.time() - 3600
    os.utime(aside, (old, old))  # hours-old mtime; ctime stays "now"
    out = sim.sweep_index(root, min_age_s=60.0)
    # guard must treat the aside as FRESH (ctime is now) and leave it alone
    assert out == {"restored": [], "reclaimed": []}
    assert os.path.isdir(aside)
    # outside the window the same aside is rolled back to live
    out = sim.sweep_index(root, min_age_s=0.0)
    assert out["restored"] == ["_old_cell_7_12345"]
    assert os.path.isdir(os.path.join(root, "cell_id=7"))


# ---------------------------------------------------------------------------
# ADVICE r8 #3: at min_age_s=0 the sweep must process every aside
# unconditionally — the stat is skipped entirely, so even a dir whose
# stat would transiently fail cannot be silently skipped and left
# stranding its cell.


def test_sweep_default_age_skips_stat(tmp_path, monkeypatch):
    root = str(tmp_path / "idx")
    live = os.path.join(root, "cell_id=3")
    os.makedirs(live)
    os.rename(live, os.path.join(root, "_old_cell_3_999"))

    real_stat = os.stat

    def _boom(p, **kw):
        if "_old_cell_" in str(p) or "_compact_" in str(p):
            raise OSError("transient stat failure")
        return real_stat(p, **kw)

    monkeypatch.setattr(os, "stat", _boom)
    out = sim.sweep_index(root, min_age_s=0.0)
    assert out["restored"] == ["_old_cell_3_999"]
