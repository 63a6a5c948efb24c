"""The commit protocols against a REAL S3 endpoint (round 15 — the
carried VERDICT stretch task).

moto's ThreadedMotoServer serves actual HTTP; boto3 makes real SDK calls
(signed requests, retries, 412s). ``S3PointerStore`` routes every commit
primitive through it: conditional pointer PUT (rename), GET/DELETE
(resolution/retirement), server-side LastModified (the sweep freshness
clock), re-PUT (utime). Bulk parquet stays on local disk per the
storage.py contract split (no s3a jars in this environment — documented
in s3store.py).

Coverage here = the same protocol cycles the contract/fault suites run:

1. full HourlyRollup cycle (refresh/replay/compact/absorbed-replay/crash
   aside + guarded & unguarded sweep) — the crash axis,
2. full persisted-IVF-index cycle (build/append/replay/compact/crash +
   sweep) — the second protocol family,
3. two-writer conditional-PUT conflict: the loss comes out of the
   SERVER's own If-None-Match 412, not an injected exception — the race
   axis on real S3 semantics,
4. lagged listings over the S3 store — the eventual-consistency axis.
"""

from __future__ import annotations

import os
import shutil

import pytest

from execute_sync_spark import storage
from execute_sync_spark.s3store import S3PointerStore
from tests.test_storage_contract import (  # noqa: F401
    _index_cycle,
    _rollup_cycle,
    swap_store,
)
from tests.test_storage_faults import _rollup_with_two_batches, _rows

moto = pytest.importorskip("moto")


@pytest.fixture(scope="module")
def s3_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    port = server._server.socket.getsockname()[1]
    yield f"http://127.0.0.1:{port}"
    server.stop()


@pytest.fixture
def s3_store_factory(s3_endpoint, tmp_path):
    made = []

    def _make(cls=S3PointerStore, **kw):
        store = cls(
            str(tmp_path / "_physical"),
            endpoint_url=s3_endpoint,
            bucket=f"commit-{len(made)}-{os.getpid()}",
            **kw,
        )
        made.append(store)
        return store

    return _make


def test_rollup_cycle_on_real_s3_endpoint(spark, tmp_path, swap_store, s3_store_factory):
    store = swap_store(s3_store_factory())
    _rollup_cycle(spark, str(tmp_path / "rollup"))
    assert store.pointer_swaps > 0  # commits really took the S3 pointer path


def test_index_cycle_on_real_s3_endpoint(spark, tmp_path, swap_store, s3_store_factory):
    store = swap_store(s3_store_factory())
    _index_cycle(spark, str(tmp_path / "ivf"))
    assert store.pointer_swaps > 0


class ConflictS3Store(S3PointerStore):
    """``arm(dst_substr, winner_src)``: when a rename targets the armed
    dst, the winner's staged dir takes the pointer first via its own
    conditional PUT; the delegated swap then loses If-None-Match at the
    SERVER — a genuine 412, no injected exception."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._armed = None
        self.conflicts: list[str] = []

    def arm(self, dst_substr: str, winner_src: str) -> None:
        self._armed = (dst_substr, winner_src)

    def rename(self, src, dst):
        if self._armed and self._armed[0] in dst:
            _, winner = self._armed
            self._armed = None
            super().rename(winner, dst)  # the concurrent writer wins the swap
            self.conflicts.append(dst)
        super().rename(src, dst)


def test_conditional_put_conflict_is_a_server_412(
    spark, tmp_path, swap_store, s3_store_factory
):
    """Two compactors race one day's pointer swap; ours loses to the
    server's If-None-Match check AFTER parking the live day aside. The
    412 propagates as FileExistsError, the staged name survives, sweep
    reclaims our aside without touching the winner, and a clean retry
    compacts normally — the ConflictConditionalStore scenario with the
    fake conditional create replaced by the real S3 one."""
    store = swap_store(s3_store_factory(cls=ConflictS3Store))
    r, expect = _rollup_with_two_batches(spark, str(tmp_path / "rollup"))

    winner = str(tmp_path / "winner_day")
    shutil.copytree(os.path.join(r.path, "day=2024-01-01"), winner)
    store.arm("/day=2024-01-01", winner_src=winner)
    with pytest.raises(FileExistsError):
        r.compact()
    assert store.conflicts == [os.path.join(r.path, "day=2024-01-01")]
    assert store.conditional_conflicts >= 1  # the server said 412

    out = r.sweep(min_age_s=0)
    assert any(n.startswith("_old_day_2024-01-01") for n in out["reclaimed"])
    assert not any(n.startswith("_old_day_") for n in out["restored"])
    assert _rows(r) == expect  # the winner's day is live and untouched
    assert r.compact() == ["2024-01-01"]  # clean retry compacts normally
    assert _rows(r) == expect


class LaggedS3Store(S3PointerStore):
    """Eventually-consistent listings over the S3 store: ``hide(name, n)``
    drops ``name`` from the next ``n`` listings that would contain it."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._hidden: dict[str, int] = {}

    def hide(self, name: str, listings: int) -> None:
        self._hidden[name] = listings

    def listdir(self, p):
        names = super().listdir(p)
        out = []
        for n in names:
            left = self._hidden.get(n, 0)
            if left > 0:
                self._hidden[n] = left - 1
                continue
            out.append(n)
        return out


def test_lagged_listing_defers_sweep_on_s3(
    spark, tmp_path, swap_store, s3_store_factory
):
    """An aside invisible to sweep's listing is left for the next sweep
    (defer, never misclassify) — the eventual-consistency axis on the S3
    store."""
    store = swap_store(s3_store_factory(cls=LaggedS3Store))
    r, expect = _rollup_with_two_batches(spark, str(tmp_path / "rollup"))
    assert r.compact() == ["2024-01-01"]

    live = os.path.join(r.path, "day=2024-01-01")
    aside = "_old_day_2024-01-01_99999"
    storage.STORE.rename(live, os.path.join(r.path, aside))
    store.hide(aside, 1)  # sweep's one listing of the table dir lags
    assert r.sweep(min_age_s=0) == {"restored": [], "reclaimed": []}
    out = r.sweep(min_age_s=0)
    assert aside in out["restored"]
    assert _rows(r) == expect


def test_freshness_is_the_server_clock(tmp_path, swap_store, s3_store_factory):
    """A committed pointer's freshness comes from S3 LastModified (the
    shared multi-process clock), and utime refreshes it server-side."""
    import time

    store = swap_store(s3_store_factory())
    d = tmp_path / "staged"
    d.mkdir()
    (d / "x.txt").write_text("payload")
    dst = str(tmp_path / "live")
    store.rename(str(d), dst)
    f1 = store.freshness(dst)
    assert abs(f1 - time.time()) < 30  # a real wall-clock timestamp
    time.sleep(1.1)  # S3 LastModified granularity is one second
    store.utime(dst)
    assert store.freshness(dst) >= f1 + 1
    # reads resolve through the mirror; the pointer target holds the bytes
    assert store.read_text(os.path.join(dst, "x.txt")) == "payload"


# -- round-16 ADVICE pins -------------------------------------------------


class _FlakyS3:
    """Delegating wrapper around a real boto3 client that fails the next
    ``n`` CONDITIONAL put_object calls with the given error code — the
    injection point for publish failures that are NOT a clean server 412
    (throttling, network failure after SDK retries, AWS's documented 409
    ConditionalRequestConflict for racing conditional PUTs)."""

    def __init__(self, inner, code: str, n: int = 1):
        self._inner = inner
        self._code = code
        self._n = n

    def put_object(self, **kw):
        from botocore.exceptions import ClientError

        if "IfNoneMatch" in kw and self._n > 0:
            self._n -= 1
            raise ClientError(
                {"Error": {"Code": self._code, "Message": self._code}},
                "PutObject",
            )
        return self._inner.put_object(**kw)

    def __getattr__(self, a):
        return getattr(self._inner, a)


def test_rename_restores_staged_name_on_non412_failure(tmp_path, s3_store_factory):
    """ADVICE r15: a publish failure OTHER than the lost-race 412 (here a
    throttle surviving SDK retries) must also restore the staged name —
    otherwise the bytes are stranded under physical_root with no name and
    the documented retry-from-staging recovery path is impossible."""
    from botocore.exceptions import ClientError

    store = s3_store_factory()
    src = tmp_path / "staged_dir"
    src.mkdir()
    (src / "part-0").write_text("rows")
    dst = str(tmp_path / "committed")

    store.s3 = _FlakyS3(store.s3, "SlowDown")
    with pytest.raises(ClientError):
        store.rename(str(src), dst)
    # the staged NAME survived: bytes addressable where the caller left them
    assert (src / "part-0").read_text() == "rows"
    assert not os.path.lexists(dst)
    # and a clean retry commits normally
    store.rename(str(src), dst)
    assert store.read_text(os.path.join(dst, "part-0")) == "rows"


def test_rename_restores_committed_link_src_on_failure(tmp_path, s3_store_factory):
    """Same stranding bug for the other src shape: renaming an already
    COMMITTED name (a pointer link) must re-take the src pointer when the
    publish fails, so the old name stays live."""
    from botocore.exceptions import ClientError

    store = s3_store_factory()
    staged = tmp_path / "staged"
    staged.mkdir()
    (staged / "f").write_text("v1")
    a = str(tmp_path / "nameA")
    store.rename(str(staged), a)  # commit once: a is now a pointer link

    store.s3 = _FlakyS3(store.s3, "SlowDown")
    with pytest.raises(ClientError):
        store.rename(a, str(tmp_path / "nameB"))
    assert os.path.islink(a)  # the committed name is still live
    assert store.read_text(os.path.join(a, "f")) == "v1"
    assert store.freshness(a) > 0  # and its S3 pointer is back (HEAD works)


def test_conditional_409_conflict_maps_to_lost_race(tmp_path, s3_store_factory):
    """AWS returns 409 ConditionalRequestConflict when two conditional PUTs
    on the same key race in-flight; neither writer knows who won. That must
    surface as the contract's retryable FileExistsError (staged name
    restored), not a fatal ClientError."""
    store = s3_store_factory()
    src = tmp_path / "staged_409"
    src.mkdir()
    (src / "f").write_text("x")
    dst = str(tmp_path / "contested")

    store.s3 = _FlakyS3(store.s3, "ConditionalRequestConflict")
    before = store.conditional_conflicts
    with pytest.raises(FileExistsError):
        store.rename(str(src), dst)
    assert store.conditional_conflicts == before + 1
    assert (src / "f").read_text() == "x"  # staged name restored
    store.rename(str(src), dst)  # retry path is open
    assert store.read_text(os.path.join(dst, "f")) == "x"


def test_physical_keys_disjoint_across_store_instances(tmp_path, s3_store_factory):
    """ADVICE r15: two stores sharing physical_root (the multi-process
    deployment the S3 freshness clock exists for) must never claim the same
    physical key. The exists()-then-rename loop alone has a TOCTOU window;
    the per-instance token makes the namespaces disjoint by construction."""
    a = s3_store_factory()
    b = s3_store_factory()  # same physical_root, different store instance
    assert a._token != b._token
    for store, nm in ((a, "A"), (b, "B")):
        src = tmp_path / f"staged_{nm}"
        src.mkdir()
        (src / "f").write_text(nm)
        store.rename(str(src), str(tmp_path / f"name_{nm}"))
    phys = os.listdir(tmp_path / "_physical")
    assert len(phys) == 2
    # each physical name embeds its own store's token — no shared counter
    assert {p.split("-")[1] for p in phys} == {a._token, b._token}


def test_retry_config_is_adaptive_with_backoff(s3_store_factory):
    """Production default: botocore's adaptive retry mode (exponential
    backoff + client-side throttle rate limiting), 5 attempts — the 5xx
    story for every pointer primitive. Overridable per-store for tests."""
    store = s3_store_factory()
    rc = store.s3.meta.config.retries
    # botocore normalizes max_attempts=5 -> total_max_attempts=6 (1 + 5)
    assert rc["mode"] == "adaptive" and rc["total_max_attempts"] == 6
    fast = s3_store_factory(retries={"max_attempts": 1})
    assert fast.s3.meta.config.retries["total_max_attempts"] == 2


def test_transient_5xx_exhausting_retries_leaves_retryable_state(
    tmp_path, s3_store_factory
):
    """A 5xx that survives the SDK's retries (InternalError here, injected
    above botocore so the store sees the post-retry failure) must leave
    the staged name intact and the commit retryable — the same contract as
    the throttle case, pinned for the server-error code path."""
    from botocore.exceptions import ClientError

    store = s3_store_factory()
    src = tmp_path / "staged_5xx"
    src.mkdir()
    (src / "f").write_text("x")
    dst = str(tmp_path / "committed_5xx")
    store.s3 = _FlakyS3(store.s3, "InternalError")
    with pytest.raises(ClientError):
        store.rename(str(src), dst)
    assert (src / "f").read_text() == "x"
    store.rename(str(src), dst)
    assert store.read_text(os.path.join(dst, "f")) == "x"
