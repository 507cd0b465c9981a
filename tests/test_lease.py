"""Cross-driver catch-up singleton lease (VERDICT r8 #6).

The reference serializes a projection's catch-up behind a distributed
lock (projection/projection.go:130-149 WaitForLock; dist/redlock).
These tests cover the lease primitive itself (pure file ops) and the
Projector wiring: two "drivers" (separate Projector + CheckpointStore
instances over the same store) racing the same projection — one wins,
the other waits and then no-ops through the C2 checkpoint filter, so
the read model is never double-applied.
"""

from __future__ import annotations

import os
import threading
import time
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from eventsourcing_spark.projection import CheckpointStore, Projector
from eventsourcing_spark.projection.lease import Lease, LeaseHeld, LeaseLost
from eventsourcing_spark.store import EventStore

from tests.account import KIND_CREATED, KIND_DEPOSITED

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


# ------------------------------------------------------------ primitive
# The whole primitive matrix runs over ALL THREE CAS backends (VERDICT
# r9 #5 / r10 #3): the default POSIX file protocol, the in-memory
# reference of an object store's conditional writes, and the real
# S3-REST adapter against the in-process s3lite double. ``make`` builds
# a Lease bound to the round's backend; ``rewind`` ages a lease as if
# its holder stopped heartbeating (file: mtime rewind; memory: clock
# rewind; s3: the double's mtime backdoor).
@pytest.fixture(params=["file", "memory", "s3"])
def lease_env(request, tmp_path):
    d = str(tmp_path)
    if request.param == "file":
        def make(name, owner, ttl=300.0):
            return Lease(d, name, owner=owner, ttl=ttl)

        def rewind(lease, seconds):
            st = os.stat(lease._path)
            os.utime(
                lease._path, (st.st_atime, st.st_mtime - seconds)
            )
    elif request.param == "s3":
        from eventsourcing_spark.object_store import ObjectStoreCasBackend
        from tests.s3lite import S3Lite

        srv = S3Lite()
        request.addfinalizer(srv.close)
        backend = ObjectStoreCasBackend(
            srv.endpoint, "test-bucket", prefix="leases/"
        )

        def make(name, owner, ttl=300.0):
            return Lease(d, name, owner=owner, ttl=ttl, backend=backend)

        def rewind(lease, seconds):
            srv.rewind("leases/" + lease._key, seconds)
    else:
        from eventsourcing_spark.cas import MemoryCasBackend

        backend = MemoryCasBackend()

        def make(name, owner, ttl=300.0):
            return Lease(d, name, owner=owner, ttl=ttl, backend=backend)

        def rewind(lease, seconds):
            backend.rewind(lease._key, seconds)

    class Env:
        pass

    env = Env()
    env.make = make
    env.rewind = rewind
    return env


def test_acquire_release_cycle(lease_env):
    a = lease_env.make("p1", "a")
    assert a.try_acquire()
    b = lease_env.make("p1", "b")
    assert not b.try_acquire()
    with pytest.raises(LeaseHeld, match="held by a"):
        b.acquire(wait=0.0)
    a.release()
    assert b.try_acquire()
    b.release()


def test_waiter_gets_lease_after_release(lease_env):
    a = lease_env.make("p1", "a")
    a.acquire()
    got = []

    def waiter():
        b = lease_env.make("p1", "b")
        b.acquire(wait=10.0, poll=0.05)
        got.append(time.monotonic())
        b.release()

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.4)
    released_at = time.monotonic()
    a.release()
    t.join(timeout=10)
    assert got and got[0] >= released_at


def test_stale_lease_is_broken(lease_env):
    a = lease_env.make("p1", "dead-driver", ttl=1.0)
    a.acquire()
    # age the lease past its TTL (a crashed driver stops renewing)
    lease_env.rewind(a, 5)
    b = lease_env.make("p1", "b", ttl=1.0)
    assert b.try_acquire()
    # the dead driver's release now detects the steal
    with pytest.raises(LeaseLost):
        a.release()
    b.release()


def test_renew_prevents_break(lease_env):
    a = lease_env.make("p1", "a", ttl=0.5)
    a.acquire()
    for _ in range(3):
        time.sleep(0.2)
        a.renew()
    b = lease_env.make("p1", "b", ttl=0.5)
    assert not b.try_acquire()
    a.release()


def test_context_manager_releases_on_error(lease_env):
    with pytest.raises(ValueError, match="boom"):
        with lease_env.make("p1", "a").acquire():
            raise ValueError("boom")
    assert lease_env.make("p1", "b").try_acquire()


# ------------------------------------------------- projector integration
class CountingModel:
    """Tracks every (aggregate_id, event count) application so a
    double-applied catch-up is visible as handled_events > total."""

    def __init__(self, delay: float = 0.0) -> None:
        self.handled_events = 0
        self.passes = 0
        self.delay = delay
        self._lock = threading.Lock()

    def handler(self, df, meta) -> None:
        if meta.kind != "catchup":
            return
        n = df.count()
        if self.delay:
            time.sleep(self.delay)
        with self._lock:
            self.passes += 1
            self.handled_events += n


def _seed_store(spark, base: str) -> EventStore:
    store = EventStore(spark, base)
    store.append(
        "acc-1",
        "Account",
        [
            (KIND_CREATED, {"money": 100, "owner": "Ana"}),
            (KIND_DEPOSITED, {"money": 10}),
            (KIND_DEPOSITED, {"money": 20}),
        ],
        expected_version=0,
        created_at=T0,
    )
    return store


def test_concurrent_catchup_single_application(spark, tmp_path):
    """Two drivers race the same projection: one wins the lease, the
    other waits; the second pass resumes from the first's checkpoints
    and applies zero events — never a double-apply."""
    base = str(tmp_path / "proj")
    lease_dir = str(tmp_path / "leases")
    store = _seed_store(spark, base)
    rm = CountingModel(delay=1.0)
    now = T0 + timedelta(minutes=2)

    def driver():
        # each "driver" builds its own Projector + CheckpointStore view,
        # exactly what two separate Spark drivers would do
        p = Projector(
            store,
            "balances",
            rm.handler,
            CheckpointStore(spark, base),
            splits=2,
            lease_dir=lease_dir,
            lease_wait=60.0,
        )
        p.catch_up(now=now)

    t1 = threading.Thread(target=driver)
    t2 = threading.Thread(target=driver)
    t1.start()
    t2.start()
    t1.join(timeout=120)
    t2.join(timeout=120)
    assert rm.passes == 2  # both passes ran...
    assert rm.handled_events == 3  # ...but the events applied once


def test_concurrent_catchup_loser_aborts_without_wait(spark, tmp_path):
    """lease_wait=0 is the abort flavor: the loser raises LeaseHeld and
    never touches the read model or checkpoints."""
    base = str(tmp_path / "proj")
    lease_dir = str(tmp_path / "leases")
    store = _seed_store(spark, base)
    # the winner must still be mid-pass when the loser (which first
    # pays a CheckpointStore Spark read of its own) reaches the lease
    rm = CountingModel(delay=8.0)
    now = T0 + timedelta(minutes=2)
    errs: list[Exception] = []
    started = threading.Event()

    def winner():
        p = Projector(
            store,
            "balances",
            rm.handler,
            CheckpointStore(spark, base),
            splits=2,
            lease_dir=lease_dir,
            lease_wait=60.0,
        )
        started.set()
        p.catch_up(now=now)

    def loser():
        started.wait(timeout=30)
        # wait until the winner actually HOLDS the lease (constructing
        # its CheckpointStore involves a Spark read of unknown length)
        lease_path = os.path.join(lease_dir, "catchup-balances.lease")
        deadline = time.monotonic() + 30
        while not os.path.exists(lease_path) and time.monotonic() < deadline:
            time.sleep(0.05)
        p = Projector(
            store,
            "balances",
            rm.handler,
            CheckpointStore(spark, base),
            splits=2,
            lease_dir=lease_dir,
            lease_wait=0.0,
        )
        try:
            p.catch_up(now=now)
        except LeaseHeld as e:
            errs.append(e)

    t1 = threading.Thread(target=winner)
    t2 = threading.Thread(target=loser)
    t1.start()
    t2.start()
    t1.join(timeout=120)
    t2.join(timeout=120)
    assert len(errs) == 1
    assert rm.passes == 1
    assert rm.handled_events == 3


def test_catchup_without_lease_dir_unchanged(spark, tmp_path):
    """Default path (no lease_dir) behaves exactly as before."""
    base = str(tmp_path / "proj")
    store = _seed_store(spark, base)
    rm = CountingModel()
    p = Projector(
        store, "balances", rm.handler, CheckpointStore(spark, base), splits=2
    )
    p.catch_up(now=T0 + timedelta(minutes=2))
    assert rm.handled_events == 3
    assert not os.path.exists(str(tmp_path / "leases"))
