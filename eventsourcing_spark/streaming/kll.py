"""Streaming KLL quantile-sketch maintenance — the online twin of
pipeline/kll.py's batch gate query.

The batch side derandomizes KLL over a canonical order so DuckDB can
replay it; a STREAM has a real arrival order, so this twin runs the
genuine online cascade (Karnin-Lang-Liberty 2016) with DETERMINISTIC
ALTERNATING compaction offsets (keep even positions on a level's first
compaction, odd on its second, ...) instead of KLL's coin flips —
reproducible across replays, and still carrying the deterministic
rank-error certificate

    |r̂(v) − r(v)| ≤ B = Σ_ℓ C_ℓ·2^ℓ

where C_ℓ counts compactions ever performed at level ℓ (each compaction
of a SORTED buffer has at most one pair straddling any threshold, so it
perturbs any rank estimate by ≤ 2^ℓ). The sketch tracks C_ℓ in its
state and exposes the bound, so a consumer can ASSERT its estimates.

Distribution shape per micro-batch: every batch partition builds its
own bounded sketch (mapInPandas — Arrow-batched, stdlib-only closure),
the driver collects only those ≤ k·levels summaries (never rows) and
merges them in partition order, then merges into the stored state.

Exactly-once state under foreachBatch retry: each epoch commits ONE
unit = the full post-merge snapshot, keyed by the epoch in the
registry manifest (registry_manifest.append_df semantics). The
previous epoch's snapshot is kept live (epochs ≤ current−2 are pruned
at commit), and a batch always merges into the snapshot of the LARGEST
EPOCH STRICTLY BELOW ITS OWN — so a retry of epoch E rebuilds from
E−1's snapshot and REPLACES E's unit instead of double-merging, the
manifest-native form of the CMS maintainer's epoch-rejection rule
(streaming/sketches.py).

State is bounded: ≤ k items per level × log₂(n/k) levels + one meta
row per level, regardless of stream volume — the property that makes
this viable at 100 TB/day where buffering values is not.
"""

from __future__ import annotations

# Worker-closure hygiene: the mapInPandas closure below references this
# module's KLL class on executors; register for by-value pickling so it
# survives a session with no PYTHONPATH export (media_codecs rationale).
try:  # pragma: no cover
    import sys as _sys

    from pyspark.cloudpickle import register_pickle_by_value as _reg_by_value

    _reg_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass

import os

from pyspark.sql import DataFrame

STATE_SCHEMA = "kind string, lvl int, value double, cnt long"


class KLL:
    """Deterministic-offset KLL compactor cascade over float values."""

    def __init__(self, k: int = 256):
        if k < 2 or k % 2:
            raise ValueError("k must be an even integer >= 2")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.ncompact: list[int] = [0]
        self.n = 0

    # -- updates ----------------------------------------------------------
    def update(self, values) -> None:
        for v in values:
            self.levels[0].append(float(v))
            self.n += 1
            if len(self.levels[0]) >= self.k:
                self._compact(0)

    def _compact(self, lvl: int) -> None:
        buf = sorted(self.levels[lvl])
        pairs = (len(buf) // 2) * 2
        offset = self.ncompact[lvl] % 2  # alternating deterministic offset
        keep = buf[offset:pairs:2]
        self.levels[lvl] = buf[pairs:]  # odd leftover stays at this level
        self.ncompact[lvl] += 1
        if lvl + 1 == len(self.levels):
            self.levels.append([])
            self.ncompact.append(0)
        self.levels[lvl + 1].extend(keep)
        if len(self.levels[lvl + 1]) >= self.k:
            self._compact(lvl + 1)

    def merge(self, other: "KLL") -> None:
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        for lvl, buf in enumerate(other.levels):
            while lvl >= len(self.levels):
                self.levels.append([])
                self.ncompact.append(0)
            self.levels[lvl].extend(buf)
        for lvl, c in enumerate(other.ncompact):
            self.ncompact[lvl] += c
        self.n += other.n
        for lvl in range(len(self.levels)):
            while len(self.levels[lvl]) >= self.k:
                self._compact(lvl)

    # -- queries ----------------------------------------------------------
    def bound(self) -> int:
        """The deterministic rank-error certificate B = Σ C_ℓ·2^ℓ."""
        return sum(c << lvl for lvl, c in enumerate(self.ncompact))

    def size(self) -> int:
        return sum(len(b) for b in self.levels)

    def items(self) -> list[tuple[float, int]]:
        """(value, weight) pairs, value-sorted."""
        out = [
            (v, 1 << lvl)
            for lvl, buf in enumerate(self.levels)
            for v in buf
        ]
        out.sort()
        return out

    def estimate_rank(self, v: float) -> int:
        return sum(w for x, w in self.items() if x <= v)

    def quantile(self, frac: float) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        target = max(1, int(frac * self.n))
        cum = 0
        items = self.items()
        for x, w in items:
            cum += w
            if cum >= target:
                return x
        return items[-1][0]

    # -- (de)serialization -------------------------------------------------
    def to_rows(self) -> list[tuple]:
        rows = [("n", 0, 0.0, self.n)]
        for lvl, c in enumerate(self.ncompact):
            rows.append(("ncompact", lvl, 0.0, c))
        for lvl, buf in enumerate(self.levels):
            for v in buf:
                rows.append(("item", lvl, v, 0))
        return rows

    @classmethod
    def from_rows(cls, rows, k: int = 256) -> "KLL":
        sk = cls(k)
        maxlvl = 0
        for kind, lvl, _v, _c in rows:
            if kind in ("item", "ncompact"):
                maxlvl = max(maxlvl, lvl)
        while len(sk.levels) <= maxlvl:
            sk.levels.append([])
            sk.ncompact.append(0)
        for kind, lvl, v, c in rows:
            if kind == "n":
                sk.n = int(c)
            elif kind == "ncompact":
                sk.ncompact[lvl] = int(c)
            else:
                sk.levels[lvl].append(float(v))
        return sk


def _prev_snapshot_rows(spark, state_dir: str, before_epoch: int):
    """State rows of the largest committed epoch strictly below
    ``before_epoch`` (retry-safe read — never this epoch's own unit)."""
    from eventsourcing_spark.pipeline.registry_manifest import (
        latest_manifest,
    )

    m = latest_manifest(state_dir)
    prior = [int(e) for e in m["epochs"] if int(e) < before_epoch
             and m["epochs"][e]]
    if not prior:
        return []
    units = m["epochs"][str(max(prior))]
    paths = [os.path.join(state_dir, u) for u in units]
    df = spark.read.schema(STATE_SCHEMA).parquet(*paths)
    return [tuple(r) for r in df.collect()]


def kll_maintain(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "value",
    k: int = 256,
):
    """Maintain a KLL sketch of ``value_col`` over a stream
    (availableNow drain trigger). Returns the started query."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from eventsourcing_spark.pipeline.registry_manifest import (
            append_df,
            commit,
            latest_manifest,
        )

        spark = batch_df.sparkSession

        def part_sketch(batches):
            import pandas as pd

            sk = KLL(k)
            for pdf in batches:
                sk.update(pdf[value_col].dropna().tolist())
            yield pd.DataFrame(
                sk.to_rows(), columns=["kind", "lvl", "value", "cnt"]
            )

        # per-partition bounded summaries; only these reach the driver
        parts = batch_df.select(value_col).mapInPandas(
            part_sketch, STATE_SCHEMA
        )
        merged = KLL.from_rows(
            _prev_snapshot_rows(spark, state_dir, epoch_id), k
        )
        batch_sk = KLL(k)
        # deterministic merge order: partition summaries arrive as rows;
        # each partition emitted exactly one 'n' row, so group by scan
        # order of the collected frame (collect preserves partition id
        # order for a narrow plan; sketch merge error bounds hold under
        # ANY order — order only pins replay determinism)
        rows = parts.collect()
        cur: list[tuple] = []
        for r in rows:
            if r.kind == "n" and cur:
                batch_sk.merge(KLL.from_rows(cur, k))
                cur = []
            cur.append((r.kind, r.lvl, r.value, r.cnt))
        if cur:
            batch_sk.merge(KLL.from_rows(cur, k))
        merged.merge(batch_sk)

        snap = spark.createDataFrame(merged.to_rows(), STATE_SCHEMA)
        append_df(snap.coalesce(1), state_dir, epoch_key=str(epoch_id))
        # prune snapshots two or more epochs old (retries only ever
        # reach back one epoch)
        m = latest_manifest(state_dir)
        stale = [
            u
            for e, us in m["epochs"].items()
            if int(e) < epoch_id - 1
            for u in us
        ]
        if stale:
            commit(state_dir, [], remove_units=stale)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_sketch(spark, state_dir: str, k: int = 256) -> KLL:
    """The current maintained sketch (newest committed snapshot)."""
    from eventsourcing_spark.pipeline.registry_manifest import (
        latest_manifest,
    )

    m = latest_manifest(state_dir)
    epochs = [int(e) for e in m["epochs"] if m["epochs"][e]]
    if not epochs:
        return KLL(k)
    units = m["epochs"][str(max(epochs))]
    paths = [os.path.join(state_dir, u) for u in units]
    df = spark.read.schema(STATE_SCHEMA).parquet(*paths)
    return KLL.from_rows([tuple(r) for r in df.collect()], k)
