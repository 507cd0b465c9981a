"""JSON body codec + upcaster chain (encoding/jsoncodec/codec.go).

The reference decodes ``body`` bytes through a per-kind factory and then
applies upcasters until the kind reaches a fixpoint
(encoding/jsoncodec/codec.go:51-77). Here the payload registry maps
``kind -> Spark StructType`` for column-level ``from_json`` reads, and
``kind -> upcaster`` python functions for the (driver/grouped-map) paths
that rewrite bodies — migrations M2 and golden conformance tests.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

Upcaster = Callable[[str, dict], tuple[str, dict]]


class JsonCodec:
    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}
        self._upcasters: dict[str, Upcaster] = {}

    # -- schema registry (factory analog, codec.go:22-44) -------------------
    def register(self, kind: str, schema: T.StructType) -> None:
        self._schemas[kind] = schema

    def schema(self, kind: str) -> T.StructType:
        return self._schemas[kind]

    # -- upcasters (codec.go:68-77) -----------------------------------------
    def register_upcaster(self, kind: str, fn: Upcaster) -> None:
        self._upcasters[kind] = fn

    def decode(self, kind: str, body: bytes | str) -> tuple[str, dict]:
        """Decode + upcast to fixpoint (codec.go:51-77)."""
        obj = json.loads(body if isinstance(body, str) else body.decode())
        while kind in self._upcasters:
            new_kind, obj = self._upcasters[kind](kind, obj)
            if new_kind == kind:
                break
            kind = new_kind
        return kind, obj

    @staticmethod
    def encode(obj: dict) -> bytes:
        return json.dumps(obj, separators=(",", ":")).encode()

    # -- column-level decode for analytics reads ----------------------------
    def body_column(self, kind: str) -> Column:
        """``from_json(body)`` with the kind's registered schema — the
        JVM-side read path for per-kind analytics (no Python)."""
        return F.from_json(F.col("body").cast("string"), self._schemas[kind])

    def parsed(self, events: DataFrame, kinds: list[str] | None = None) -> DataFrame:
        """Add one ``body_<kind>`` struct column per registered kind; rows of
        other kinds get null structs. Catalyst prunes unused ones."""
        out = events
        for kind in kinds or self._schemas:
            out = out.withColumn(
                f"body_{kind}",
                F.when(F.col("kind") == kind, self.body_column(kind)),
            )
        return out
