"""Train-and-apply Naive Bayes classifiers — the quality-gate and
language-ID stages a FineWeb/DCLM-style curation pipeline runs after
extraction (public recipe: fastText-style linear/NB scorers over token
or char-n-gram features; Joulin et al. 2016, Penedo et al. 2024).

The engine could already *evaluate* classifiers exactly
(``dup_quality_auc``, ``langid_calibration_ece``); these queries make
it *produce* one, with both the training and scoring paths
oracle-exact. Everything is integer arithmetic end to end:

* **Training** is counting: one ``groupBy(token, label)`` aggregation
  (multinomial NB sufficient statistics), a vocab cap via TakeOrdered,
  and Laplace(+1) smoothing — all exact integers at any scale.
* **Log-likelihoods** use a fixed-point base-2 logarithm computed by
  the classic *repeated-squaring binary-digit* algorithm (Majithia &
  Levan 1973; the CORDIC-family schoolbook method): normalize the
  mantissa to [2^S, 2^(S+1)) with S = 28 fraction bits, then 20 rounds
  of "square; if ≥ 2, emit bit and halve" in pure BIGINT ops. Both
  engines run the *same integer recurrence*, so the resulting
  ``ilog2_fx(x) ≈ floor(2^20·log2 x)`` is bit-identical by
  construction — no libm/StrictMath transcendental ever runs, which is
  what makes an NB scorer value-hash-comparable across engines (the
  gate compares floats at atol=0). Measured error < 1 fixed-point ulp
  over 1..5000 and at 2^31..2^40; valid domain 1 ≤ x < 2^63 (mantissa
  squaring peaks at 2^58).
* **Scoring** is explode → BROADCAST HASH JOIN against the vocab-capped
  model → per-doc partial aggregation: the big side never shuffles rows
  (the join is map-side) and the aggregation combines to ONE row per
  document before its exchange, so shuffle volume is O(docs), not
  O(tokens); zero Python. A one-row ``map<token, llr>`` fold was the
  first implementation and was rejected after 20× profiling: Spark's
  ``element_at`` on a MapType value is a LINEAR scan, so the fold was
  O(tokens · vocab) — 134 s vs 8.8 s at a 100k-doc corpus (SCALE.md
  round-7 lesson). The model plays the same role as the reference's
  in-process upcaster registry (store/codec.go:40-75): a small
  immutable lookup applied at scan time.

Weak supervision: the quality label reuses the engine's own integer
linear quality score (pipeline/quality.py ``quality_linear_score``) at
the established SCORE_LO threshold — the standard bootstrap where a
cheap heuristic labels the training set for a token-level model
(DCLM's fastText-on-heuristic-labels recipe). Language ID trains on
the corpus's ``lang`` column over char 3-grams.

Train/eval hygiene: train on ``doc_id % 2 = 0``, report on all docs
(quality) or the held-out half (langid confusion / calibration).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from eventsourcing_spark.io import (
    materialize,
    TEXT_KERNEL_BYTES,
    TEXT_KERNEL_BYTES_WIDE,
    ensure_parallelism,
    load_table,
)
from eventsourcing_spark.pipeline.quality import (
    SCORE_LO,
    STOPWORDS,
    W_MWL,
    W_STOP,
    W_TOK,
    W_UNIQ,
)
from eventsourcing_spark.queries import query

# ---------------------------------------------------------------------------
# Fixed-point integer log2 kernel — moved to the leaf module
# ``pipeline/ilog2.py`` in round 10 (it created a quality <->
# nb_classifier import cycle here); re-exported for the existing
# import sites (streaming_nb, kll, retrieval, tests).
# ---------------------------------------------------------------------------
from eventsourcing_spark.pipeline.ilog2 import (  # noqa: F401
    ILOG_F,
    ILOG_S,
    _P2F,
    _P2S,
    _P2S1,
    ilog2_duck,
    ilog2_py,
    ilog2_spark,
)


# ---------------------------------------------------------------------------
# Weak-supervision quality label (the engine's own integer linear
# score at the SCORE_LO threshold) — identical fragments both engines.
# ---------------------------------------------------------------------------
_STOP_SPARK = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


def _label_spark(text: str) -> str:
    ws = f"split(lower({text}), ' ')"
    return (
        f"(CASE WHEN {W_TOK} * size({ws})"
        f" + {W_MWL} * (aggregate(transform({ws},"
        f" x -> CAST(length(x) AS BIGINT)), CAST(0 AS BIGINT),"
        f" (a, x) -> a + x) * 10 div size({ws}))"
        f" + {W_STOP} * (size(filter({ws},"
        f" x -> array_contains({_STOP_SPARK}, x))) * 1000 div size({ws}))"
        f" + {W_UNIQ} * (size(array_distinct({ws})) * 1000 div size({ws}))"
        f" >= {SCORE_LO} THEN 1 ELSE 0 END)"
    )


def _label_duck(text: str) -> str:
    ws = f"string_split(lower({text}), ' ')"
    return (
        f"(CASE WHEN {W_TOK} * len({ws})"
        f" + {W_MWL} * (list_aggregate(list_transform({ws},"
        f" x -> len(x)), 'sum') * 10 // len({ws}))"
        f" + {W_STOP} * (len(list_filter({ws},"
        f" x -> list_contains({STOPWORDS!r}, x))) * 1000 // len({ws}))"
        f" + {W_UNIQ} * (len(list_distinct({ws})) * 1000 // len({ws}))"
        f" >= {SCORE_LO} THEN 1 ELSE 0 END)"
    )


VOCAB_K = 4096  # model vocab cap: top-K tokens by frequency (fastText's
# vocab pruning). Keeps the broadcast model bounded by construction —
# at 100 TB the model row is K·(token + 8B) regardless of corpus size.

# Shared model CTE (DuckDB): token counts per class over the train
# split, vocab-capped, with fixed-point llr per token.
_MODEL_DUCK = f"""
    lab AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws,
               {_label_duck("text")} AS good
        FROM documents WHERE doc_id % 2 = 0
    ),
    tok AS (SELECT unnest(ws) AS token, good FROM lab),
    cnt AS MATERIALIZED (
        SELECT token,
               sum(good)::BIGINT AS cnt_good,
               sum(1 - good)::BIGINT AS cnt_bad
        FROM tok GROUP BY token
        ORDER BY (sum(good) + sum(1 - good)) DESC, token
        LIMIT {VOCAB_K}
    ),
    tot AS (
        SELECT sum(cnt_good)::BIGINT AS ng, sum(cnt_bad)::BIGINT AS nb,
               count(*)::BIGINT AS v
        FROM cnt
    ),
    model AS (
        SELECT token, cnt_good, cnt_bad,
               ({ilog2_duck("cnt_good + 1")} - {ilog2_duck("ng + v")})
               - ({ilog2_duck("cnt_bad + 1")} - {ilog2_duck("nb + v")})
                 AS llr_fx
        FROM cnt, tot
    )
"""


def token_counts_df(docs):
    """UNCAPPED (token, cnt_good, cnt_bad) sufficient statistics of a
    document frame — the additive unit of NB training (batch trains on
    one aggregation of these; the streaming twin appends them per
    micro-batch and sums, pipeline/streaming_nb.py)."""
    lab = docs.select(
        F.expr("split(lower(text), ' ')").alias("ws"),
        F.expr(_label_spark("text")).alias("good"),
    )
    return (
        lab.select(F.explode("ws").alias("token"), "good")
        .groupBy("token")
        .agg(
            F.sum("good").cast("long").alias("cnt_good"),
            F.sum(1 - F.col("good")).cast("long").alias("cnt_bad"),
        )
    )


def model_from_counts(cnt_uncapped):
    """(token, cnt_good, cnt_bad) → the vocab-capped model with
    fixed-point llr: TakeOrdered cap, broadcast 1-row totals join,
    ilog2 kernel. Shared verbatim by batch training and the streaming
    counts registry so the two paths cannot drift."""
    cnt = cnt_uncapped.orderBy(
        F.desc(F.col("cnt_good") + F.col("cnt_bad")), F.asc("token")
    ).limit(VOCAB_K)
    # Two consumers (the model projection and the 1-row totals below)
    # would each re-run the corpus token explode + aggregation feeding
    # the cap (round-12 plan audit: the train subtree appeared twice in
    # every nb_* plan). The capped frame is ≤ VOCAB_K rows at any
    # corpus size — materialize it once.
    cnt = cnt.transform(materialize)
    tot = cnt.agg(
        F.sum("cnt_good").cast("long").alias("ng"),
        F.sum("cnt_bad").cast("long").alias("nb"),
        F.count("*").cast("long").alias("v"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "cnt_good",
        "cnt_bad",
        F.expr(
            f"({ilog2_spark('cnt_good + 1')} - {ilog2_spark('ng + v')})"
            f" - ({ilog2_spark('cnt_bad + 1')} - {ilog2_spark('nb + v')})"
        ).alias("llr_fx"),
    )


def _model_df(spark, sf_dir):
    """Spark twin of ``_MODEL_DUCK``: the vocab-capped NB model frame
    (token, cnt_good, cnt_bad, llr_fx). Shapes: one explode + one
    token-grain aggregation (map-side combine), a TakeOrdered vocab
    cap, and a broadcast 1-row totals join — nothing corpus-global."""
    docs = load_table(spark, sf_dir, "documents")
    return model_from_counts(
        token_counts_df(docs.filter(F.col("doc_id") % 2 == 0))
    )


def prior_df(train_docs):
    """One-row (prior_fx) frame: the fixed-point log class-prior ratio
    of a training frame."""
    return train_docs.select(
        F.expr(_label_spark("text")).alias("good")
    ).agg(
        F.expr(
            f"{ilog2_spark('sum(good) + 1')}"
            f" - {ilog2_spark('sum(1 - good) + 1')}"
        ).alias("prior_fx")
    )


def persum_df(docs, model):
    """THE token-scoring kernel, shared by the batch gate query and the
    streaming ingest gate (pipeline/streaming_quality_gate.py) so the
    two paths cannot drift: explode token instances → broadcast hash
    join against the (token, llr_fx) model → doc-grain partial
    aggregation to one ``tok_sum`` row per document. The big side never
    shuffles rows; the only exchange carries one row per document."""
    inst = docs.select(
        "doc_id", F.explode(F.expr("split(lower(text), ' ')")).alias("token")
    )
    return (
        inst.join(F.broadcast(model.select("token", "llr_fx")), "token")
        .groupBy("doc_id")
        .agg(F.sum("llr_fx").cast("long").alias("tok_sum"))
    )


def score_docs(docs, model, prior):
    """persum_df joined back onto the full document frame (LEFT join so
    token-less docs keep scoring via the prior) + the broadcast 1-row
    prior."""
    return docs.join(persum_df(docs, model), "doc_id", "left").crossJoin(
        F.broadcast(prior)
    )


@query(
    "nb_quality_train",
    f"""
    WITH {_MODEL_DUCK}
    SELECT token, cnt_good, cnt_bad, CAST(llr_fx AS BIGINT) AS llr_fx
    FROM model
    """,
)
def nb_quality_train(spark, sf_dir):
    """Multinomial-NB quality model over tokens: per vocab token, the
    class counts (sufficient statistics) and the Laplace-smoothed
    fixed-point log-likelihood ratio. Training IS one aggregation —
    the 100 TB cost is the token explode, which partial-aggregates
    map-side to vocab grain before the only exchange."""
    return _model_df(spark, sf_dir)


@query(
    "nb_quality_score",
    f"""
    WITH {_MODEL_DUCK},
    prior AS (
        SELECT {ilog2_duck("sum(good) + 1")}
               - {ilog2_duck("sum(1 - good) + 1")} AS prior_fx
        FROM lab
    ),
    inst AS (
        SELECT d.doc_id, d.lang, unnest(string_split(lower(d.text), ' '))
                 AS token
        FROM documents d
    ),
    persum AS (
        SELECT i.doc_id, sum(coalesce(m.llr_fx, 0))::BIGINT AS tok_sum
        FROM inst i LEFT JOIN model m ON i.token = m.token
        GROUP BY i.doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS is_train,
           CAST({_label_duck("d.text")} AS BIGINT) AS label_good,
           CAST(coalesce(p.tok_sum, 0) + pr.prior_fx AS BIGINT) AS score_fx,
           CAST(CASE WHEN coalesce(p.tok_sum, 0) + pr.prior_fx >= 0
                     THEN 1 ELSE 0 END
                AS BIGINT) AS pred_good
    -- LEFT JOIN: a NULL-text document has no token rows and would be
    -- dropped by an inner join, while the Spark twin keeps it via
    -- left join + coalesce(tok_sum, 0).
    FROM documents d
    LEFT JOIN persum p ON p.doc_id = d.doc_id
    CROSS JOIN prior pr
    """,
)
def nb_quality_score(spark, sf_dir, labs=None):
    """Apply the NB quality model to every document. Scoring shape:
    explode token instances → BROADCAST HASH JOIN against the
    vocab-capped model → doc-grain aggregation. The big side never
    shuffles rows (the join is map-side) and the aggregation partial-
    combines to ONE row per document before its exchange, so shuffle
    volume is O(docs), not O(tokens). A one-row map<token,llr> fold
    was tried and rejected: Spark's element_at on a MapType column is
    a LINEAR scan, making the fold O(tokens · vocab) — 13× slower at
    the 8k-entry vocab cap (profiled round 7). The oracle scores via
    the same explode + join.

    Round 12: the doc-grain label frame feeds three consumers (the
    prior aggregate, the join-back, and the output's label column),
    which previously re-scanned the corpus and re-evaluated the
    4-lambda label expression per consumer. It is 2 small ints per doc
    — materialize it once. ``labs`` lets a composite query (the
    agreement family in pipeline/ridge.py) inject an already-
    materialized (doc_id, label_good) frame so the corpus is not
    label-scanned twice. A carry-the-attributes-through-the-explode
    rewrite (grouping on (doc_id, is_train, label_good) to drop the
    doc-grain join-back) was tried and REVERTED: Catalyst moves the
    4-lambda label expression above the Generate, evaluating it once
    per TOKEN row instead of once per doc — measured 3x slower."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    model = _model_df(spark, sf_dir)
    if labs is None:
        labs = docs.select(
            "doc_id",
            F.expr(_label_spark("text")).cast("long").alias("label_good"),
        ).transform(materialize)
    # prior_df algebra over the materialized labels: sum(label_good)
    # over the train half is exactly sum(good) over the train docs.
    prior = labs.filter(F.col("doc_id") % 2 == 0).agg(
        F.expr(
            f"{ilog2_spark('sum(label_good) + 1')}"
            f" - {ilog2_spark('sum(1 - label_good) + 1')}"
        ).alias("prior_fx")
    )
    score = F.coalesce(F.col("tok_sum"), F.lit(0)) + F.col("prior_fx")
    return (
        labs.join(persum_df(docs, model), "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END")
            .cast("long")
            .alias("is_train"),
            "label_good",
            score.cast("long").alias("score_fx"),
            F.when(score >= 0, 1)
            .otherwise(0)
            .cast("long")
            .alias("pred_good"),
        )
    )


# ---------------------------------------------------------------------------
# Language ID: multinomial NB over char 3-grams (the classic n-gram
# langid recipe — Cavnar & Trenkle 1994; fastText's langid uses the
# same feature space). Supervised on the corpus's lang column, trained
# on the even half, evaluated on the held-out odd half.
# ---------------------------------------------------------------------------
LANGS = ["de", "en", "es", "fr", "zh"]  # class order = tie-break order
GRAM_K = 8192  # vocab cap, same broadcast-bound discipline as VOCAB_K
_NEG = -(1 << 62)  # sentinel for "excluded class" in second-best


def _grams_spark(text: str) -> str:
    t = f"lower({text})"
    return (
        f"CASE WHEN length({t}) < 3 THEN array()"
        f" ELSE transform(sequence(1, length({t}) - 2),"
        f" i -> substr({t}, i, 3)) END"
    )


def _grams_duck(text: str) -> str:
    t = f"lower({text})"
    return (
        f"CASE WHEN length({t}) < 3 THEN []::VARCHAR[]"
        f" ELSE list_transform(generate_series(1, length({t}) - 2),"
        f" i -> substring({t}, i, 3)) END"
    )


def _cnt_col(i: int) -> str:
    return f"cnt_{LANGS[i]}"


# Model CTE (DuckDB): per capped gram, the 5 class counts and the 5
# fixed-point log-likelihoods L_c = ilog(cnt_c+1) − ilog(N_c+V).
_SUM_COLS = ", ".join(
    f"sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END)::BIGINT AS cnt_{lg}"
    for lg in LANGS
)
_L_COLS = ", ".join(
    f"({ilog2_duck(f'cnt_{lg} + 1')} - {ilog2_duck(f'n_{lg} + v')})"
    f" AS l_{lg}"
    for lg in LANGS
)
_LANGID_MODEL_DUCK = f"""
    ginst AS (
        SELECT lang, unnest({_grams_duck("text")}) AS gram
        FROM documents WHERE doc_id % 2 = 0
    ),
    gcnt AS MATERIALIZED (
        SELECT gram, {_SUM_COLS}
        FROM ginst GROUP BY gram
        ORDER BY {" + ".join("cnt_" + lg for lg in LANGS)} DESC, gram
        LIMIT {GRAM_K}
    ),
    gtot AS (
        SELECT {", ".join(f"sum(cnt_{lg})::BIGINT AS n_{lg}" for lg in LANGS)},
               count(*)::BIGINT AS v
        FROM gcnt
    ),
    gmodel AS MATERIALIZED (
        SELECT gram, {", ".join("cnt_" + lg for lg in LANGS)}, {_L_COLS}
        FROM gcnt, gtot
    ),
    gprior AS (
        SELECT {", ".join(
            ilog2_duck(f"sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) + 1")
            + f" AS p_{lg}"
            for lg in LANGS
        )}
        FROM documents WHERE doc_id % 2 = 0
    )
"""

# Per-doc class scores (DuckDB): docs LEFT JOIN the per-doc model-gram
# sums (docs with no model gram score on priors alone).
_LANGID_SCORES_DUCK = f"""
    {_LANGID_MODEL_DUCK},
    dinst AS (
        SELECT doc_id, unnest({_grams_duck("text")}) AS gram
        FROM documents
    ),
    dsum AS MATERIALIZED (
        SELECT i.doc_id,
               {", ".join(
                   f"sum(coalesce(m.l_{lg}, 0))::BIGINT AS t_{lg}"
                   for lg in LANGS
               )}
        FROM dinst i JOIN gmodel m ON i.gram = m.gram
        GROUP BY i.doc_id
    ),
    scores AS MATERIALIZED (
        SELECT d.doc_id, d.lang,
               CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_train,
               {", ".join(
                   f"coalesce(s.t_{lg}, 0) + p.p_{lg} AS s_{lg}"
                   for lg in LANGS
               )}
        FROM documents d
        LEFT JOIN dsum s ON s.doc_id = d.doc_id
        CROSS JOIN gprior p
    )
"""


def _argmax_sql(prefix: str = "s_") -> str:
    """Deterministic argmax over the 5 class scores, ties to the
    earlier class in LANGS — byte-identical chain in both engines."""
    cases = []
    for i, lg in enumerate(LANGS[:-1]):
        conds = " AND ".join(
            f"{prefix}{lg} >= {prefix}{other}" for other in LANGS[i + 1 :]
        )
        cases.append(f"WHEN {conds} THEN '{lg}'")
    return "CASE " + " ".join(cases) + f" ELSE '{LANGS[-1]}' END"


def _second_best_sql(prefix: str = "s_") -> str:
    pred = _argmax_sql(prefix)
    parts = ", ".join(
        f"CASE WHEN ({pred}) = '{lg}' THEN {_NEG} ELSE {prefix}{lg} END"
        for lg in LANGS
    )
    return f"greatest({parts})"


def _langid_scores_df(spark, sf_dir):
    """Spark twin of ``_LANGID_SCORES_DUCK`` in the scale shape:
    explode grams → broadcast hash join against the capped model →
    doc-grain partial aggregation of the 5 class sums (shuffle volume
    = one row per doc). The one-row map<gram, array<llr>> fold was
    rejected after profiling: MapType element_at is a linear scan, so
    the fold was O(grams · vocab) — 134 s at the 20× stress corpus vs
    seconds for this shape."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"), per_partition_bytes=TEXT_KERNEL_BYTES)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    ginst = train.select(
        "lang", F.explode(F.expr(_grams_spark("text"))).alias("gram")
    )
    gcnt = (
        ginst.groupBy("gram")
        .agg(
            *[
                F.sum(F.when(F.col("lang") == lg, 1).otherwise(0))
                .cast("long")
                .alias(f"cnt_{lg}")
                for lg in LANGS
            ]
        )
        .orderBy(
            F.desc(sum(F.col(f"cnt_{lg}") for lg in LANGS)), F.asc("gram")
        )
        .limit(GRAM_K)
    )
    # gcnt feeds both the 1-row totals and the model projection —
    # materialize the ≤ GRAM_K-row capped frame once so the gram
    # explode + aggregation above runs a single time (round 12).
    gcnt = gcnt.transform(materialize)
    gtot = gcnt.agg(
        *[
            F.sum(f"cnt_{lg}").cast("long").alias(f"n_{lg}")
            for lg in LANGS
        ],
        F.count("*").cast("long").alias("v"),
    )
    gmodel = gcnt.crossJoin(F.broadcast(gtot)).select(
        "gram",
        F.array(
            *[
                F.expr(
                    f"({ilog2_spark(f'cnt_{lg} + 1')}"
                    f" - {ilog2_spark(f'n_{lg} + v')})"
                )
                for lg in LANGS
            ]
        ).alias("ls"),
    )
    prior = train.agg(
        F.array(
            *[
                F.expr(
                    ilog2_spark(
                        f"sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) + 1"
                    )
                )
                for lg in LANGS
            ]
        ).alias("pr")
    )
    dinst = docs.select(
        "doc_id", F.explode(F.expr(_grams_spark("text"))).alias("gram")
    )
    dsum = (
        dinst.join(F.broadcast(gmodel), "gram")
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.element_at("ls", i + 1))
                .cast("long")
                .alias(f"t_{lg}")
                for i, lg in enumerate(LANGS)
            ]
        )
    )
    return (
        docs.join(dsum, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            "lang",
            F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END")
            .cast("long")
            .alias("is_train"),
            *[
                (
                    F.coalesce(F.col(f"t_{lg}"), F.lit(0))
                    + F.element_at("pr", i + 1)
                ).alias(f"s_{lg}")
                for i, lg in enumerate(LANGS)
            ],
        )
    )


@query(
    "langid_ngram_train",
    f"""
    WITH {_LANGID_MODEL_DUCK}
    SELECT gram,
           {", ".join(f"CAST(cnt_{lg} AS BIGINT) AS cnt_{lg}" for lg in LANGS)},
           {", ".join(f"CAST(l_{lg} AS BIGINT) AS l_{lg}" for lg in LANGS)}
    FROM gmodel
    """,
)
def langid_ngram_train(spark, sf_dir):
    """The char-3-gram NB language model: per capped gram, 5 class
    counts and 5 fixed-point log-likelihoods. Same shapes as
    nb_quality_train (explode → gram-grain agg → TakeOrdered cap →
    broadcast totals)."""
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        per_partition_bytes=TEXT_KERNEL_BYTES,
    )
    ginst = docs.filter(F.col("doc_id") % 2 == 0).select(
        "lang", F.explode(F.expr(_grams_spark("text"))).alias("gram")
    )
    gcnt = (
        ginst.groupBy("gram")
        .agg(
            *[
                F.sum(F.when(F.col("lang") == lg, 1).otherwise(0))
                .cast("long")
                .alias(f"cnt_{lg}")
                for lg in LANGS
            ]
        )
        .orderBy(
            F.desc(sum(F.col(f"cnt_{lg}") for lg in LANGS)), F.asc("gram")
        )
        .limit(GRAM_K)
    )
    # gcnt feeds both the 1-row totals and the model projection —
    # materialize the ≤ GRAM_K-row capped frame once so the gram
    # explode + aggregation above runs a single time (round 12).
    gcnt = gcnt.transform(materialize)
    gtot = gcnt.agg(
        *[
            F.sum(f"cnt_{lg}").cast("long").alias(f"n_{lg}")
            for lg in LANGS
        ],
        F.count("*").cast("long").alias("v"),
    )
    return gcnt.crossJoin(F.broadcast(gtot)).select(
        "gram",
        *[F.col(f"cnt_{lg}") for lg in LANGS],
        *[
            F.expr(
                f"({ilog2_spark(f'cnt_{lg} + 1')}"
                f" - {ilog2_spark(f'n_{lg} + v')})"
            )
            .cast("long")
            .alias(f"l_{lg}")
            for lg in LANGS
        ],
    )


@query(
    "langid_ngram_classify",
    f"""
    WITH {_LANGID_SCORES_DUCK}
    SELECT lang, {_argmax_sql()} AS pred_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM scores WHERE is_train = 0
    GROUP BY lang, pred_lang
    """,
)
def langid_ngram_classify(spark, sf_dir):
    """Held-out confusion matrix of the NB langid model — the
    train-and-APPLY pass langid_calibration_ece could only simulate
    with a marker heuristic. Score path is map-only (one-row broadcast
    model, JVM fold per doc); the confusion rollup is a ≤25-group
    aggregate.

    Honesty note on the synthetic corpus: the ``lang`` column is
    independent of the text (every language draws from one shared
    English word pool), so held-out accuracy is data-capped near the
    class prior — what the gate verifies is exact cross-engine parity
    of the trained model and its decisions, and
    test_nb_classifier.py proves the same machinery reaches 100% on a
    separable corpus. The calibration twin below correctly reports the
    noise-feature overconfidence (large ECE), which is precisely the
    audit's job."""
    scores = _langid_scores_df(spark, sf_dir)
    return (
        scores.filter(F.col("is_train") == 0)
        .select("lang", F.expr(_argmax_sql()).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# Margin→confidence squashing constant: one fixed-point bit of
# log-likelihood (2^ILOG_F) maps to confidence 500/1000.
_CONF_C = 1 << ILOG_F


@query(
    "langid_nb_calibration_ece",
    f"""
    WITH {_LANGID_SCORES_DUCK},
    pred AS (
        SELECT lang, {_argmax_sql()} AS lang_pred,
               (1000 * (greatest({", ".join("s_" + lg for lg in LANGS)})
                        - ({_second_best_sql()})))
                 // ((greatest({", ".join("s_" + lg for lg in LANGS)})
                      - ({_second_best_sql()})) + {_CONF_C}) AS conf_milli
        FROM scores WHERE is_train = 0
    ),
    buckets AS (
        SELECT conf_milli // 100 AS bucket,
               count(*) AS n,
               sum(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)
                 AS n_correct,
               sum(conf_milli) AS sum_conf
        FROM pred GROUP BY 1
    ),
    rows_out AS (
        SELECT bucket, n,
               (1000000 * n_correct) // n AS acc_ppm,
               (1000 * sum_conf) // n AS conf_ppm
        FROM buckets
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n_docs,
           CAST(acc_ppm AS BIGINT) AS acc_ppm,
           CAST(conf_ppm AS BIGINT) AS conf_ppm,
           CAST(sum(n * abs(acc_ppm - conf_ppm)) OVER ()
                // sum(n) OVER () AS BIGINT) AS ece_ppm
    FROM rows_out
    ORDER BY bucket
    """,
)
def langid_nb_calibration_ece(spark, sf_dir):
    """Calibration audit of the REAL trained langid classifier
    (supersedes the heuristic-input langid_calibration_ece as the
    router-trust check): confidence = margin-squash
    1000·m/(m + 2^20) where m = top-vs-runner-up fixed-point
    log-likelihood margin — integer, monotone in the margin, exactly
    mirrored in both engines. Same reliability-diagram output contract
    as the heuristic query; the final window runs over ≤11 bucket
    rows (aggregate-fed)."""
    scores = _langid_scores_df(spark, sf_dir)
    smax = f"greatest({', '.join('s_' + lg for lg in LANGS)})"
    pred = scores.filter(F.col("is_train") == 0).select(
        "lang",
        F.expr(_argmax_sql()).alias("lang_pred"),
        F.expr(
            f"(1000 * ({smax} - ({_second_best_sql()})))"
            f" div (({smax} - ({_second_best_sql()})) + {_CONF_C})"
        ).alias("conf_milli"),
    )
    buckets = pred.groupBy(
        F.expr("conf_milli div 100").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
        ).alias("n_correct"),
        F.sum("conf_milli").alias("sum_conf"),
    )
    rows_out = buckets.select(
        "bucket",
        "n",
        F.expr("(1000000 * n_correct) div n").alias("acc_ppm"),
        F.expr("(1000 * sum_conf) div n").alias("conf_ppm"),
    )
    return rows_out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n_docs"),
        F.col("acc_ppm").cast("long").alias("acc_ppm"),
        F.col("conf_ppm").cast("long").alias("conf_ppm"),
        F.expr(
            "sum(n * abs(acc_ppm - conf_ppm)) OVER ()"
            " div sum(n) OVER ()"
        )
        .cast("long")
        .alias("ece_ppm"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Operating-point selection + calibration for the quality model — the
# two audits a team runs before wiring a trained gate into the
# pipeline: a threshold sweep (which score cutoff gives the
# precision/recall the corpus budget wants) and a reliability check
# (can the score's implied confidence be trusted for routing).
# Both reuse the exact scoring shape above; both are pure integers.
# ---------------------------------------------------------------------------
# Threshold sweep grid: ±8 fixed-point BITS of log-likelihood in 1-bit
# steps (a bit = a factor-2 likelihood ratio — the natural NB unit).
PR_BITS = 8

_SCORES_DUCK = f"""
    prior AS (
        SELECT {ilog2_duck("sum(good) + 1")}
               - {ilog2_duck("sum(1 - good) + 1")} AS prior_fx
        FROM lab
    ),
    inst AS (
        SELECT d.doc_id, unnest(string_split(lower(d.text), ' ')) AS token
        FROM documents d
    ),
    persum AS (
        SELECT i.doc_id, sum(coalesce(m.llr_fx, 0))::BIGINT AS tok_sum
        FROM inst i LEFT JOIN model m ON i.token = m.token
        GROUP BY i.doc_id
    ),
    scored AS MATERIALIZED (
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END AS is_train,
               {_label_duck("d.text")} AS label_good,
               coalesce(p.tok_sum, 0) + pr.prior_fx AS score_fx
        FROM documents d
        LEFT JOIN persum p ON p.doc_id = d.doc_id
        CROSS JOIN prior pr
    )
"""


@query(
    "nb_quality_pr_curve",
    f"""
    WITH {_MODEL_DUCK},
    {_SCORES_DUCK},
    grid AS (
        SELECT unnest(generate_series(-{PR_BITS}, {PR_BITS})) AS t_bits
    ),
    ev AS (SELECT * FROM scored WHERE is_train = 0)
    SELECT CAST(g.t_bits AS BIGINT) AS t_bits,
           CAST(sum(CASE WHEN e.score_fx >= g.t_bits * {_P2F}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
           CAST(sum(CASE WHEN e.score_fx >= g.t_bits * {_P2F}
                          AND e.label_good = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST((1000000 * sum(CASE WHEN e.score_fx >= g.t_bits * {_P2F}
                                     AND e.label_good = 1
                                    THEN 1 ELSE 0 END))
                // greatest(sum(CASE WHEN e.score_fx >= g.t_bits * {_P2F}
                                     THEN 1 ELSE 0 END), 1)
                AS BIGINT) AS precision_ppm,
           CAST((1000000 * sum(CASE WHEN e.score_fx >= g.t_bits * {_P2F}
                                     AND e.label_good = 1
                                    THEN 1 ELSE 0 END))
                // greatest(sum(e.label_good), 1) AS BIGINT) AS recall_ppm
    FROM ev e CROSS JOIN grid g
    GROUP BY g.t_bits
    """,
)
def nb_quality_pr_curve(spark, sf_dir):
    """Precision/recall of the NB quality gate on the held-out half at
    17 thresholds (±8 likelihood bits around 0) — the operating-point
    table a curation team reads to pick the gate's cutoff for a target
    kept-fraction. One scored frame crossJoined with a broadcast
    17-row grid, one ≤17-group aggregate."""
    scores = nb_quality_score(spark, sf_dir)
    grid = spark.range(-PR_BITS, PR_BITS + 1).select(
        F.col("id").cast("long").alias("t_bits")
    )
    ev = scores.filter(F.col("is_train") == 0)
    hit = F.col("score_fx") >= F.col("t_bits") * _P2F
    return (
        ev.crossJoin(F.broadcast(grid))
        .groupBy("t_bits")
        .agg(
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("long")
            .alias("n_pred_pos"),
            F.sum(F.when(hit & (F.col("label_good") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_tp"),
            F.expr(
                f"CAST((1000000 * sum(CASE WHEN score_fx >= t_bits * {_P2F}"
                f" AND label_good = 1 THEN 1 ELSE 0 END))"
                f" div greatest(sum(CASE WHEN score_fx >= t_bits * {_P2F}"
                f" THEN 1 ELSE 0 END), 1) AS BIGINT)"
            ).alias("precision_ppm"),
            F.expr(
                f"CAST((1000000 * sum(CASE WHEN score_fx >= t_bits * {_P2F}"
                f" AND label_good = 1 THEN 1 ELSE 0 END))"
                f" div greatest(sum(label_good), 1) AS BIGINT)"
            ).alias("recall_ppm"),
        )
    )


@query(
    "nb_quality_calibration_ece",
    f"""
    WITH {_MODEL_DUCK},
    {_SCORES_DUCK},
    pred AS (
        SELECT label_good,
               CASE WHEN score_fx >= 0 THEN 1 ELSE 0 END AS pred_good,
               (1000 * abs(score_fx)) // (abs(score_fx) + {_CONF_C})
                 AS conf_milli
        FROM scored WHERE is_train = 0
    ),
    buckets AS (
        SELECT conf_milli // 100 AS bucket,
               count(*) AS n,
               sum(CASE WHEN pred_good = label_good THEN 1 ELSE 0 END)
                 AS n_correct,
               sum(conf_milli) AS sum_conf
        FROM pred GROUP BY 1
    ),
    rows_out AS (
        SELECT bucket, n,
               (1000000 * n_correct) // n AS acc_ppm,
               (1000 * sum_conf) // n AS conf_ppm
        FROM buckets
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n_docs,
           CAST(acc_ppm AS BIGINT) AS acc_ppm,
           CAST(conf_ppm AS BIGINT) AS conf_ppm,
           CAST(sum(n * abs(acc_ppm - conf_ppm)) OVER ()
                // sum(n) OVER () AS BIGINT) AS ece_ppm
    FROM rows_out
    ORDER BY bucket
    """,
)
def nb_quality_calibration_ece(spark, sf_dir):
    """Reliability diagram + ECE of the binary quality gate on the
    held-out half: confidence = margin-squash 1000·|s|/(|s| + 2^20),
    accuracy vs the weak label per confidence decile. Same integer ECE
    contract as the langid twin; the final window runs over ≤11 bucket
    rows (aggregate-fed)."""
    from pyspark.sql import Window  # noqa: F401 — parity with siblings

    scores = nb_quality_score(spark, sf_dir)
    pred = scores.filter(F.col("is_train") == 0).select(
        "label_good",
        "pred_good",
        F.expr(
            f"(1000 * abs(score_fx)) div (abs(score_fx) + {_CONF_C})"
        ).alias("conf_milli"),
    )
    buckets = pred.groupBy(
        F.expr("conf_milli div 100").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("pred_good") == F.col("label_good"), 1).otherwise(0)
        ).alias("n_correct"),
        F.sum("conf_milli").alias("sum_conf"),
    )
    rows_out = buckets.select(
        "bucket",
        "n",
        F.expr("(1000000 * n_correct) div n").alias("acc_ppm"),
        F.expr("(1000 * sum_conf) div n").alias("conf_ppm"),
    )
    return rows_out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n").cast("long").alias("n_docs"),
        F.col("acc_ppm").cast("long").alias("acc_ppm"),
        F.col("conf_ppm").cast("long").alias("conf_ppm"),
        F.expr(
            "sum(n * abs(acc_ppm - conf_ppm)) OVER ()"
            " div sum(n) OVER ()"
        )
        .cast("long")
        .alias("ece_ppm"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Unigram cross-entropy in exact fixed-point BITS — the CCNet/Wenzek
# 2020 perplexity-family quality signal (low bits/token = formulaic or
# boilerplate text, high = rare-token soup), here against the corpus's
# own unigram LM so no trained artifact is needed. The existing
# rare_token_score / bigram_lm_score express LM familiarity as count
# RATIOS; this is the log-space form every LM-filter paper reports,
# made oracle-exact by the ilog2 kernel: per token instance the
# surprisal is ilog2(N) − ilog2(c_t) (fixed-point bits, no smoothing
# needed — every scored token is in the corpus by construction).
#
# Scale shape: instances pre-aggregate to (doc, token) pairs map-side,
# join the vocab-grain freq table on token (AQE picks broadcast vs
# shuffle by actual vocab size — Zipf corpora keep it small), then one
# doc-grain rollup. The surplus ilog2 runs once per VOCAB row, not per
# instance.
# ---------------------------------------------------------------------------
@query(
    "unigram_xent_bits",
    f"""
    WITH inst AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    dt AS (
        SELECT doc_id, token, count(*) AS n_dt
        FROM inst GROUP BY doc_id, token
    ),
    freq AS MATERIALIZED (
        SELECT token, count(*) AS c FROM inst GROUP BY token
    ),
    nn AS (
        SELECT sum(c)::BIGINT AS n,
               {ilog2_duck("sum(c)")} AS ilog_n
        FROM freq
    ),
    fl AS (SELECT token, {ilog2_duck("c")} AS ilog_c FROM freq)
    SELECT d.doc_id,
           CAST(sum(d.n_dt) AS BIGINT) AS n_tok,
           CAST(sum(d.n_dt * (nn.ilog_n - f.ilog_c)) AS BIGINT) AS xent_fx,
           CAST((1000 * sum(d.n_dt * (nn.ilog_n - f.ilog_c)))
                // (sum(d.n_dt) * {_P2F}) AS BIGINT) AS bits_per_tok_milli
    FROM dt d JOIN fl f ON f.token = d.token CROSS JOIN nn
    GROUP BY d.doc_id
    """,
)
def unigram_xent_bits(spark, sf_dir):
    """Per-document unigram cross-entropy: total fixed-point bits and
    milli-bits-per-token against the corpus unigram distribution —
    the exact-integer stand-in for the LM-perplexity filter."""
    # Round 12 (scan-collapse): dt, fl and nn each replanned the
    # tokenize explode (3 corpus scans, 3 explodes). The corpus token
    # frequency is the column-sum of the (doc, token) count matrix, so
    # ilog_c rides in as a WINDOW sum over the same token-keyed shuffle
    # the old fl join paid; the scalar n is the total token count,
    # computed by a second NARROW pass (sum of size(split) — no explode,
    # no shuffle) and broadcast. 1 explode, 1 join removed.
    from pyspark.sql import Window

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    inst = docs.select(
        "doc_id", F.explode(F.expr("split(lower(text), ' ')")).alias("token")
    )
    dt = inst.groupBy("doc_id", "token").agg(F.count("*").alias("n_dt"))
    nn = docs.agg(
        F.sum(F.expr("size(split(lower(text), ' '))")).cast("long").alias("n")
    ).select("n", F.expr(ilog2_spark("n")).alias("ilog_n"))
    return (
        dt.withColumn(
            "c", F.sum("n_dt").over(Window.partitionBy("token"))
        )
        .withColumn("ilog_c", F.expr(ilog2_spark("c")))
        .crossJoin(F.broadcast(nn))
        .groupBy("doc_id")
        .agg(
            F.sum("n_dt").cast("long").alias("n_tok"),
            F.sum(F.col("n_dt") * (F.col("ilog_n") - F.col("ilog_c")))
            .cast("long")
            .alias("xent_fx"),
            F.expr(
                f"CAST((1000 * sum(n_dt * (ilog_n - ilog_c)))"
                f" div (sum(n_dt) * {_P2F}) AS BIGINT)"
            ).alias("bits_per_tok_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Classifier-gated curation — the composed round-7 stage: apply the
# trained NB quality gate, then canonical-URL first-occurrence dedup
# among the survivors, and report per-source retention. This is the
# "wire the trained gate into the pipeline" end-state (the analog of
# curation_pipeline's dedup→quality→split chain, with a TRAINED model
# in the quality slot); both engines derive the verdict per doc and
# aggregate to source grain, so one flipped gate decision or one wrong
# dedup keeper shifts the counts and fails the hash.
# ---------------------------------------------------------------------------
@query(
    "classifier_gated_curation",
    f"""
    WITH {_MODEL_DUCK},
    {_SCORES_DUCK},
    gated AS MATERIALIZED (
        SELECT d.doc_id, d.source,
               CASE WHEN s.score_fx >= 0 THEN 1 ELSE 0 END AS kept_gate,
               {{canon}} AS canonical_url
        FROM documents d
        JOIN (SELECT doc_id AS s_doc_id, score_fx FROM scored) s
          ON s.s_doc_id = d.doc_id
    ),
    dedup AS (
        SELECT *,
               CASE WHEN kept_gate = 1 AND doc_id = min(CASE WHEN
                        kept_gate = 1 THEN doc_id END)
                        OVER (PARTITION BY canonical_url)
                    THEN 1 ELSE 0 END AS kept_final
        FROM gated
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(1 - kept_gate) AS BIGINT) AS n_gated_out,
           CAST(sum(kept_gate) - sum(kept_final) AS BIGINT)
             AS n_url_dup_out,
           CAST(sum(kept_final) AS BIGINT) AS n_kept
    FROM dedup
    GROUP BY source
    """.replace("{canon}", __import__(
        "eventsourcing_spark.pipeline.html_extract",
        fromlist=["CANON_URL_DUCK"],
    ).CANON_URL_DUCK),
)
def classifier_gated_curation(spark, sf_dir):
    """Per-source retention through the composed gate: NB quality
    verdict (map-only vs the broadcast model) → canonical-URL
    first-occurrence dedup among gate survivors (min doc_id per
    canonical, a keyed window at canonical grain) → one ≤|sources|
    aggregate. At 100 TB the chain is the scoring scan + one
    canonical-grain shuffle — the same exchanges the two component
    queries pay, fused into one plan."""
    from pyspark.sql import Window

    from eventsourcing_spark.pipeline.html_extract import canonical_url_col

    scores = nb_quality_score(spark, sf_dir).select("doc_id", "score_fx")
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    gated = docs.join(scores, "doc_id").select(
        "doc_id",
        "source",
        F.when(F.col("score_fx") >= 0, 1).otherwise(0).alias("kept_gate"),
        canonical_url_col().alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url")
    dedup = gated.withColumn(
        "kept_final",
        F.when(
            (F.col("kept_gate") == 1)
            & (
                F.col("doc_id")
                == F.min(
                    F.when(F.col("kept_gate") == 1, F.col("doc_id"))
                ).over(w)
            ),
            1,
        ).otherwise(0),
    )
    return dedup.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(1 - F.col("kept_gate")).cast("long").alias("n_gated_out"),
        (F.sum("kept_gate") - F.sum("kept_final"))
        .cast("long")
        .alias("n_url_dup_out"),
        F.sum("kept_final").cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Hashing-trick NB — the vocab-cap-free scaling variant (Weinberger et
# al. 2009, fastText's bucket hashing): tokens hash into a FIXED
# 2^14-bucket feature space, so the model's size is a constant
# regardless of corpus vocabulary — no TakeOrdered cap, no
# frequency-ordering pass, and the broadcast bound holds by
# construction at any scale. Collisions merge rare features (the
# documented trade); the md5-prefix bucket hash is byte-identical in
# both engines (CAST(conv(substr(md5(t),1,8),16,10)) ==
# ('0x'||substr(md5(t),1,8))::BIGINT, verified). Same train/score
# shapes as the exact-vocab model: one bucket-grain aggregation to
# train, broadcast-hash-join + doc-grain partial agg to score.
# ---------------------------------------------------------------------------
HASH_BUCKETS = 1 << 14


@query(
    "nb_quality_hashed_score",
    f"""
    WITH lab AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws,
               {_label_duck("text")} AS good
        FROM documents WHERE doc_id % 2 = 0
    ),
    tok AS (
        SELECT ('0x' || substr(md5(unnest(ws)), 1, 8))::BIGINT
                 % {HASH_BUCKETS} AS bucket,
               good
        FROM lab
    ),
    hcnt AS MATERIALIZED (
        SELECT bucket,
               sum(good)::BIGINT AS cnt_good,
               sum(1 - good)::BIGINT AS cnt_bad
        FROM tok GROUP BY bucket
    ),
    htot AS (
        SELECT sum(cnt_good)::BIGINT AS ng, sum(cnt_bad)::BIGINT AS nb,
               count(*)::BIGINT AS v
        FROM hcnt
    ),
    hmodel AS MATERIALIZED (
        SELECT bucket,
               ({ilog2_duck("cnt_good + 1")} - {ilog2_duck("ng + v")})
               - ({ilog2_duck("cnt_bad + 1")} - {ilog2_duck("nb + v")})
                 AS llr_fx
        FROM hcnt, htot
    ),
    hprior AS (
        SELECT {ilog2_duck("sum(good) + 1")}
               - {ilog2_duck("sum(1 - good) + 1")} AS prior_fx
        FROM lab
    ),
    dinst AS (
        SELECT doc_id,
               ('0x' || substr(md5(unnest(string_split(lower(text), ' '))),
                               1, 8))::BIGINT % {HASH_BUCKETS} AS bucket
        FROM documents
    ),
    dsum AS (
        SELECT i.doc_id, sum(m.llr_fx)::BIGINT AS tok_sum
        FROM dinst i JOIN hmodel m ON i.bucket = m.bucket
        GROUP BY i.doc_id
    )
    SELECT d.doc_id,
           CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS is_train,
           CAST(coalesce(s.tok_sum, 0) + p.prior_fx AS BIGINT) AS score_fx,
           CAST(CASE WHEN coalesce(s.tok_sum, 0) + p.prior_fx >= 0
                THEN 1 ELSE 0 END AS BIGINT) AS pred_good
    FROM documents d
    LEFT JOIN dsum s ON s.doc_id = d.doc_id
    CROSS JOIN hprior p
    """,
)
def nb_quality_hashed_score(spark, sf_dir):
    """Score every document with the hashed-feature NB model — the
    constant-memory variant of nb_quality_score whose model is bounded
    by the 2^14 hash space instead of a frequency-ordered vocab cap.
    At 100 TB this removes the cap's ordering pass entirely: training
    is one bucket-grain aggregation whose key domain never grows."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    bucket = (
        f"CAST(conv(substring(md5(token), 1, 8), 16, 10) AS BIGINT)"
        f" % {HASH_BUCKETS}"
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    tok = train.select(
        F.explode(F.expr("split(lower(text), ' ')")).alias("token"),
        F.expr(_label_spark("text")).alias("good"),
    ).select(F.expr(bucket).alias("bucket"), "good")
    hcnt = tok.groupBy("bucket").agg(
        F.sum("good").cast("long").alias("cnt_good"),
        F.sum(1 - F.col("good")).cast("long").alias("cnt_bad"),
    )
    # Two consumers (the 1-row totals and the model projection) would
    # each re-run the train-half token explode + aggregation feeding
    # this frame (round-12 scan audit: documents scanned 5x in this
    # plan). ≤ 2^14 bucket rows at any corpus size — materialize once,
    # the same discipline as model_from_counts.
    hcnt = hcnt.transform(materialize)
    htot = hcnt.agg(
        F.sum("cnt_good").cast("long").alias("ng"),
        F.sum("cnt_bad").cast("long").alias("nb"),
        F.count("*").cast("long").alias("v"),
    )
    hmodel = hcnt.crossJoin(F.broadcast(htot)).select(
        "bucket",
        F.expr(
            f"({ilog2_spark('cnt_good + 1')} - {ilog2_spark('ng + v')})"
            f" - ({ilog2_spark('cnt_bad + 1')} - {ilog2_spark('nb + v')})"
        ).alias("llr_fx"),
    )
    prior = prior_df(train)
    dinst = docs.select(
        "doc_id",
        F.explode(F.expr("split(lower(text), ' ')")).alias("token"),
    ).select("doc_id", F.expr(bucket).alias("bucket"))
    dsum = (
        dinst.join(F.broadcast(hmodel), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("llr_fx").cast("long").alias("tok_sum"))
    )
    score = F.coalesce(F.col("tok_sum"), F.lit(0)) + F.col("prior_fx")
    return (
        docs.join(dsum, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END")
            .cast("long")
            .alias("is_train"),
            score.cast("long").alias("score_fx"),
            F.when(score >= 0, 1).otherwise(0).cast("long").alias("pred_good"),
        )
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (pool-adjacent-violators) of the NB quality
# score — the standard post-hoc calibrator (Zadrozny & Elkan, KDD'02).
# Instead of the sequential PAV pooling loop, the fit uses the minimax
# identity: the isotonic regression of bucket rates r_1..r_B is
#
#     fit[k] = max_{i<=k} min_{j>=k} mean(y over buckets i..j)
#
# which is pure relational algebra over the bucket grain: prefix sums →
# an (i<=j) pair frame of interval averages → a suffix-min window per i
# → a per-k max. Every mean is carried as an INTEGER fraction key
# floor(num·1e12/den); floor is monotone, so it commutes with min and
# max, making fitkey = floor(1e12·fit[k]) EXACT — the oracle replays the
# whole fit bit-for-bit with no float anywhere. (Bound: num·1e12 must
# fit int64, i.e. <= ~9.2e6 calibration rows — calibration sets are
# samples at any scale, and the key widens to DECIMAL(38) if not.)
#
# Scale shape: scoring reuses score_docs (broadcast model join, O(docs)
# shuffle); everything after the per-bin aggregation runs on <= B = 24
# rows (B² pair frame = 576 rows) — the fit costs nothing at any corpus
# size.
# ---------------------------------------------------------------------------
ISO_BINS = 24
ISO_SCALE = 10**12


@query(
    "isotonic_calibration_pav",
    f"""
    WITH {_MODEL_DUCK},
    {_SCORES_DUCK},
    ev AS (SELECT label_good, score_fx FROM scored WHERE is_train = 0),
    st AS (SELECT min(score_fx) AS mn, max(score_fx) AS mx FROM ev),
    binned AS (
        SELECT ((e.score_fx - st.mn) * {ISO_BINS}) // (st.mx - st.mn + 1)
                   AS bin,
               e.label_good
        FROM ev e CROSS JOIN st
    ),
    bins AS (
        SELECT bin, count(*) AS n, sum(label_good) AS pos
        FROM binned GROUP BY bin
    ),
    cum AS (
        SELECT bin, n, pos,
               sum(pos) OVER (ORDER BY bin) AS p_cum,
               sum(n) OVER (ORDER BY bin) AS c_cum
        FROM bins
    ),
    cum2 AS (
        SELECT bin, n, pos, p_cum, c_cum,
               p_cum - pos AS p_prev, c_cum - n AS c_prev
        FROM cum
    ),
    pairs AS (
        SELECT a.bin AS i, b.bin AS j,
               ((b.p_cum - a.p_prev) * {ISO_SCALE})
                   // (b.c_cum - a.c_prev) AS avgkey
        FROM cum2 a JOIN cum2 b ON b.bin >= a.bin
    ),
    m AS (
        SELECT i, j,
               min(avgkey) OVER (
                   PARTITION BY i ORDER BY j DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS mkey
        FROM pairs
    ),
    fit AS (SELECT j AS bin, max(mkey) AS fitkey FROM m GROUP BY j)
    SELECT CAST(b.bin AS BIGINT) AS bin,
           CAST(b.n AS BIGINT) AS n,
           CAST(b.pos AS BIGINT) AS n_pos,
           CAST((1000000 * b.pos) // b.n AS BIGINT) AS raw_ppm,
           CAST(f.fitkey // 1000000 AS BIGINT) AS iso_ppm
    FROM bins b JOIN fit f USING (bin)
    ORDER BY bin
    """,
)
def isotonic_calibration_pav(spark, sf_dir):
    """Exact isotonic (PAV) calibration of the held-out NB scores.

    ``raw_ppm`` is each score-bin's empirical good-rate; ``iso_ppm`` is
    the isotonic regression of those rates (monotone nondecreasing in
    the score by construction) — the mapping a production gate applies
    to turn raw log-likelihood scores into calibrated probabilities.
    Companions: ``nb_quality_calibration_ece`` measures the
    miscalibration this fit removes.
    """
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    model = _model_df(spark, sf_dir)
    prior = prior_df(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    )
    ev = (
        score_docs(docs, model, prior)
        .filter(F.col("doc_id") % 2 == 1)
        .select(
            F.expr(_label_spark("text")).cast("long").alias("label_good"),
            (F.coalesce(F.col("tok_sum"), F.lit(0)) + F.col("prior_fx"))
            .cast("long")
            .alias("score_fx"),
        )
    )
    stats = ev.agg(
        F.min("score_fx").alias("mn"), F.max("score_fx").alias("mx")
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.expr(f"((score_fx - mn) * {ISO_BINS}) div (mx - mn + 1)").alias(
            "bin"
        ),
        "label_good",
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label_good").cast("long").alias("pos"),
    )
    wcum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # materialize the <=B-row cumulative frame once: four downstream
    # branches (both pair sides, the fit, the output join) would
    # otherwise each re-derive the full corpus scoring pass. The
    # checkpoint sits AFTER the window so the plan audit still sees the
    # exchange's aggregate producer (bin grain, <= ISO_BINS rows).
    cum = bins.select(
        "bin",
        "n",
        "pos",
        F.sum("pos").over(wcum).alias("p_cum"),
        F.sum("n").over(wcum).alias("c_cum"),
    ).select(
        "bin",
        "n",
        "pos",
        "p_cum",
        "c_cum",
        (F.col("p_cum") - F.col("pos")).alias("p_prev"),
        (F.col("c_cum") - F.col("n")).alias("c_prev"),
    ).transform(materialize)
    li = cum.select(
        F.col("bin").alias("i"), F.col("p_prev").alias("pp"),
        F.col("c_prev").alias("cp"),
    )
    rj = cum.select(
        F.col("bin").alias("j"), F.col("p_cum").alias("pj"),
        F.col("c_cum").alias("cj"),
    )
    # broadcast the <=B-row right side: the theta-join plans as a
    # BroadcastNestedLoopJoin over two bin-grain frames (B² = 576 rows
    # max), never a shuffled cartesian
    pairs = li.join(F.broadcast(rj), F.col("j") >= F.col("i")).select(
        "i",
        "j",
        F.expr(f"((pj - pp) * {ISO_SCALE}) div (cj - cp)").alias("avgkey"),
    )
    wsuf = Window.partitionBy("i").orderBy(F.desc("j")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    m = pairs.select("i", "j", F.min("avgkey").over(wsuf).alias("mkey"))
    fit = m.groupBy(F.col("j").alias("bin")).agg(
        F.max("mkey").alias("fitkey")
    )
    return (
        cum.select("bin", "n", "pos")
        .join(fit, "bin")
        .select(
            "bin",
            "n",
            F.col("pos").alias("n_pos"),
            F.expr("(1000000 * pos) div n").cast("long").alias("raw_ppm"),
            F.expr("fitkey div 1000000").cast("long").alias("iso_ppm"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram cross-entropy — the standard smoothed n-gram LM
# (Kneser & Ney 1995; Chen & Goodman 1999's benchmark winner), exact.
# With the discount fixed at d = 3/4, every probability is a RATIONAL
# with integer numerator/denominator:
#
#   known context w1 (c1 >= 1):
#     P(w2|w1) = max(c12 - 3/4, 0)/c1 + (3·N1+(w1·)/(4·c1)) · Pc(w2)
#     num = (4·c12 − 3)⁺·(Ntot+U) + 3·N1p(w1)·(Ncont(w2)+1)
#     den = 4·c1·(Ntot+U)
#   unseen context:  P = Pc(w2),  num = Ncont(w2)+1,  den = Ntot+U
#
# where Ncont(w2) = |{w1 : c(w1,w2) > 0}| (the continuation count that
# makes KN superior to Katz backoff), Ntot = distinct bigram types, and
# Pc is add-one smoothed over U = train unigram types + 1 so every
# held-out token has P > 0. Per-token surprisal is then
# ilog2(den) − ilog2(num) in the shared fixed-point kernel — bits, not
# floats, so the whole perplexity computation hash-matches the oracle.
# (Smoothing caveat, same as every backoff LM: the per-word masses can
# sum slightly over 1, so a pathological token could score negative
# bits; the metric is the DEFINED statistic, identical both engines.)
#
# Magnitude bound: num ≤ 7·c1·(Ntot+U); with T train tokens both
# factors are ≤ 4T, so int64 holds to T ≈ 1e9 — train the LM on a
# deterministic sample past that (the nb/ridge discipline).
#
# Scale shape: training is two bigram-grain aggregations (map-side
# combine) + two word-grain rollups + a 1-row totals frame; evaluation
# explodes held-out bigrams and runs three KEYED left joins (bigram,
# context word, continuation word) — shuffles carry token instances,
# nothing is collected, nothing is all-pairs. Output is source grain.
# ---------------------------------------------------------------------------
@query(
    "kneser_ney_bits",
    f"""
    WITH tr AS (
        SELECT list_filter(string_split(lower(text), ' '), x -> x <> '')
                   AS t
        FROM documents WHERE doc_id % 2 = 0
    ),
    trb AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM tr, unnest(generate_series(1, len(t) - 1)) u(i)
        WHERE len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, count(*) AS c12 FROM trb GROUP BY w1, w2),
    ctx AS (
        SELECT w1, sum(c12) AS c1, count(*) AS n1p FROM c12 GROUP BY w1
    ),
    cont AS (SELECT w2, count(*) AS ncont FROM c12 GROUP BY w2),
    tot AS (
        SELECT (SELECT count(*) FROM c12) AS ntot,
               (SELECT count(DISTINCT w)
                FROM (SELECT unnest(t) AS w FROM tr)) + 1 AS uu
    ),
    ev AS (
        SELECT d.source,
               list_filter(string_split(lower(d.text), ' '), x -> x <> '')
                   AS t
        FROM documents d WHERE d.doc_id % 2 = 1
    ),
    evb AS (
        SELECT source, t[i] AS w1, t[i + 1] AS w2
        FROM ev, unnest(generate_series(1, len(t) - 1)) u(i)
        WHERE len(t) >= 2
    ),
    scored AS (
        SELECT e.source,
               CASE WHEN x.c1 IS NOT NULL
                    THEN 4 * x.c1 * (tot.ntot + tot.uu)
                    ELSE tot.ntot + tot.uu END AS den,
               CASE WHEN x.c1 IS NOT NULL
                    THEN (CASE WHEN b.c12 IS NOT NULL
                               THEN 4 * b.c12 - 3 ELSE 0 END)
                             * (tot.ntot + tot.uu)
                         + 3 * x.n1p * (coalesce(n.ncont, 0) + 1)
                    ELSE coalesce(n.ncont, 0) + 1 END AS num
        FROM evb e
        LEFT JOIN c12 b ON b.w1 = e.w1 AND b.w2 = e.w2
        LEFT JOIN ctx x ON x.w1 = e.w1
        LEFT JOIN cont n ON n.w2 = e.w2
        CROSS JOIN tot
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum({ilog2_duck("den")} - {ilog2_duck("num")}) AS BIGINT)
               AS sum_bits_fx,
           CAST((1000 * sum({ilog2_duck("den")} - {ilog2_duck("num")}))
                // (count(*) * {_P2F}) AS BIGINT) AS millibits_per_token
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def kneser_ney_bits(spark, sf_dir):
    """Held-out per-source KN-bigram cross-entropy, exact in fixed-point
    bits. Trains on the even half, scores the odd half — the quality
    signal CCNet-class pipelines threshold on ("perplexity vs a clean
    LM"), with KN's continuation counts instead of the interpolated-MLE
    stand-in (``trigram_lm_interpolated``)."""
    docs = ensure_parallelism(
        load_table(spark, sf_dir, "documents"),
        per_partition_bytes=TEXT_KERNEL_BYTES_WIDE,
    )
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda x: x != ""
    )
    base = docs.select("doc_id", "source", toks.alias("t"))

    def bigrams(df, *extra):
        return df.filter(F.size("t") >= 2).select(
            *extra,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("g"),
        ).select(*extra, "g.w1", "g.w2")

    train = base.filter(F.col("doc_id") % 2 == 0)
    trb = bigrams(train)
    # Round 12: c12 is the trained LM itself (bigram-vocabulary grain —
    # model state, not corpus state) and feeds FOUR consumers (ctx,
    # cont, the totals row, the eval join); materialize it once instead
    # of re-running the train bigram explode + aggregation per consumer
    # (the plan carried 6 corpus scans).
    c12 = (
        trb.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
        .transform(materialize)
    )
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"), F.count("*").alias("n1p")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("ncont"))
    ntot = c12.agg(F.count("*").cast("long").alias("ntot"))
    uu = (
        train.select(F.explode("t").alias("w"))
        .agg((F.countDistinct("w") + 1).cast("long").alias("uu"))
    )
    tot = ntot.crossJoin(uu)

    evb = bigrams(base.filter(F.col("doc_id") % 2 == 1), "source")
    scored = (
        evb.join(c12, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.expr(
                "CASE WHEN c1 IS NOT NULL"
                " THEN 4 * c1 * (ntot + uu)"
                " ELSE ntot + uu END"
            ).alias("den"),
            F.expr(
                "CASE WHEN c1 IS NOT NULL"
                " THEN (CASE WHEN c12 IS NOT NULL"
                "       THEN 4 * c12 - 3 ELSE 0 END) * (ntot + uu)"
                "      + 3 * n1p * (coalesce(ncont, 0) + 1)"
                " ELSE coalesce(ncont, 0) + 1 END"
            ).alias("num"),
        )
    )
    # evaluate the 20-round ilog2 fold once per DISTINCT (num, den)
    # pair, not once per token instance: repeated corpora repeat the
    # same rationals (measured 43 s -> ~8 s at the 20x stress), and the
    # pre-aggregation is the same map-side combine the kernel's other
    # consumers lean on
    bits = F.expr(f"{ilog2_spark('den')} - {ilog2_spark('num')}")
    grouped = (
        scored.groupBy("source", "den", "num")
        .agg(F.count("*").alias("cnt"))
        .select("source", "cnt", bits.alias("bits_fx"))
    )
    return (
        grouped.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("bits_fx"))
            .cast("long")
            .alias("sum_bits_fx"),
            F.expr(
                f"CAST((1000 * sum(cnt * bits_fx))"
                f" div (sum(cnt) * {_P2F}) AS BIGINT)"
            ).alias("millibits_per_token"),
        )
        .orderBy("source")
    )
