"""Text-analysis operators over ``documents`` (LLM-pipeline extension).

Language-ID by stopword heuristic, quality scoring, token counting, and a
winnowing-style rolling-hash document fingerprint — all JVM-side
(`split`/`transform`/`filter`/`aggregate` higher-order functions), no
Python UDFs in the hot path.

Scale notes: every query here is a narrow map over documents followed by at
most one hash aggregate — embarrassingly parallel, no skew risk (keys are
doc_id or low-cardinality enums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.ordering import small_sorted
from ..functions.rounding import rnd, rnd_sql
from ..lake.tables import load_table

# -- token counting + quality scoring -----------------------------------------


def doc_quality_scores(
    spark: SparkSession, sf_dir: str, ranged: bool = False
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    avg_tok_len = F.expr(
        "aggregate(split(text, ' '), cast(0.0 as double),"
        " (acc, t) -> acc + length(t)) / size(split(text, ' '))"
    )
    # r13: this used to repartitionByRange("doc_id") first — the choice
    # back then was between a pre-shuffle (compute once post-shuffle,
    # local sort finishes the global ORDER BY) and orderBy (whose range
    # sampler re-runs the projection).  The gopher/pii A/B exposed the
    # third option: NO global order at all — the oracle canonicalizes
    # row order, so the shuffle bought nothing but determinism of file
    # layout.  Shuffle-free is scan -> project -> local sort, zero
    # exchanges (A/B in SCALE_PROBE r13_text2_ab; ``ranged=True``
    # preserves the old shape for the probe's baseline).
    base = docs.select("doc_id", "text")
    if ranged:
        base = base.repartitionByRange("doc_id")
    return (
        base.select(
            "doc_id",
            F.length("text").alias("n_chars_actual"),
            n_tokens.alias("n_tokens"),
            n_distinct.alias("n_distinct_tokens"),
            rnd(n_distinct / n_tokens, 4).alias("type_token_ratio"),
            rnd(avg_tok_len, 2).alias("avg_token_len"),
        )
        .sortWithinPartitions("doc_id")
    )


_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars_actual,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       floor((len(list_distinct(string_split(text, ' '))) /
             len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0 AS type_token_ratio,
       floor((list_sum(list_transform(string_split(text, ' '), t -> CAST(length(t) AS DOUBLE))) /
             len(string_split(text, ' '))) * 100.0 + 0.5) / 100.0 AS avg_token_len
FROM documents
ORDER BY doc_id
"""

# -- language-ID heuristic (stopword hit counts) ------------------------------

_STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}


def _lang_hits_packed() -> F.Column:
    """All four languages' stopword hit counts in ONE pass over ONE
    tokenization, packed 16 bits per language into a single long: an
    `aggregate` HOF folding `acc + weight(token)` where the weight map
    merges each word's per-language bit values ('la' counts for es AND
    fr in one add).  The pre-r11 shape (four `filter` lambdas, each
    re-splitting `text`) ran 4.39x DuckDB at 100x — HOF lambdas are
    interpreted per element; measured at 500k docs, one-pass struct
    accumulator 1.31 s, this long+literal-map fold 0.96 s vs 2.93 s
    before (original 6.12->2.46 s gopher rewrite, same pattern).  16
    bits/lang caps a doc at 65535 hits per language; to keep a lane
    from silently carrying into its neighbour on an out-of-contract
    document (corpus contract is ~2k tokens max), the fold runs over
    ``slice(tokens, 1, 65535)`` — a lane can then never exceed 65535,
    and a monster document is scored on its first 65535 tokens (the
    oracle SQL applies the identical slice, so both engines agree)."""
    weights: dict[str, int] = {}
    for i, lg in enumerate(_STOPWORDS):
        for w in _STOPWORDS[lg]:
            weights[w] = weights.get(w, 0) + (1 << (16 * i))
    wmap = "map(" + ", ".join(
        f"'{w}', {v}L" for w, v in sorted(weights.items())
    ) + ")"
    return F.expr(
        "aggregate(slice(split(text, ' '), 1, 65535), 0L,"
        f" (acc, t) -> acc + coalesce(element_at({wmap}, t), 0L))"
    )


def _lang_scored(docs: DataFrame) -> DataFrame:
    """Unordered scoring core shared by lang_id_scores (which adds the
    presentation order) and lang_id_confusion (which aggregates it)."""
    hits = {
        lg: F.expr(f"cast((p >> {16 * i}) & 65535 as int)")
        for i, lg in enumerate(_STOPWORDS)
    }
    best = F.greatest(*hits.values())
    pred = F.when(best == 0, F.lit("unknown"))
    for lg in _STOPWORDS:  # first-match priority = dict order (en,es,de,fr)
        pred = pred.when(hits[lg] == best, F.lit(lg))
    return (
        docs.select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            _lang_hits_packed().alias("p"),
        )
        # `p` is consumed 9 times below, so CollapseProject keeps the
        # aggregate in its own projection — it evaluates once per row.
        .select(
            "doc_id",
            "labeled_lang",
            *[hits[lg].alias(f"hits_{lg}") for lg in _STOPWORDS],
            pred.alias("predicted_lang"),
        )
    )


def lang_id_scores(
    spark: SparkSession, sf_dir: str, ranged: bool = False
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r13: same shuffle drop as doc_quality_scores (see its comment) —
    # the pre-shuffle existed to dodge orderBy's double execution, but
    # no global order is needed at all; the scoring projection runs
    # over the scan partitioning, zero exchanges.
    base = docs.select("doc_id", "lang", "text")
    if ranged:
        base = base.repartitionByRange("doc_id")
    return _lang_scored(base).sortWithinPartitions("doc_id")


def _lang_id_sql() -> str:
    hit_exprs = ",\n       ".join(
        "len(list_filter(string_split(text, ' ')[1:65535], t -> t IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in _STOPWORDS[lg]), lg
        )
        for lg in _STOPWORDS
    )
    best = "greatest(" + ", ".join(f"hits_{lg}" for lg in _STOPWORDS) + ")"
    pred_cases = "\n            ".join(
        f"WHEN hits_{lg} = {best} THEN '{lg}'" for lg in _STOPWORDS
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
       {hit_exprs}
  FROM documents
)
SELECT doc_id, labeled_lang, hits_en, hits_es, hits_de, hits_fr,
       CASE WHEN {best} = 0 THEN 'unknown'
            {pred_cases}
       END AS predicted_lang
FROM scored
ORDER BY doc_id
"""


# -- language-ID confusion matrix ---------------------------------------------
# Classifier-eval companion to ``lang_id_scores``: label × prediction counts
# and the per-label share.  Reuses the UNORDERED scoring core — the matrix
# is a hash-agg over a ≤ |langs|²-key domain, then a window over the
# already-aggregated rows, so the presentation shuffle would be pure waste.


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = _lang_scored(load_table(spark, sf_dir, "documents"))
    per_label = Window.partitionBy("labeled_lang")
    return (
        scored.groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "label_share",
            rnd(F.col("n_docs") / F.sum("n_docs").over(per_label), 4),
        )
        .transform(small_sorted, "labeled_lang", "predicted_lang")
    )


def _confusion_sql() -> str:
    return f"""
WITH scored AS ({_lang_id_sql()})
SELECT labeled_lang, predicted_lang, count(*) AS n_docs,
       floor((count(*) * 1.0 /
              sum(count(*)) OVER (PARTITION BY labeled_lang)) * 10000.0 + 0.5)
           / 10000.0 AS label_share
FROM scored
GROUP BY labeled_lang, predicted_lang
ORDER BY labeled_lang, predicted_lang
"""


# -- regex token filtering ----------------------------------------------------


def alpha_token_stats(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    # r13 sort-drop (see multimodal.payload_metadata): the final global
    # ORDER BY re-ran the per-token rlike filter in its range sampler
    # (shuffle-free upstream) and range-exchanged every row, buying only
    # an order the oracle canonicalizes.  A/B: r13_sortdrop_ab.
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    alpha = F.expr("size(filter(split(text, ' '), t -> t rlike '^[a-z]+$'))")
    frame = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        alpha.alias("n_alpha_tokens"),
        rnd(alpha / F.size(toks), 4).alias("alpha_ratio"),
    )
    if ordered:
        return frame.orderBy("doc_id")
    return frame.sortWithinPartitions("doc_id")


_ALPHA_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '), t -> regexp_full_match(t, '[a-z]+')))
         AS n_alpha_tokens,
       floor((len(list_filter(string_split(text, ' '), t -> regexp_full_match(t, '[a-z]+'))) /
             len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0 AS alpha_ratio
FROM documents
ORDER BY doc_id
"""

# -- token counting: whitespace + BPE-ish regex (driver spec) -----------------
# A GPT-2-flavored pre-tokenizer shape, restricted to syntax both Java
# (Spark) and RE2 (DuckDB) regex dialects evaluate identically: letter runs,
# digit runs, and single non-alphanumeric marks.

_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _bpe_kernel(pattern: str):
    """Factory: Arrow tokenize-and-count kernel for the BPE pre-tokenizer
    (locally-defined closure, shipped by value — foreign-cwd harness).

    ``re.ASCII`` pins ``\\s`` to ``[ \\t\\n\\r\\f\\v]`` — the same set
    Java's default (non-UNICODE_CHARACTER_CLASS) ``\\s`` matches — so the
    three alternation branches tokenize identically to the JVM twin.
    ``t.count(' ') + 1`` equals ``size(split(text, ' '))``: both Spark's
    ``split`` (Java ``split(re, -1)``) and DuckDB's ``string_split`` keep
    trailing empty fields."""

    def kernel(batches):
        import re

        import pandas as pd

        pat = re.compile(pattern, re.ASCII)
        for pdf in batches:
            n_ws, n_bpe, n_dist = [], [], []
            for t in pdf["text"]:
                if t is None:
                    # null text propagates null counts — the JVM twin's
                    # split/regexp_extract_all return NULL on NULL input
                    # and the DuckDB oracle does the same (r13 ADVICE:
                    # the kernel used to raise TypeError here)
                    n_ws.append(None)
                    n_bpe.append(None)
                    n_dist.append(None)
                    continue
                toks = pat.findall(t)
                n_ws.append(t.count(" ") + 1)
                n_bpe.append(len(toks))
                n_dist.append(len(set(toks)))
            yield pd.DataFrame(
                {
                    # to_numpy(): positional, not index-aligned — a
                    # reindexing pandas op upstream would otherwise
                    # silently misalign rows (r13 ADVICE)
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_ws_tokens": n_ws,
                    "n_bpe_tokens": n_bpe,
                    "n_distinct_bpe": n_dist,
                }
            )

    return kernel


def bpe_token_counts(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    """BPE pre-tokenizer counts via the Arrow kernel (r13 second half).

    After the r13 sort-drop removed this query's trailing ORDER BY
    (zero exchanges left), the residual vs DuckDB was the
    ``regexp_extract_all`` evaluation itself — Java regex materializing
    a token array per document, then ``array_distinct`` over it (2.9x
    DuckDB's RE2 at 100x docs, SCALE_PROBE ``r13_sortdrop_ab``).  The
    kernel moves the tokenization to CPython's sre + C-level
    ``len``/``set`` (guide §4.2: batches to native loops), emitting four
    ints per doc; the ratio is computed JVM-side with the shared ``rnd``
    so rounding stays bit-identical.  A/B under the equal-cache
    steady-state protocol: SCALE_PROBE ``r13_bpe_ab`` — kernel adopted;
    JVM twin kept as :func:`bpe_token_counts_jvm` (parity pinned by
    tests/test_twins.py)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select("doc_id", "text").mapInPandas(
        _bpe_kernel(_BPE_PATTERN),
        "doc_id long, n_ws_tokens int, n_bpe_tokens int, n_distinct_bpe int",
    )
    frame = counts.select(
        "doc_id",
        "n_ws_tokens",
        "n_bpe_tokens",
        "n_distinct_bpe",
        rnd(F.col("n_bpe_tokens") / F.col("n_ws_tokens"), 4).alias(
            "bpe_per_ws_token"
        ),
    )
    if ordered:
        return frame.orderBy("doc_id")
    return frame.sortWithinPartitions("doc_id")


def bpe_token_counts_jvm(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    # The pure-JVM shape (r13 first half: sort-drop already applied —
    # the sampler used to re-run the BPE regexp_extract_all once more
    # per execution, A/B: r13_sortdrop_ab).  Kept as the zero-Python
    # path for deployments that forbid Python workers.
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), 0)
    ws = F.split(F.col("text"), " ")
    frame = docs.select(
        "doc_id",
        F.size(ws).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(bpe)).alias("n_distinct_bpe"),
        rnd(F.size(bpe) / F.size(ws), 4).alias("bpe_per_ws_token"),
    )
    if ordered:
        return frame.orderBy("doc_id")
    return frame.sortWithinPartitions("doc_id")


_BPE_SQL = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS n_distinct_bpe,
       floor((len(regexp_extract_all(text, '{_BPE_PATTERN}')) * 1.0 /
              len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0
         AS bpe_per_ws_token
FROM documents
ORDER BY doc_id
"""

# -- winnowing-style rolling fingerprint --------------------------------------
# min over md5 of every 16-char window — a robust content fingerprint that
# survives small edits at the ends (document fingerprinting per driver spec).


def rolling_fingerprints(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    # r13 sort-drop (see multimodal.payload_metadata): the sampler used
    # to re-run the per-window md5 transform — one md5 per CHARACTER of
    # the corpus — a second time.  A/B: r13_sortdrop_ab.
    docs = load_table(spark, sf_dir, "documents")
    fp = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 15, 1)),"
        " i -> md5(cast(substring(text, i, 16) as binary))))"
    )
    frame = docs.select("doc_id", fp.alias("rolling_fp"))
    if ordered:
        return frame.orderBy("doc_id")
    return frame.sortWithinPartitions("doc_id")


_ROLLING_FP_SQL = """
SELECT doc_id,
       (SELECT min(md5(substr(text, g, 16)))
        FROM unnest(generate_series(1, greatest(length(text) - 15, 1))) AS t(g))
         AS rolling_fp
FROM documents
ORDER BY doc_id
"""

# -- semi-structured JSON extraction (events.props) ---------------------------
# get_json_object keeps extraction JVM-side; at scale prefer from_json with
# an explicit schema once the shape is known (single parse, typed struct).


def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            rnd(F.avg("k"), 2).alias("avg_k"),
        )
        .orderBy("event_type")
    )


_PROPS_JSON_SQL = """
SELECT event_type,
       count(CAST(props->>'$.k' AS BIGINT)) AS n,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
       floor((avg(CAST(props->>'$.k' AS BIGINT))) * 100.0 + 0.5) / 100.0 AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

# -- per-source corpus statistics --------------------------------------------


def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            rnd(F.avg(F.size(F.split(F.col("text"), " "))), 2).alias(
                "avg_tokens"
            ),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


_CORPUS_STATS_SQL = """
SELECT source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       floor((avg(len(string_split(text, ' ')))) * 100.0 + 0.5) / 100.0 AS avg_tokens,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY source
ORDER BY source
"""


# -- regex + string-function family -------------------------------------------
# extraction, counting, destructive rewrite, padding — all JVM-side string
# builtins.  Patterns are kept in the ASCII word-char subset where Java
# regex (Spark) and RE2 (DuckDB) semantics coincide; both engines replace
# non-overlapping matches left-to-right.


def doc_regex_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return (
        docs.select(
            "doc_id",
            F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_tok"),
            F.regexp_count("text", F.lit(r"\bthe\b")).alias("n_the"),
            F.length(
                F.trim(F.regexp_replace("text", r"\b[a-z]{1,3}\b", ""))
            ).alias("long_tok_chars"),
            F.lpad(F.regexp_extract("text", r"^([a-z]+)", 1), 12, "_").alias(
                "padded_first"
            ),
        )
        # r13 sort-drop: was orderBy(doc_id); the doc_id<200 pushdown
        # keeps this small, but the sampler still re-ran the four regex
        # ops (see multimodal.payload_metadata)
        .sortWithinPartitions("doc_id")
    )


_REGEX_FEATURES_SQL = r"""
SELECT doc_id,
       regexp_extract(text, '^([a-z]+)', 1) AS first_tok,
       len(regexp_extract_all(text, '\bthe\b')) AS n_the,
       length(trim(regexp_replace(text, '\b[a-z]{1,3}\b', '', 'g')))
         AS long_tok_chars,
       lpad(regexp_extract(text, '^([a-z]+)', 1), 12, '_') AS padded_first
FROM documents
WHERE doc_id < 200
ORDER BY doc_id
"""


# -- end-to-end corpus curation ----------------------------------------------
# The canonical LLM-data flow as ONE declarative plan — quality filter →
# exact-dedup keeping the canonical doc per fingerprint → deterministic
# stratified sample → per-source yield stats.  Everything stays in a single
# Catalyst plan, so the quality filter pushes into the scan, the fingerprint
# window is the only shuffle of full rows (keyed on md5 — uniformly
# distributed, skew-free), and sampling is a pushdown-able int64 predicate
# (same multiplicative-hash split as stratified_order_sample: identical row
# membership on any engine or cluster size).  Per-doc ratios are folded to
# 4-decimal ints before the average so float summation order can't flip
# rounding between engines.


def curated_documents(docs: DataFrame, sample_pct: int = 30) -> DataFrame:
    """The kept-document set of the curation pipeline (doc_id, source,
    n_tokens, ttr) — reused by the ``curate`` CLI sink and by the
    registered stats query below."""
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)) / F.size(toks)
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        F.size(toks).alias("n_tokens"),
        ttr.alias("ttr"),
    )
    quality = scored.filter((F.col("n_tokens") >= 5) & (F.col("ttr") >= 0.3))
    from pyspark.sql import Window as W

    canon = F.min("doc_id").over(W.partitionBy(F.md5("text")))
    return (
        quality.withColumn("canon_id", canon)
        .filter(
            (F.col("doc_id") == F.col("canon_id"))
            & ((F.col("doc_id") * F.lit(2654435761)) % 100 < sample_pct)
        )
        .select("doc_id", "source", "n_tokens", "ttr")
    )


def curated_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    kept = curated_documents(load_table(spark, sf_dir, "documents"))
    ttr4 = F.floor(F.col("ttr") * 10000 + F.lit(0.5)).cast("long")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("total_tokens"),
            rnd(F.sum(ttr4) / F.lit(10000.0) / F.count(F.lit(1)), 4).alias(
                "avg_ttr"
            ),
        )
        .transform(small_sorted, "source")
    )


_CURATED_SQL = """
WITH scored AS (
  SELECT doc_id, source, text,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) * 1.0
           / len(string_split(text, ' ')) AS ttr
  FROM documents
), quality AS (
  SELECT * FROM scored WHERE n_tokens >= 5 AND ttr >= 0.3
), canon AS (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
  FROM quality
), kept AS (
  SELECT * FROM canon
  WHERE doc_id = canon_id AND (doc_id * 2654435761) % 100 < 30
)
SELECT source,
       count(*) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       floor((sum(cast(floor(ttr * 10000.0 + 0.5) AS BIGINT)) / 10000.0
              / count(*)) * 10000.0 + 0.5) / 10000.0 AS avg_ttr
FROM kept
GROUP BY source
ORDER BY source
"""


# -- vocabulary builder -------------------------------------------------------
# Corpus-wide token frequencies, the precursor to tokenizer training: one
# explode + one hash aggregate with map-side partials, then true top-k.
# Scale: token keys follow a Zipf distribution, but partial aggregation
# collapses each partition's counts before the shuffle, so the hot "the"
# key moves one row per map task, not one per occurrence — the skew a naive
# repartition-by-token would suffer never reaches the exchange.


def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(100)
    )


_VOCAB_SQL = """
SELECT t.token, count(*) AS n_occurrences
FROM documents, unnest(string_split(text, ' ')) AS t(token)
WHERE t.token != ''
GROUP BY t.token
ORDER BY n_occurrences DESC, t.token
LIMIT 100
"""


# -- bigram language-model scoring --------------------------------------------
# The classic LM-based quality signal (Gopher-style): score every document
# by its mean log-probability under the corpus's own add-one-smoothed
# bigram MLE.  Out-of-distribution documents (boilerplate, garbled text,
# wrong language) score low; the column feeds the same filter layer as
# doc_quality_scores.
#
# Scale shape: two count aggregations (unigrams, bigrams — map-side
# partials absorb the Zipf skew), then the doc-bigram stream joins the
# count tables by key; vocabulary size and nothing else crosses the driver
# (1-row broadcast).  No Python in the plan.


def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    big = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w)-2),"
                    " i -> struct(w[i] as w1, w[i+1] as w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    toks = docs.select(F.explode(w).alias("tok"))
    uni = toks.groupBy(F.col("tok").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = toks.select(F.countDistinct("tok").alias("vsize"))
    bgc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    logp = F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vsize")))
    return (
        big.join(bgc, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            rnd(F.avg(logp), 4).alias("avg_logprob"),
        )
        .withColumn(
            "perplexity", rnd(F.exp(-F.col("avg_logprob")), 4)
        )
        .transform(small_sorted, "doc_id")
    )


_BIGRAM_LM_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), big AS (
  SELECT doc_id, w[g] AS w1, w[g + 1] AS w2
  FROM words, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS t(g)
  WHERE len(w) >= 2
), toks AS (
  SELECT unnest(w) AS tok FROM words
), uni AS (
  SELECT tok AS w1, count(*) AS c1 FROM toks GROUP BY tok
), vocab AS (
  SELECT count(DISTINCT tok) AS vsize FROM toks
), bgc AS (
  SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
), scored AS (
  SELECT b.doc_id, ln((c2 + 1.0) / (c1 + vsize)) AS logp
  FROM big b JOIN bgc USING (w1, w2) JOIN uni USING (w1), vocab
)
SELECT doc_id, count(*) AS n_bigrams,
       {rnd_sql('avg(logp)', 4)} AS avg_logprob,
       {rnd_sql(f"exp(-({rnd_sql('avg(logp)', 4)}))", 4)} AS perplexity
FROM scored GROUP BY doc_id
ORDER BY doc_id
"""


# -- BPE merge-pair counting (tokenizer training, step 1) ---------------------
# The inner loop of BPE training: score every adjacent symbol pair by its
# frequency-weighted occurrence count and merge the argmax.  This operator
# is that scoring pass over the initial character vocabulary — the
# candidate list the first merge picks from (`vocab_top_tokens` is the
# word-frequency precursor; this is the next artifact a tokenizer
# pipeline needs).
#
# Scale shape: the corpus collapses to the DISTINCT-word frequency table
# first (one Zipf-absorbing hash-agg — at 100 TB the vocabulary is
# millions of rows, not trillions), and pair generation explodes the
# VOCABULARY, never the corpus: cost is O(|vocab| x avg word length).
# Later BPE iterations rewrite the symbol sequences of the vocab table
# only — the same corpus-free iteration, one hash-agg per merge.


def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("score"))
        .orderBy(F.col("score").desc(), "pair")
        .limit(20)
    )


_BPE_MERGE_SQL = """
WITH words AS (
  SELECT t.word, count(*) AS freq
  FROM documents, unnest(string_split(text, ' ')) AS t(word)
  WHERE t.word != '' GROUP BY t.word
), pairs AS (
  SELECT substr(word, g, 2) AS pair, freq
  FROM words, unnest(generate_series(1, length(word) - 1)) AS s(g)
  WHERE length(word) >= 2
)
SELECT pair, CAST(sum(freq) AS BIGINT) AS score
FROM pairs GROUP BY pair
ORDER BY score DESC, pair LIMIT 20
"""


# -- BPE merge training (tokenizer training, step 2) --------------------------
# The actual BPE training loop: R rounds of score-all-pairs -> merge the
# argmax -> rewrite the vocab's symbol sequences.  Step 1
# (`bpe_merge_candidates`) is one scoring pass over the character
# vocabulary; this runs the fixpoint and emits the MERGE LIST — the
# artifact a tokenizer ships.
#
# Scale shape (the promise in step 1's docstring, kept): every round
# iterates the DISTINCT-word vocabulary only (cached once; Zipf-absorbed
# from the corpus by one hash-agg), pair scoring is one explode + one
# hash-agg over it, and the merge apply is a narrow string `replace`.
# Driver state is the merge list itself (R rows) plus one 1-row collect
# per round — the same bounded-driver-state pattern as the k-means
# centroids.  Symbols are tracked as '<sym>'-marked space-joined strings
# so the merge apply is a plain leftmost non-overlapping string replace
# with identical semantics on both engines (markers make cross-symbol
# matches impossible; corpus tokens never contain '<', '>' or spaces).

_BPE_TRAIN_ROUNDS = 5


def bpe_vocab_merges(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = _BPE_TRAIN_ROUNDS,
    batch: int = 1,
) -> DataFrame:
    """Train ``rounds`` BPE merges; emit the ranked merge list.

    ``batch`` is the scale knob for the serial-round-trip cost: the loop
    runs one Spark job (score-all-pairs + a 1-collect of the top
    candidates) per BATCH of merges, greedily taking up to ``batch``
    top-scoring pairs whose symbols are pairwise DISJOINT — disjointness
    makes the in-batch replaces order-independent, so one narrow select
    applies them all.  ``batch=1`` (the registered default) is exactly
    the serial argmax the unrolled DuckDB oracle replays.  ``batch>1``
    is the standard batched-BPE approximation: a merge in the batch may
    create a new pair scoring above a later in-batch pick, which strict
    serial training would have taken first — merge SETS converge, ranks
    can differ.  Cost: a realistic 30k-merge tokenizer is ~30k
    sequential Spark jobs at ~100 ms scheduling each (~1 h of pure
    round-trip overhead) at batch=1; batch=m cuts driver round-trips
    ~m-fold while driver state stays the merge list itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            "freq",
            F.expr("rtrim(regexp_replace(word, '(.)', '<$1> '))").alias("s"),
        )
        .cache()
    )
    state = vocab
    merges: list[tuple] = []
    try:
        while len(merges) < rounds:
            take = min(batch, rounds - len(merges))
            syms = state.filter(
                F.expr("size(split(s, ' ')) >= 2")
            ).select("freq", F.split("s", " ").alias("ss"))
            pairs = syms.select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ss) - 1), i ->"
                        " concat_ws(' ', element_at(ss, i),"
                        " element_at(ss, i + 1)))"
                    )
                ).alias("pat"),
            )
            # Overfetch so conflicting candidates can be skipped without
            # another job; 4x covers heavy symbol reuse in practice.
            top = (
                pairs.groupBy("pat")
                .agg(F.sum("freq").alias("score"))
                .orderBy(F.col("score").desc(), "pat")
                .limit(take * 4)
                .collect()
            )
            if not top:
                break
            chosen: list[tuple[str, int]] = []
            used: set[str] = set()
            for row in top:
                if len(chosen) == take:
                    break
                left_m, right_m = row["pat"].split(" ")
                if left_m in used or right_m in used:
                    continue
                chosen.append((row["pat"], row["score"]))
                used.update((left_m, right_m))
            col = F.col("s")
            for pat, score in chosen:
                merged = pat.replace("> <", "")  # '<a> <b>' -> '<ab>'
                left_m, right_m = pat.split(" ")
                merges.append(
                    (
                        len(merges) + 1,
                        left_m[1:-1],
                        right_m[1:-1],
                        merged[1:-1],
                        score,
                    )
                )
                col = F.replace(col, F.lit(pat), F.lit(merged))
            state = state.select("freq", col.alias("s"))
        return spark.createDataFrame(
            merges,
            "merge_rank int, left_sym string, right_sym string,"
            " merged string, score long",
        ).orderBy("merge_rank")
    finally:
        vocab.unpersist()


def _bpe_train_sql() -> str:
    parts = [
        """WITH v0 AS (
  SELECT freq, rtrim(regexp_replace(word, '(.)', '<\\1> ', 'g')) AS s
  FROM (SELECT t.word AS word, count(*) AS freq
        FROM documents, unnest(string_split(text, ' ')) AS t(word)
        WHERE t.word != '' GROUP BY t.word))"""
    ]
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        parts.append(f"""p{r} AS (
  SELECT ss[g] || ' ' || ss[g + 1] AS pat, sum(freq) AS score
  FROM (SELECT freq, string_split(s, ' ') AS ss FROM v{r - 1}),
       unnest(generate_series(1, len(ss) - 1)) AS u(g)
  GROUP BY pat)""")
        parts.append(
            f"b{r} AS (SELECT pat, score FROM p{r}"
            " ORDER BY score DESC, pat LIMIT 1)"
        )
        if r < _BPE_TRAIN_ROUNDS:
            parts.append(f"""v{r} AS (
  SELECT freq, replace(s, b.pat, replace(b.pat, '> <', '')) AS s
  FROM v{r - 1}, b{r} b)""")
    rows = "\nUNION ALL\n".join(
        f"""SELECT {r} AS merge_rank,
       substr(string_split(pat, ' ')[1], 2,
              length(string_split(pat, ' ')[1]) - 2) AS left_sym,
       substr(string_split(pat, ' ')[2], 2,
              length(string_split(pat, ' ')[2]) - 2) AS right_sym,
       substr(replace(pat, '> <', ''), 2,
              length(replace(pat, '> <', '')) - 2) AS merged,
       CAST(score AS BIGINT) AS score
FROM b{r}"""
        for r in range(1, _BPE_TRAIN_ROUNDS + 1)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT * FROM (\n{rows}\n) ORDER BY merge_rank\n"
    )


# -- document chunking (RAG / context-window preparation) ---------------------
# The op every retrieval or long-context pipeline runs between curation
# and embedding: split each document into fixed-size chunks with overlap
# so no retrieval boundary loses context.  Char-based here (deterministic
# and tokenizer-free); production swaps the stride for a token-aware one
# from the same BPE regex `bpe_token_counts` uses.  One narrow
# sequence+transform+explode per doc — linear, no shuffle before the
# output sort.

_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150  # 50-char overlap


def doc_chunks(
    spark: SparkSession, sf_dir: str, ordered: bool = False
) -> DataFrame:
    # r13 sort-drop (see multimodal.payload_metadata): the old global
    # ORDER BY re-ran the chunk explode in its sampler AND range-
    # exchanged every chunk row WITH its full chunk_text payload — the
    # heaviest bytes in the family crossing a shuffle for ordering the
    # oracle canonicalizes.  A/B: r13_sortdrop_ab.
    docs = load_table(spark, sf_dir, "documents")
    chunks = F.expr(
        f"transform(sequence(1, greatest(length(text), 1), {_CHUNK_STRIDE}),"
        f" s -> struct(s AS start, substring(text, s, {_CHUNK_SIZE}) AS chunk))"
    )
    frame = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("c.start").alias("chunk_start"),
        F.length("c.chunk").alias("chunk_len"),
        F.col("c.chunk").alias("chunk_text"),
    )
    if ordered:
        return frame.orderBy("doc_id", "chunk_idx")
    return frame.sortWithinPartitions("doc_id", "chunk_idx")


_DOC_CHUNKS_SQL = f"""
SELECT doc_id,
       CAST(g.i - 1 AS INTEGER) AS chunk_idx,
       1 + (g.i - 1) * {_CHUNK_STRIDE} AS chunk_start,
       length(substr(text, 1 + (g.i - 1) * {_CHUNK_STRIDE}, {_CHUNK_SIZE})) AS chunk_len,
       substr(text, 1 + (g.i - 1) * {_CHUNK_STRIDE}, {_CHUNK_SIZE}) AS chunk_text
FROM documents,
     unnest(generate_series(1,
       1 + (greatest(length(text), 1) - 1) // {_CHUNK_STRIDE})) AS g(i)
ORDER BY doc_id, chunk_idx
"""


# -- Gopher-style quality-rule flags ------------------------------------------
# The published rule-based filter family (word-count bounds, mean-word-length
# bounds, stopword presence, max-repeated-word fraction), each emitted as a
# per-document boolean plus the composite keep decision.  All rules are
# Catalyst higher-order functions over ONE tokenization — no UDF, no
# shuffle.  The max-repeated-word count is the max RUN LENGTH of the
# sorted token array (one O(n log n) sort + one O(n) aggregate with a
# struct accumulator) — identical value to the naive O(distinct × tokens)
# distinct-scan, but HOF lambdas are interpreted per element, and cutting
# their count is a measured 2.5x at 500k docs (6.12 -> 2.46 s, A/B under
# SCALE_PROBE text_100x conditions).  Same pre-shuffle range + local sort
# shape as doc_quality_scores (the sampler touches only the raw scan).


def _gopher_kernel():
    """Factory returning the Arrow metric kernel as a locally-defined
    closure: shipped by value, so the driver's foreign-cwd harness never
    needs this module importable on workers (tests/oracle gotcha)."""

    def kernel(batches):
        from collections import Counter

        import pandas as pd

        stop = frozenset(("the", "a", "of", "and", "is"))
        for pdf in batches:
            toks = [t.split(" ") for t in pdf["text"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": [len(ts) for ts in toks],
                    "mean_wlen": [
                        sum(map(len, ts)) / len(ts) for ts in toks
                    ],
                    "stop_hits": [
                        sum(1 for t in ts if t in stop) for ts in toks
                    ],
                    "top_count": [
                        max(Counter(ts).values()) for ts in toks
                    ],
                }
            )

    return kernel


def _gopher_flags_projection(metrics: DataFrame) -> DataFrame:
    """Flags + rounding over raw (n_words, mean_wlen, stop_hits,
    top_count) metrics — shared by the JVM-fold and Arrow-kernel
    variants so an A/B compares ONLY the metric computation."""
    n_words = F.col("n_words")
    mean_wlen = F.col("mean_wlen")
    top_frac = F.col("top_count").cast("double") / n_words
    word_count_ok = (n_words >= 20) & (n_words <= 1000)
    mean_wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    has_stopwords = F.col("stop_hits") >= 2
    repetition_ok = top_frac <= 0.125
    return metrics.select(
        "doc_id",
        n_words.alias("n_words"),
        rnd(mean_wlen, 2).alias("mean_word_len"),
        rnd(top_frac, 4).alias("top_word_frac"),
        word_count_ok.alias("word_count_ok"),
        mean_wlen_ok.alias("mean_word_len_ok"),
        has_stopwords.alias("has_stopwords"),
        repetition_ok.alias("repetition_ok"),
        (word_count_ok & mean_wlen_ok & has_stopwords & repetition_ok).alias(
            "keep"
        ),
    )


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rules as ONE Arrow-batched ``mapInPandas`` kernel — the
    ADOPTED fifth variant (r11 verdict #5): Python ``str.split`` /
    ``collections.Counter`` are C loops and beat Catalyst's per-element
    interpreted HOF lambdas for the top-word count, measured interleaved
    at 100x docs (SCALE_PROBE ``gopher_arrow``): 1.78 s vs the JVM
    sorted-run fold's 2.54 s (0.70x) -> 1.89x DuckDB, under the 2x bar
    the fold missed (2.15-2.70x).  Variant history, all measured:
    distinct-scan 6.12 s, explode-groupBy 6.17 s, packed-index 2.51 s,
    sorted-run fold 2.39-2.81 s (kept as
    :func:`gopher_quality_flags_jvm`), Arrow kernel ADOPTED.  Identical
    output (the flag projection is shared; int-sum-then-divide is
    IEEE-identical to the JVM fold; row-equality asserted in the probe
    AND the oracle hash).  Scale posture: narrow kernel, no shuffle, no
    state — same 100 TB shape as the multimodal decode kernels."""
    docs = load_table(spark, sf_dir, "documents")
    metrics = docs.select("doc_id", "text").mapInPandas(
        _gopher_kernel(),
        "doc_id long, n_words long, mean_wlen double,"
        " stop_hits long, top_count long",
    )
    # r12 verdict #6: the kernel used to repartitionByRange("doc_id")
    # first — a range shuffle (plus its sampling pass) in front of a
    # NARROW kernel whose output needs no particular partitioning (the
    # oracle canonicalizes ordering).  Measured at 100x docs under the
    # equal-cache steady-state protocol (SCALE_PROBE r13_text_ab, n=7):
    # shuffle-free 0.887 s vs ranged 1.607 s = 0.82x DuckDB, and the
    # plan is now scan -> kernel -> project, zero exchanges.
    return _gopher_flags_projection(metrics).sortWithinPartitions("doc_id")


def gopher_quality_flags_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-JVM sorted-run fold — the best Catalyst-expression
    variant of the four measured (2.39-2.81 s at 100x docs vs the Arrow
    kernel's 1.78 s; see :func:`gopher_quality_flags`).  Kept as the
    zero-Python path for deployments that forbid Python workers."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.col("toks")).cast("long")
    mean_wlen = F.expr(
        "aggregate(toks, cast(0.0 as double), (acc, x) -> acc + length(x))"
        " / size(toks)"
    )
    stop_hits = F.expr(
        "size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is')))"
    )
    top_count = F.expr(
        """aggregate(
            array_sort(toks),
            named_struct('prev', cast(null as string),
                         'run', cast(0 as long), 'best', cast(0 as long)),
            (acc, x) -> named_struct(
                'prev', x,
                'run', IF(x <=> acc.prev, acc.run + 1L, 1L),
                'best', GREATEST(acc.best,
                                 IF(x <=> acc.prev, acc.run + 1L, 1L))),
            acc -> acc.best)"""
    )
    top_frac = top_count.cast("double") / n_words
    word_count_ok = (n_words >= 20) & (n_words <= 1000)
    mean_wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    has_stopwords = stop_hits >= 2
    repetition_ok = top_frac <= 0.125
    return (
        docs.select("doc_id", "text")
        .repartitionByRange("doc_id")
        .select("doc_id", F.split(F.col("text"), " ").alias("toks"))
        .select(
            "doc_id",
            n_words.alias("n_words"),
            rnd(mean_wlen, 2).alias("mean_word_len"),
            rnd(top_frac, 4).alias("top_word_frac"),
            word_count_ok.alias("word_count_ok"),
            mean_wlen_ok.alias("mean_word_len_ok"),
            has_stopwords.alias("has_stopwords"),
            repetition_ok.alias("repetition_ok"),
            (word_count_ok & mean_wlen_ok & has_stopwords & repetition_ok).alias(
                "keep"
            ),
        )
        .sortWithinPartitions("doc_id")
    )


_GOPHER_FLAGS_SQL = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
    SELECT doc_id,
           len(toks) AS n_words,
           list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks) AS mean_wlen,
           len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS stop_hits,
           list_max(list_transform(list_distinct(toks), d -> len(list_filter(toks, x -> x = d)))) AS top_count
    FROM t
)
SELECT doc_id, n_words,
       floor((mean_wlen) * 100.0 + 0.5) / 100.0 AS mean_word_len,
       floor((CAST(top_count AS DOUBLE) / n_words) * 10000.0 + 0.5) / 10000.0 AS top_word_frac,
       (n_words >= 20 AND n_words <= 1000) AS word_count_ok,
       (mean_wlen >= 2.0 AND mean_wlen <= 12.0) AS mean_word_len_ok,
       (stop_hits >= 2) AS has_stopwords,
       (CAST(top_count AS DOUBLE) / n_words <= 0.125) AS repetition_ok,
       (n_words >= 20 AND n_words <= 1000 AND mean_wlen >= 2.0 AND mean_wlen <= 12.0
        AND stop_hits >= 2 AND CAST(top_count AS DOUBLE) / n_words <= 0.125) AS keep
FROM m
ORDER BY doc_id
"""

# -- PII redaction (regex scrub + audit counts) -------------------------------
# Email / phone / IPv4 patterns matched, counted, and replaced with typed
# placeholder tokens; the redacted text ships as an md5 so the oracle pins
# byte-identical scrub output without hauling full text through the driver.
# The synthetic corpus contains no PII, so the query first derives a
# deterministic enrichment (from doc_id / n_chars — same expression on both
# engines) that plants one of each pattern per document; the operator under
# test is the scrub pipeline, which at 100 TB is a narrow codegen'd map —
# no shuffle, no UDF.  Patterns stay in the Java∩RE2 common subset (no
# lookaround, no \\b) so both engines match identical spans.

_PII_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]{2,}"
_PII_PHONE = "[+]1-555-[0-9]{4}"
_PII_IP = "10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def _pii_kernel_seq(pats):
    """Factory: the 3-pass ``re.subn`` kernel (one compiled pattern per
    PII class, applied sequentially — replacement AND count per pass).
    Locally-defined closure, shipped by value (foreign-cwd harness)."""

    def kernel(batches):
        import hashlib
        import re

        import pandas as pd

        email, phone, ip = (re.compile(p) for p in pats)
        for pdf in batches:
            ne, np_, ni, ln, md = [], [], [], [], []
            for t in pdf["etext"]:
                t1, a = email.subn("[EMAIL]", t)
                t2, b = phone.subn("[PHONE]", t1)
                t3, c = ip.subn("[IP]", t2)
                ne.append(a)
                np_.append(b)
                ni.append(c)
                ln.append(len(t3))
                md.append(hashlib.md5(t3.encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_emails": ne,
                    "n_phones": np_,
                    "n_ips": ni,
                    "redacted_len": ln,
                    "redacted_md5": md,
                }
            )

    return kernel


def _pii_kernel_combined(pats):
    """Factory: ONE alternation pass ``(email)|(phone)|(ip)`` with a
    group-dispatch replacement callback — one text scan instead of
    three.  Equivalent to the sequential kernel on this corpus: the
    alternation order matches the sequential pass order (leftmost match
    wins, earlier-pass pattern tried first at equal positions), and the
    placeholder tokens contain no characters any pattern can match, so
    sequential passes never see matches created by earlier passes.

    Measured and REJECTED for the shipped path (SCALE_PROBE
    r13_text_ab: 0.886 s vs the sequential kernel's 0.713 s at 100x):
    the per-match Python callback + lastindex dispatch costs more than
    the two extra compiled-pattern scans it saves.  Kept as the
    measured alternative the next tuning round starts from."""

    def kernel(batches):
        import hashlib
        import re

        import pandas as pd

        combined = re.compile("(" + ")|(".join(pats) + ")")
        tokens = ("[EMAIL]", "[PHONE]", "[IP]")
        counts = [0, 0, 0]

        def repl(m):
            g = m.lastindex - 1
            counts[g] += 1
            return tokens[g]

        for pdf in batches:
            ne, np_, ni, ln, md = [], [], [], [], []
            for t in pdf["etext"]:
                counts[0] = counts[1] = counts[2] = 0
                t3 = combined.sub(repl, t)
                ne.append(counts[0])
                np_.append(counts[1])
                ni.append(counts[2])
                ln.append(len(t3))
                md.append(hashlib.md5(t3.encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_emails": ne,
                    "n_phones": np_,
                    "n_ips": ni,
                    "redacted_len": ln,
                    "redacted_md5": md,
                }
            )

    return kernel


_PII_SCHEMA = (
    "doc_id long, n_emails long, n_phones long, n_ips long,"
    " redacted_len long, redacted_md5 string"
)


def _pii_frame(spark, sf_dir: str, kernel, ranged: bool) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    etext = _pii_enriched_text()
    base = docs.select("doc_id", "text", "n_chars")
    if ranged:
        base = base.repartitionByRange("doc_id")
    return (
        base.select("doc_id", etext.alias("etext"))
        .mapInPandas(kernel, _PII_SCHEMA)
        .sortWithinPartitions("doc_id")
    )


def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub as ONE Arrow ``mapInPandas`` kernel — ADOPTED over the
    JVM chain after the same A/B discipline as gopher: ``re.subn`` gives
    the replacement AND the match count in one pass per pattern (3 regex
    passes total where the JVM plan needs 6: 3 regexp_replace + 3
    regexp_extract_all), measured interleaved at 100x docs 1.19 s vs
    2.18 s (0.54x) -> 1.82x DuckDB (the JVM path read 3.3x the same
    pass); rows verified identical (the patterns sit in the Java∩RE2∩
    Python-re common subset, and md5-of-identical-bytes pins the scrub
    output).  The JVM path survives as
    :func:`pii_redaction_stats_jvm` (zero-Python deployments; its staged
    single-scrub plan shape stays asserted in tests/test_plans.py).

    r13 resolved the conflicting r12 ratio readings under ONE equal-
    cache steady-state protocol (SCALE_PROBE r13_text_ab, n=7): the
    ambiguity was the leading ``repartitionByRange`` — a range shuffle
    (plus sampling pass) in front of a narrow kernel.  Shuffle-free
    sequential kernel 0.713 s = 0.82x DuckDB (shipped ranged shape was
    1.331 s = 1.54x).  Two work-cut variants measured and REJECTED
    there: one combined-alternation ``re.subn`` pass (0.886 s — the
    group-dispatch callback costs more than two extra compiled-pattern
    scans save) and a JVM ``rlike`` pre-filter (2.141 s — the gate
    re-scans every row JVM-side before the kernel sees it; on a corpus
    where most rows carry a candidate match it is pure added work).
    Scale posture: narrow kernel, zero shuffle, no state."""
    pats = (_PII_EMAIL, _PII_PHONE, _PII_IP)
    return _pii_frame(spark, sf_dir, _pii_kernel_seq(pats), ranged=False)


def _pii_enriched_text() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad(F.col("n_chars").cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1"),
    )


def pii_redaction_stats_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-JVM scrub (3 regexp_replace + 3 regexp_extract_all,
    single staged scrub projection) — kept as the zero-Python path; the
    Arrow kernel above halved it at 100x docs."""
    docs = load_table(spark, sf_dir, "documents")
    etext = _pii_enriched_text()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("etext"), _PII_EMAIL, "[EMAIL]"),
            _PII_PHONE,
            "[PHONE]",
        ),
        _PII_IP,
        "[IP]",
    )
    return (
        docs.select("doc_id", "text", "n_chars")
        .repartitionByRange("doc_id")
        .select("doc_id", etext.alias("etext"))
        # Stage the scrub in its own projection: `redacted` feeds BOTH
        # length and md5 below; inlined per consumer the optimized plan
        # carries the 3-deep replace chain twice (6 regexp_replace
        # nodes).  Runtime-neutral — whole-stage codegen's subexpression
        # elimination already shared the duplicated chain (measured
        # 2.65 s vs 2.65 s interleaved at 100x) — but the staged plan
        # states the sharing instead of relying on a codegen pass, and
        # stays shared under codegen fallback.  Plan-asserted in
        # tests/test_plans.py.
        .select("doc_id", "etext", redacted.alias("redacted"))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("etext"), F.lit(_PII_EMAIL), 0))
            .cast("long")
            .alias("n_emails"),
            F.size(F.regexp_extract_all(F.col("etext"), F.lit(_PII_PHONE), 0))
            .cast("long")
            .alias("n_phones"),
            F.size(F.regexp_extract_all(F.col("etext"), F.lit(_PII_IP), 0))
            .cast("long")
            .alias("n_ips"),
            F.length("redacted").cast("long").alias("redacted_len"),
            F.md5("redacted").alias("redacted_md5"),
        )
        .sortWithinPartitions("doc_id")
    )


_PII_REDACTION_SQL = """
WITH enriched AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@example.com or +1-555-' ||
           lpad(CAST(n_chars AS VARCHAR), 4, '0') || ' ip 10.0.' ||
           CAST(doc_id % 256 AS VARCHAR) || '.1' AS etext
    FROM documents
), red AS (
    SELECT doc_id, etext,
           regexp_replace(regexp_replace(regexp_replace(etext,
               '[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
               '[+]1-555-[0-9]{4}', '[PHONE]', 'g'),
               '10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '[IP]', 'g') AS redacted
    FROM enriched
)
SELECT doc_id,
       len(regexp_extract_all(etext, '[A-Za-z0-9._]+@[A-Za-z0-9.]+[.][A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(etext, '[+]1-555-[0-9]{4}')) AS n_phones,
       len(regexp_extract_all(etext, '10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS n_ips,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
ORDER BY doc_id
"""


QUERIES = {
    "bigram_logprob_scores": bigram_logprob_scores,
    "bpe_merge_candidates": bpe_merge_candidates,
    "bpe_vocab_merges": bpe_vocab_merges,
    "doc_chunks": doc_chunks,
    "doc_quality_scores": doc_quality_scores,
    "lang_id_scores": lang_id_scores,
    "lang_id_confusion": lang_id_confusion,
    "alpha_token_stats": alpha_token_stats,
    "bpe_token_counts": bpe_token_counts,
    "rolling_fingerprints": rolling_fingerprints,
    "corpus_stats_by_source": corpus_stats_by_source,
    "event_props_json": event_props_json,
    "doc_regex_features": doc_regex_features,
    "curated_corpus_sample": curated_corpus_sample,
    "vocab_top_tokens": vocab_top_tokens,
    "gopher_quality_flags": gopher_quality_flags,
    "pii_redaction_stats": pii_redaction_stats,
}

ORACLE = {
    "bigram_logprob_scores": _BIGRAM_LM_SQL,
    "bpe_merge_candidates": _BPE_MERGE_SQL,
    "bpe_vocab_merges": _bpe_train_sql(),
    "doc_chunks": _DOC_CHUNKS_SQL,
    "doc_regex_features": _REGEX_FEATURES_SQL,
    "doc_quality_scores": _QUALITY_SQL,
    "lang_id_scores": _lang_id_sql(),
    "lang_id_confusion": _confusion_sql(),
    "alpha_token_stats": _ALPHA_SQL,
    "bpe_token_counts": _BPE_SQL,
    "rolling_fingerprints": _ROLLING_FP_SQL,
    "corpus_stats_by_source": _CORPUS_STATS_SQL,
    "event_props_json": _PROPS_JSON_SQL,
    "curated_corpus_sample": _CURATED_SQL,
    "vocab_top_tokens": _VOCAB_SQL,
    "gopher_quality_flags": _GOPHER_FLAGS_SQL,
    "pii_redaction_stats": _PII_REDACTION_SQL,
}
