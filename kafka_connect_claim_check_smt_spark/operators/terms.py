"""Distinctive-term extraction — TF-IDF-style top-k terms per document,
integer-exact.

Keyword/topic-signature extraction is a standard corpus-analysis stage
(topic tagging, domain mixing weights, near-dup explanation). The usual
``tf * ln(N/df)`` is float — and cross-engine float transcendentals are
exactly the class of nondeterminism this engine bans from oracle-checked
surfaces (see BENCH/BASELINE.md round-1 lesson). Instead terms are ranked
by the exact integer score

    score = (tf * 1_000_000) DIV df

— monotone in tf/df (the idf ordering for fixed tf; the ratio IS the
relevance signal: frequent-in-doc, rare-in-corpus), deterministic in both
engines, and tie-broken by term text so top-k is unique.

Plan shape (3 key-bounded shuffles, each on a different natural key):

    tokenize (portable regex) → explode
    → groupBy(doc, term): tf                     [exchange (doc, term)]
    → groupBy(term): df over distinct docs       [exchange (term); reuses
                                                  nothing — term is a new key]
    → join tf ⋈ df on term                       [tf side re-exchanges on
                                                  term; df side reuses its
                                                  agg partitioning]
    → top-k per doc: row_number window           [exchange (doc)]

At 100 TB: every exchange is keyed by doc or term — no all-pairs, no
broadcast of the vocabulary (corpus-scale vocab outgrows a broadcast;
the term join is a plain shuffle join on purpose). Skew = the most
frequent term's df row count, bounded by |docs|; the heavy `the`-like
terms can be pre-dropped with ``max_doc_freq_ppm``, which also makes the
top-k more informative (classic stop-word pruning as a relational filter).

Tokenization uses the explicit whitespace class (not ``\\s``) — Java and
RE2 disagree on ``\\x0B``/Unicode spaces (see tools/check_oracles.py
gotchas) — and lowercases, so the DuckDB twin matches byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS = "[ \\t\\n\\r\\f\\x0B]+"


def top_terms(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_term_len: int = 2,
    max_doc_freq_ppm: int | None = None,
) -> DataFrame:
    """``(id, term, tf, df, score_ppm, rank)`` — the ``k`` most distinctive
    terms per document, ranked by exact integer ``(tf * 1e6) DIV df``
    descending, ties by term ascending. ``max_doc_freq_ppm`` drops terms
    appearing in more than that fraction (ppm) of documents."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if max_doc_freq_ppm is not None and not (0 < max_doc_freq_ppm <= 1_000_000):
        raise ValueError(
            f"max_doc_freq_ppm must be in (0, 1e6], got {max_doc_freq_ppm}"
        )
    # hash-repartition by doc id before tokenizing (same rationale as
    # minhash._spread): the tokenize+explode+map-side partial agg runs in
    # the INPUT's partitioning, and a corpus read from one parquet file
    # would run the whole stage on one core. Repartitioning by id also
    # pre-satisfies the (id, term) aggregation's distribution requirement
    # partially — and moves the raw text once instead of the ~8× larger
    # exploded token stream.
    corpus = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    par = corpus.sparkSession.sparkContext.defaultParallelism
    if corpus.rdd.getNumPartitions() < par:
        corpus = corpus.repartition(par, F.col("id"))
    tokens = corpus.select(
        "id",
        F.explode(F.split(F.lower(F.trim(F.col("__t"))), _WS)).alias("term"),
    ).filter(F.length("term") >= min_term_len)

    # tf feeds BOTH the df aggregation and the score join — without a
    # materialization Spark re-tokenizes the whole corpus for each branch
    # (plan-audited: 2 scans + 2 explodes). The checkpoint holds the
    # (doc, term, tf) relation: far smaller than the token stream, and the
    # expensive tokenize+explode+agg runs once.
    tf = tokens.groupBy("id", "term").agg(F.count("*").alias("tf")).localCheckpoint()
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_doc_freq_ppm is not None:
        # N is needed as a literal only for the ppm threshold — counting the
        # corpus unconditionally would be a wasted full scan per call at
        # 100 TB when no stop-term pruning was asked for
        n_docs = docs.count()
        df = df.filter(
            F.col("df") * 1_000_000 <= F.lit(int(max_doc_freq_ppm) * n_docs)
        )
    scored = tf.join(df, "term").withColumn(
        "score_ppm", F.expr("tf * 1000000 DIV df")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_ppm").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # row_number is INT in Spark, BIGINT in DuckDB — align the schema
        .select("id", "term", "tf", "df", "score_ppm",
                F.col("rank").cast("long").alias("rank"))
    )


def top_terms_sql(
    table: str,
    id_col: str,
    text_col: str,
    *,
    k: int = 5,
    min_term_len: int = 2,
    max_doc_freq_ppm: int | None = None,
) -> str:
    """The DuckDB twin of :func:`top_terms` (same integer arithmetic)."""
    df_filter = (
        ""
        if max_doc_freq_ppm is None
        else (
            f" HAVING count(*) * 1000000 <= {int(max_doc_freq_ppm)}"
            f" * (SELECT count(*) FROM {table})"
        )
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest(
           regexp_split_to_array(lower(trim({text_col})), '{_WS}')
         ) AS term
  FROM {table}
), toks2 AS (
  SELECT id, term FROM toks WHERE length(term) >= {int(min_term_len)}
), tf AS (
  SELECT id, term, count(*) AS tf FROM toks2 GROUP BY id, term
), dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term{df_filter}
), scored AS (
  SELECT tf.id, tf.term, tf.tf, dfreq.df,
         (tf.tf * 1000000) // dfreq.df AS score_ppm
  FROM tf JOIN dfreq USING (term)
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY id ORDER BY score_ppm DESC, term ASC
         ) AS rank
  FROM scored
)
SELECT id, term, tf, CAST(df AS BIGINT) AS df,
       CAST(score_ppm AS BIGINT) AS score_ppm, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {int(k)}
"""
