"""Set-similarity join (fuzzy entity matching) with prefix filtering.

Finds all record pairs whose token-set Jaccard similarity meets a
threshold — the entity-resolution / fuzzy-join shape the reference can
only approximate with LIKE predicates in custom SQL.

Scale design — prefix filtering (AllPairs/PPJoin family, Bayardo et al.,
WWW'07; public algorithm): order every record's distinct tokens by
global rarity (ascending document frequency), and index only the first
``n - ceil(t*n) + 1`` tokens of each record. Any pair with
``J(a,b) >= t`` must share at least one token inside BOTH prefixes, so
joining on indexed tokens alone is lossless — while the candidate join
keys are by construction the RARE tokens, which kills both the skew and
the candidate-volume blowup a naive share-any-token blocking join has
(a stopword token never lands in a prefix unless the record is almost
all stopwords). Verification computes exact Jaccard only on the
candidate pairs.

Shuffle budget: token-frequency agg, per-record regroup (sort tokens by
rarity), candidate self-join on prefix token, two id-joins to fetch the
token arrays for verification — all hash-partitioned narrow keys, no
all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs (a_id < b_id) with Jaccard(tokens_a, tokens_b) >=
    ``threshold``. ``tokens_col`` is an ``array<string>``; duplicates
    are dropped (set semantics). Returns (a_id, b_id, jaccard) with
    jaccard rounded to 6 dp.
    """
    recs = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).filter(F.size("toks") > 0)

    tok = recs.select("id", F.explode("toks").alias("t"))
    # Global rarity order: ties broken by the token string so the
    # canonical order is total and deterministic.
    dfreq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        tok.join(dfreq, "t")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "t"))
            ).alias("_s")
        )
        .select(
            "id",
            F.expr("transform(_s, x -> x.t)").alias("sorted_toks"),
        )
    )
    # Prefix length n - ceil(t*n) + 1: a J>=t pair must overlap by
    # ceil(t/(1+t)*(|a|+|b|)) >= ceil(t*n) tokens, so skipping the last
    # ceil(t*n)-1 of the canonical order cannot hide every shared token.
    prefixed = ordered.select(
        "id",
        "sorted_toks",
        F.expr(
            # the 1e-9 guards float round-up (0.7*10 -> 7.000000000000001,
            # whose ceil would shorten the prefix and break losslessness)
            "slice(sorted_toks, 1, size(sorted_toks) - "
            f"cast(ceil({threshold} * size(sorted_toks) - 1e-9) as int) + 1)"
        ).alias("prefix"),
    )
    index = prefixed.select("id", F.explode("prefix").alias("t"))
    cand = (
        index.alias("a")
        .join(index.alias("b"), "t")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    sides = prefixed.select("id", "sorted_toks")
    pairs = (
        cand.join(
            sides.select(
                F.col("id").alias("a_id"), F.col("sorted_toks").alias("a_toks")
            ),
            "a_id",
        )
        .join(
            sides.select(
                F.col("id").alias("b_id"), F.col("sorted_toks").alias("b_toks")
            ),
            "b_id",
        )
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    union = F.size("a_toks") + F.size("b_toks") - inter
    jac = inter * F.lit(1.0) / union
    return (
        pairs.select(
            "a_id",
            "b_id",
            F.round(jac, 6).alias("jaccard"),
            jac.alias("_raw"),
        )
        .filter(F.col("_raw") >= threshold)
        .drop("_raw")
    )
