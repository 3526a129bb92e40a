"""Record linkage / entity resolution over SHORT structured fields —
the metadata-table sibling of the document dedup family (pipeline.dedup
works on long texts; a training-data pipeline also has to reconcile the
catalogs AROUND the corpus: product tables, source registries, license
records, where each "document" is a handful of tokens plus a few exact
attributes).

Model: Fellegi & Sunter (JASA 1969) record-linkage scoring, restricted
to deterministic field comparators so the whole decision is replayable
in plain SQL (the DuckDB oracle recomputes every pair's score from
scratch):

    score(a, b) = name_weight * J(tokens_a, tokens_b)
                + sum_i  w_i * [a.exact_i = b.exact_i]
    match  <=>  score >= threshold

Candidate generation is COMBINATORIAL SUBSET BLOCKING, the regime where
it wins: fields are <= max_tokens tokens, so each record can afford all
token subsets of size >= ceil(j_min * |tokens|) as blocking keys
(<= 2^max_tokens, typically a few dozen). Recall is EXACT, not
probabilistic-LSH: if J(A, B) >= j_min then |A ∩ B| >= ceil(j_min *
max(|A|, |B|)), so a subset of the intersection of every size from
max(s_A, s_B) up to |A ∩ B| exists and is emitted by BOTH sides —
`blocking_is_lossless` below derives j_min from the score weights and
refuses configurations where a match could slip past the block. Long
free-text fields stay with minhash/prefix machinery in pipeline.dedup —
2^n keys is exactly the trick that cannot scale past ~8 tokens.

Scale shape (100 TB): one map-side pass normalizes + emits keys; one
equi-join on (block_col, subset_key) produces candidates (never
all-pairs — the hard-required exact field divides every bucket); exact
Jaccard verification joins candidates against the distinct-token table;
scoring joins the (small) matched-pair set back to the records twice on
id. No windows, no driver collects; the token table is the caller-owned
`_index_cache` (see dedup.release_index_cache).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_tokens",
    "subset_block_keys",
    "blocking_is_lossless",
    "record_linkage_pairs",
    "entity_resolution",
]

# ASCII unit separator: cannot appear in normalized tokens (alnum only),
# so joined subset keys are collision-free
_SEP = "\\u001f"


def normalize_tokens(col: Column) -> Column:
    """Lowercased, alnum-only, distinct, sorted token array — the
    canonical set form both the Spark side and the SQL oracle use."""
    return F.array_sort(
        F.array_distinct(
            F.filter(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
                    ),
                    " ",
                ),
                lambda x: x != F.lit(""),
            )
        )
    )


def subset_block_keys(
    tokens_col: str, j_min: float, max_tokens: int = 8
) -> Column:
    """All subsets of the (sorted, distinct) token array with size >=
    ceil(j_min * n), each rendered as a separator-joined string key.

    Enumerated by bitmask m in [1, 2^n): `bit_count(m)` sizes the
    subset, the indexed-lambda `filter` selects elements — pure
    whole-stage-codegen expressions, no UDF. Records with more than
    ``max_tokens`` tokens raise executor-side (`raise_error` inside the
    same expression — no extra validation scan): past ~8 tokens the
    2^n key fan-out is the wrong tool and the caller should hash-shingle
    with pipeline.dedup instead.
    """
    return F.expr(
        f"""
        CASE
          WHEN size({tokens_col}) > {int(max_tokens)} THEN
            raise_error(concat(
              'subset_block_keys: record has ', cast(size({tokens_col}) as string),
              ' tokens > max_tokens={int(max_tokens)}; use pipeline.dedup shingle',
              ' blocking for long fields'))
          ELSE
            transform(
              filter(sequence(1L, shiftleft(1L, size({tokens_col})) - 1),
                     m -> bit_count(m) >= ceil({j_min!r} * size({tokens_col}))),
              m -> array_join(
                     filter({tokens_col}, (x, i) -> ((m >> i) & 1) = 1),
                     '{_SEP}'))
        END
        """
    )


def blocking_is_lossless(
    name_weight: float,
    exact_weights: dict[str, float],
    block_col: str,
    threshold: float,
) -> float:
    """Derive the Jaccard floor j_min implied by the score weights, and
    PROVE the (block_col equality) ∧ (subset-key collision) candidate
    filter cannot lose a match:

      - a pair disagreeing on ``block_col`` scores at most
        name_weight + Σ_{i≠block} w_i; that must be < threshold, else a
        match could live outside every block → ValueError.
      - a pair agreeing on everything still needs
        J >= (threshold − Σ w_i) / name_weight = j_min, which is what
        the subset keys guarantee recall for (see module docstring).

    Returns j_min (> 0 — a zero floor would need a full cross join
    within blocks and is likewise refused)."""
    if block_col not in exact_weights:
        raise ValueError(f"block_col {block_col!r} must carry a weight")
    off_block = sum(w for c, w in exact_weights.items() if c != block_col)
    if name_weight + off_block >= threshold:
        raise ValueError(
            "blocking on "
            f"{block_col!r} is lossy: a pair disagreeing on it can score "
            f"{name_weight + off_block} >= threshold {threshold}; raise the "
            "threshold or the block field's weight"
        )
    j_min = (threshold - sum(exact_weights.values())) / name_weight
    if j_min <= 0.0:
        raise ValueError(
            f"threshold {threshold} is reachable with Jaccard 0 — subset "
            "blocking needs a positive token floor; raise the threshold"
        )
    return j_min


def record_linkage_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    exact_weights: dict[str, float],
    name_weight: float = 1.5,
    threshold: float = 2.4,
    max_tokens: int = 8,
) -> DataFrame:
    """Scored matched pairs (id_a < id_b) under the Fellegi–Sunter rule
    in the module docstring. Output columns: id_a, id_b, name_jacc
    (round 6), one ``<col>_match`` 0/1 per exact field, score (round 6).

    The returned frame carries the pinned token/record index as
    ``_index_cache`` (caller releases via dedup.release_index_cache, or
    transitively via connected-components in :func:`entity_resolution`).
    """
    j_min = blocking_is_lossless(
        name_weight, exact_weights, block_col, threshold
    )
    exact_cols = list(exact_weights)
    recs = df.select(
        F.col(id_col).alias("id"),
        normalize_tokens(F.col(name_col)).alias("toks"),
        *[F.col(c) for c in exact_cols],
    ).persist()
    keys = recs.select(
        "id",
        F.col(block_col).alias("blk"),
        F.explode(subset_block_keys("toks", j_min, max_tokens)).alias("k"),
    )
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Verify + score in ONE pass over the candidate set: each side's
    # record row joins once (two id-keyed joins of the tiny candidate
    # frame against the pinned record table) and the exact intersection
    # is computed MAP-SIDE with array_intersect — ``toks`` is distinct
    # by construction, so |array_intersect| IS the set intersection the
    # token-explode/double-join/groupBy formulation counted (round-11:
    # that shape cost four joins plus a (id_a, id_b) hash aggregation
    # over the exploded candidate-token rows; this one costs two joins
    # and no aggregation — same rows, same floats, same rounding).
    a_side = recs.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("__ta"),
        *[F.col(c).alias(f"a_{c}") for c in exact_cols],
    )
    b_side = recs.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("__tb"),
        *[F.col(c).alias(f"b_{c}") for c in exact_cols],
    )
    scored = (
        cand.join(a_side, "id_a")
        .join(b_side, "id_b")
        .withColumn("inter", F.size(F.array_intersect("__ta", "__tb")))
        .withColumn("na", F.size("__ta"))
        .withColumn("nb", F.size("__tb"))
        .withColumn(
            "name_jacc",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
    )
    match_cols = {
        f"{c}_match": (F.col(f"a_{c}") == F.col(f"b_{c}")).cast("int")
        for c in exact_cols
    }
    score = F.col("name_jacc") * F.lit(name_weight)
    for c, w in exact_weights.items():
        score = score + F.col(f"{c}_match") * F.lit(w)
    out = (
        scored.withColumns(match_cols)
        .withColumn("score", score)
        # 5e-7 float slack at the threshold boundary, the containment
        # verifier's convention (dedup.ngram_containment_pairs)
        .filter(F.col("score") >= threshold - 5e-7)
        .select(
            "id_a",
            "id_b",
            F.round("name_jacc", 6).alias("name_jacc"),
            *[F.col(f"{c}_match") for c in exact_cols],
            F.round("score", 6).alias("score"),
        )
    )
    out._index_cache = recs
    return out


def entity_resolution(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    exact_weights: dict[str, float],
    name_weight: float = 1.5,
    threshold: float = 2.4,
    max_tokens: int = 8,
) -> DataFrame:
    """(id, entity_id) over the transitive closure of the matched pairs
    — entity_id = min member id, the labeling contract shared with
    dedup.connected_components. Only records participating in at least
    one match are returned (singletons are their own entity by
    definition; emitting N unchanged rows would dwarf the answer)."""
    from metric_store_release_spark.pipeline.dedup import (
        connected_components_star,
    )

    pairs = record_linkage_pairs(
        df,
        id_col,
        name_col,
        block_col,
        exact_weights,
        name_weight,
        threshold,
        max_tokens,
    )
    # components materializes the pairs and releases their _index_cache
    return connected_components_star(pairs).select(
        "id", F.col("component").alias("entity_id")
    )
