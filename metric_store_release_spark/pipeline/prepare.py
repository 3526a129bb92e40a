"""End-to-end training-corpus preparation: the composed pipeline a
pre-training data job actually runs, as ONE declarative Spark plan.

    raw documents
      → language ID               (map-side stopword vote)
      → quality scoring + filter  (map-side Gopher/C4-style features)
      → exact dedup, keep-one     (hash agg on content digest + equi-join)
      → deterministic sampling    (map-side hash threshold)
      → survivor manifest

Composing the stages into a single DataFrame lets Catalyst fuse every
map-side step into the scan and leaves exactly ONE wide operation — the
keep-one min_by aggregation, uniformly keyed on the content digest. At
100 TB that is a single shuffle over the quality-surviving subset,
nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import deterministic_sample, language_id, quality_features


def prepare_corpus(
    df: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Filter → dedup → sample; returns the survivor manifest
    (id, lang_pred, n_tokens, quality_score).

    Dedup keeps the smallest id per identical text (md5 digest grouping —
    same contract as dedup.exact_duplicates). Sampling is the
    hash-threshold stratified sample keyed on the PREDICTED language, so
    the whole pipeline depends only on document content, never on
    upstream metadata.
    """
    fractions = fractions if fractions is not None else {"en": 0.8}
    scored = quality_features(language_id(df), text_col=text_col)
    kept = scored.filter(
        (F.col("quality_score") >= min_quality) & F.col("lang_pred").isin(*langs)
    ).select(
        id_col, "lang_pred", "n_tokens", "quality_score",
        F.md5(F.col(text_col)).alias("__digest"),
    )
    # keep-one as a single min_by hash aggregation: one exchange keyed by
    # digest, survivor row carried as the aggregation value. The previous
    # agg + self-join formulation shuffled the same columns TWICE and —
    # worse — evaluated the whole quality/lang feature lineage once per
    # join side (measured 1.95 s vs 1.0 s at sf0.1).
    deduped = (
        kept.groupBy("__digest")
        .agg(
            F.min_by(
                F.struct(id_col, "lang_pred", "n_tokens", "quality_score"),
                F.col(id_col),
            ).alias("__s")
        )
        .select("__s.*")
    )
    sampled = deterministic_sample(
        deduped,
        fractions,
        strata_col="lang_pred",
        id_col=id_col,
        default_fraction=1.0,
        salt="prep:",
    )
    return sampled.select(id_col, "lang_pred", "n_tokens", "quality_score")
