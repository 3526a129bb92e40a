"""ngram_containment_pairs: directional subset/quotation dedup."""

from __future__ import annotations

import random

from metric_store_release_spark.pipeline.dedup import (
    ngram_containment_pairs,
    ngram_containment_pairs_prefix,
    ngram_jaccard_pairs,
)

LONG = " ".join(f"w{i}" for i in range(60))
QUOTE = " ".join(f"w{i}" for i in range(20))  # token-aligned prefix of LONG
OTHER = " ".join(f"x{i}" for i in range(30))


def test_quote_has_full_containment_but_low_jaccard(spark):
    df = spark.createDataFrame(
        [(1, LONG), (2, QUOTE), (3, OTHER)], "doc_id long, text string"
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs(df, threshold=0.8).collect()
    }
    # every shingle of the quote appears in the long doc: containment 1,
    # directional (the long doc is NOT contained in the quote)
    assert got == {(2, 1): 1.0}
    # the same pair is invisible to symmetric Jaccard at any useful
    # threshold: |A∩B|/|A∪B| = 18/58
    jac = ngram_jaccard_pairs(df, threshold=0.5)
    assert jac.count() == 0


def test_prefix_filter_matches_exact_verifier(spark):
    """ngram_containment_pairs_prefix must be pair-for-pair identical to
    the exact verifier: planted full containments, boundary overlaps just
    above/below the threshold, and random corpora."""
    rng = random.Random(4242)
    rows = []
    for b in range(40):
        words = [f"w{b}_{i}" for i in range(rng.randint(25, 60))]
        rows.append((len(rows), " ".join(words)))
        if b % 3 == 0:  # fully contained prefix chunk
            cut = rng.randint(10, len(words) - 5)
            rows.append((len(rows), " ".join(words[:cut])))
        if b % 4 == 0:  # ~boundary overlap: 80% from base, 20% fresh
            n = rng.randint(15, 30)
            mix = words[:n] + [f"z{b}_{i}" for i in range(max(1, n // 4))]
            rows.append((len(rows), " ".join(mix)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.8, 0.5):
        exact = {
            (r.contained_id, r.container_id): r.containment
            for r in ngram_containment_pairs(df, threshold=t).collect()
        }
        pref = {
            (r.contained_id, r.container_id): r.containment
            for r in ngram_containment_pairs_prefix(df, threshold=t).collect()
        }
        assert pref == exact
        assert len(exact) >= 10  # non-vacuous


def test_threshold_excludes_partial_overlap(spark):
    half_in = QUOTE + " " + " ".join(f"y{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, LONG), (2, half_in)], "doc_id long, text string"
    )
    # ~half of doc 2's shingles are in doc 1 → below the 0.8 bar
    assert ngram_containment_pairs(df, threshold=0.8).count() == 0
    found = ngram_containment_pairs(df, threshold=0.4).collect()
    assert [(r.contained_id, r.container_id) for r in found] == [(2, 1)]


def test_df_cap_full_recall_on_zipfian_rare_shingles(spark):
    """On a corpus whose true containment pairs share RARE shingles (the
    Zipfian web-corpus profile the cap is designed for), the capped
    variant is pair-for-pair identical to the exact verifier — and on
    ANY corpus its output is a subset with exact containment values."""
    import random

    from metric_store_release_spark.pipeline.dedup import (
        ngram_containment_pairs_capped,
    )

    rng = random.Random(99)
    rows = []
    for b in range(30):
        # per-doc-unique vocabulary: every shingle has df 1 except the
        # planted copies' (df 2) — all candidates come from rare postings
        words = [f"u{b}_{i}" for i in range(rng.randint(25, 50))]
        rows.append((len(rows), " ".join(words)))
        if b % 3 == 0:
            cut = rng.randint(10, len(words) - 5)
            rows.append((len(rows), " ".join(words[:cut])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs(df, threshold=0.8).collect()
    }
    capped = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs_capped(
            df, threshold=0.8, df_cap=5
        ).collect()
    }
    assert capped == exact
    assert len(exact) >= 8  # non-vacuous


def test_df_cap_is_subset_with_exact_values_on_hot_corpus(spark):
    """When a pair's every shared shingle exceeds the cap, the pair is
    LOST (the documented recall trade, the reason dedup_containment does
    not adopt the cap on this repo's low-entropy fixtures) — but every
    pair that IS emitted carries the exact uncapped containment value."""
    from metric_store_release_spark.pipeline.dedup import (
        ngram_containment_pairs_capped,
    )

    shared = " ".join(f"h{i}" for i in range(25))
    # 6 docs all containing the same hot block -> its shingles have df 6;
    # docs 0 and 1 are identical (pure hot content, no rare shingle)
    rows = [(0, shared), (1, shared)]
    for j in range(2, 6):
        rows.append((j, shared + " " + " ".join(f"t{j}_{i}" for i in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs(df, threshold=0.8).collect()
    }
    capped = {
        (r.contained_id, r.container_id): r.containment
        for r in ngram_containment_pairs_capped(
            df, threshold=0.8, df_cap=5
        ).collect()
    }
    # the all-hot (0, 1) pair is lost under the cap...
    assert (0, 1) in exact and (0, 1) not in capped
    # ...and everything emitted is a subset with identical exact values
    assert set(capped) < set(exact)
    assert all(exact[p] == v for p, v in capped.items())
