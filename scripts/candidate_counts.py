"""Candidate-growth evidence for the two candidate-bound dedup joins
(judge r6 ask #5): at each scale factor, count the rows flowing through
the PassJoin edit-distance candidate stage and the shingle-containment
intersection, so SCALING.md can show whether the sf10 cost tail is
fixture entropy (candidates ≈ co-occurrences on the low-entropy
synthetic corpus) or a plan defect.

Usage: python scripts/candidate_counts.py <sf_dir> [editdist|containment]
Prints one JSON line per operator:
  editdist:    docs, keyed rows, probe/index signature rows, distinct
               candidate pairs, verified output pairs
  containment: docs, shingle postings, co-occurrence triples (the
               inherent shuffle volume), distinct candidate pairs,
               output pairs >= threshold
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from metric_store_release_spark.session import get_spark  # noqa: E402


def _editdist_input(spark, sf_dir: str):
    """The DECLARED dedup_editdist input: corpus + planted ' zq' mutants
    (same construction as __spark_entry__._dedup_editdist)."""
    import __spark_entry__ as e

    docs = e._docs(spark, sf_dir).select("doc_id", "text", "lang")
    copies = docs.filter(F.col("doc_id") % e._PLANT_EVERY == 0).withColumns(
        {
            "doc_id": F.col("doc_id") + F.lit(e._PLANT_OFFSET),
            "text": F.concat(F.col("text"), F.lit(" zq")),
        }
    )
    return docs.unionByName(copies)


def _containment_input(spark, sf_dir: str):
    """The DECLARED dedup_containment input: corpus + planted half-prefix
    copies (same construction as __spark_entry__._dedup_containment)."""
    import __spark_entry__ as e

    docs = e._docs(spark, sf_dir).select("doc_id", "text", "n_chars")
    copies = docs.filter(
        (F.col("doc_id") % e._PLANT_EVERY == 0) & (F.col("n_chars") >= 40)
    ).withColumns(
        {
            "doc_id": F.col("doc_id") + F.lit(e._PLANT_OFFSET),
            "text": F.expr("substr(text, 1, n_chars div 2)"),
        }
    )
    return docs.unionByName(copies).select("doc_id", "text")


def editdist_counts(spark, sf_dir: str) -> dict:
    from metric_store_release_spark.pipeline.editdist import (
        _candidates,
        _keyed,
        editdist_pairs,
    )

    docs = _editdist_input(spark, sf_dir)
    k, key_len, min_key = 3, 64, 8
    keyed = _keyed(docs, k, key_len, min_key, "lang", "text", "doc_id").persist()
    n_keyed = keyed.count()
    cand = _candidates(keyed, k, key_len, min_key)
    n_cand = cand.count()
    out = {
        "op": "dedup_editdist",
        "sf_dir": sf_dir,
        "docs": docs.count(),
        "keyed_rows": n_keyed,
        "cand_pairs": n_cand,
    }
    keyed.unpersist()
    pairs = editdist_pairs(docs, k=k, key_len=key_len, min_key=min_key)
    out["verified_pairs"] = pairs.count()
    from metric_store_release_spark.pipeline.dedup import release_index_cache

    release_index_cache(pairs)
    return out


def containment_counts(spark, sf_dir: str) -> dict:
    from metric_store_release_spark.pipeline.dedup import (
        _shingle_index,
        ngram_containment_pairs,
        release_index_cache,
    )

    docs = _containment_input(spark, sf_dir)
    inv_raw, sizes, inv = _shingle_index(docs, "text", "doc_id", 3)
    a, b = inv.alias("a"), inv.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    triples = joined.count()
    cand_pairs = (
        joined.select(F.col("a.doc_id"), F.col("b.doc_id")).distinct().count()
    )
    out = {
        "op": "dedup_containment",
        "sf_dir": sf_dir,
        "docs": docs.count(),
        "postings": inv_raw.count(),
        "cooccurrence_triples": triples,
        "cand_pairs": cand_pairs,
    }
    inv_raw.unpersist()
    res = ngram_containment_pairs(docs, threshold=0.8)
    out["out_pairs"] = res.count()
    release_index_cache(res)
    return out


def semdedup_counts(spark, sf_dir: str) -> dict:
    """Band-collision volume of the round-8 embedding_semdedup rewrite on
    the exact declared-query input: distinct candidate pairs (pre-cosine)
    should grow ~linearly in N because band_bits = log2(N/32) pins
    per-bucket occupancy — the evidence the first cut's fixed 8 planes
    failed (~N²/256 pairs, 40x cost per 10x at sf10)."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.similarity import (
        _banded_buckets,
        semantic_dedup,
    )

    emb = e._emb_planted(spark, sf_dir)
    bkt, band_bits = _banded_buckets(
        emb, "vec_id", "embedding", 4, 32, 24, None, None
    )
    bkt = bkt.persist()
    collisions = bkt.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    occ = collisions.agg(
        F.sum("n").alias("rows"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs_with_dups"),
        F.max("n").alias("max_bucket"),
    ).first()
    a, b = bkt.alias("a"), bkt.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id"), F.col("b.vec_id"))
        .distinct()
        .count()
    )
    bkt.unpersist()
    out_rows = semantic_dedup(emb, threshold=0.9).filter(
        ~F.col("keep")
    ).count()
    return {
        "op": "embedding_semdedup",
        "sf_dir": sf_dir,
        "vectors": emb.count(),
        "band_bits": band_bits,
        "band_collision_pairs": int(occ["pairs_with_dups"]),
        "distinct_cand_pairs": cand,
        "max_bucket": occ["max_bucket"],
        "dropped_rows": out_rows,
    }


def substring_spans_counts(spark, sf_dir: str) -> dict:
    """Candidate volume of the round-9 ExactSubstr pass on the exact
    declared-query input: dup-gram HITS (the rows entering the k×
    covered-position expansion — the only super-constant stage) and the
    distinct covered positions should both grow ~linearly in N, because
    duplicated volume is plant-proportional; a corpus-quadratic blowup
    here would mean the df filter stopped bounding the expansion."""
    import __spark_entry__ as e

    docs = e._docs(spark, sf_dir).select("doc_id", "text", "n_chars")
    copies = docs.filter(
        (F.col("doc_id") % e._PLANT_EVERY == 0) & (F.col("n_chars") >= 200)
    ).withColumns(
        {
            "doc_id": F.col("doc_id") + F.lit(e._PLANT_OFFSET),
            "text": F.concat(
                F.lit("xq"),
                F.col("doc_id").cast("string"),
                F.lit(" "),
                F.expr("substr(text, 1, n_chars div 2)"),
            ),
        }
    )
    aug = docs.unionByName(copies).select("doc_id", "text")
    k = 15
    words = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    toks = aug.select(
        F.col("doc_id").alias("id"), words.alias("__words")
    ).filter(F.size("__words") > 0)
    grams = toks.select(
        "id",
        F.when(
            F.size("__words") >= k,
            F.transform(
                F.sequence(F.lit(0), F.size("__words") - k),
                lambda s: F.xxhash64(
                    F.array_join(F.slice("__words", s + 1, k), " ")
                ),
            ),
        ).otherwise(F.expr("array()").cast("array<bigint>")).alias("__hs"),
    ).select("id", F.posexplode("__hs").alias("s", "h")).persist()
    n_grams = grams.count()
    dup = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
    )
    hits = grams.join(dup.select("h"), "h", "left_semi").persist()
    n_hits = hits.count()
    covered = hits.select(
        "id", F.explode(F.sequence(F.col("s"), F.col("s") + (k - 1))).alias("p")
    ).distinct()
    n_cov = covered.count()
    n_affected = covered.select("id").distinct().count()
    grams.unpersist()
    hits.unpersist()
    return {
        "op": "dedup_substring_spans",
        "sf_dir": sf_dir,
        "docs": aug.count(),
        "grams": n_grams,
        "dup_gram_hits": n_hits,
        "covered_positions": n_cov,
        "affected_docs": n_affected,
    }


def fuzzy_decon_counts(spark, sf_dir: str) -> dict:
    """LSH candidate volume of the round-9 fuzzy decontamination probe on
    the DECLARED fixture (edited copies of every 25th doc as the
    benchmark): candidates should stay ∝ benchmark size (the corpus term
    enters only through band-bucket occupancy), and verified pairs track
    the plant count."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.dedup import (
        fuzzy_contamination,
        minhash_band_table,
        minhash_match,
        release_index_cache,
    )

    docs = e._docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % e._PLANT_EVERY == 0).select(
        (F.col("doc_id") + F.lit(e._PLANT_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" xz qv")).alias("text"),
    )
    # Match fuzzy_contamination's ACTUAL parameters (num_hashes=8 ->
    # 2-row bands, shingle_n=3), not minhash_band_table/minhash_match's
    # own defaults (16 hashes / 4-row bands) — the stricter default LSH
    # config understated the operator's real candidate volume.
    bands_tbl = minhash_band_table(
        docs, num_hashes=8, bands=4, shingle_n=3
    )
    cands = minhash_match(bench, bands_tbl, num_hashes=8, bands=4, shingle_n=3)
    out = {
        "op": "docs_fuzzy_decontamination",
        "sf_dir": sf_dir,
        "corpus_docs": docs.count(),
        "bench_docs": bench.count(),
        "cand_pairs": cands.count(),
    }
    res = fuzzy_contamination(docs, bench)
    out["verified_pairs"] = res.count()
    release_index_cache(res)
    return out


def media_pair_counts(spark, sf_dir: str) -> dict:
    """Edge volume of the round-10 cross-modal pair dedup on the DECLARED
    fixture (image-side plants every 50th pair, caption-side every
    (50n+25)th): both edge sets must stay candidate-linear — image edges
    from the banded-Hamming join, caption edges from MinHash banding —
    and component count tracks the plant count plus the corpus's natural
    near-dup population."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.dedup import (
        hamming_code_pairs,
        leased,
        minhash_lsh_candidates,
    )
    from metric_store_release_spark.pipeline.multimodal import dhash_codes

    docs = e._docs(spark, sf_dir).select("doc_id", "text")
    ras = F.concat(
        *[F.md5(F.concat(F.lit(f"{k}:"), F.col("text"))) for k in range(9)]
    )
    ras_x = F.concat(
        *[F.md5(F.concat(F.lit(f"x{k}:"), F.col("text"))) for k in range(9)]
    )
    hdr = F.lit("P5\n18 16\n255\n")
    mt = F.lit("image/x-portable-graymap").alias("media_type")
    base = docs.select(
        F.col("doc_id").alias("pair_id"), mt,
        F.concat(hdr, ras).cast("binary").alias("payload"),
        F.col("text").alias("caption"),
    )
    img_dup = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(e._PLANT_OFFSET)).alias("pair_id"), mt,
        F.concat(hdr, F.lit("~~"), F.substring(ras, 3, 286))
        .cast("binary").alias("payload"),
        F.concat(F.lit("zz"), F.col("doc_id").cast("string")).alias("caption"),
    )
    cap_dup = docs.filter(F.col("doc_id") % 50 == 25).select(
        (F.col("doc_id") + F.lit(e._PLANT_OFFSET)).alias("pair_id"), mt,
        F.concat(hdr, ras_x).cast("binary").alias("payload"),
        F.concat(F.col("text"), F.lit(" xz qv")).alias("caption"),
    )
    pairs = base.unionByName(img_dup).unionByName(cap_dup)
    out = {"op": "media_pair_dedup", "sf_dir": sf_dir, "pairs": pairs.count()}
    codes = dhash_codes(
        pairs.select(F.col("pair_id").alias("doc_id"), "media_type", "payload")
    )
    with leased(
        hamming_code_pairs(codes, "phash", "doc_id", bits=64, max_hamming=3)
    ) as ie:
        out["img_edges"] = ie.count()
    with leased(
        minhash_lsh_candidates(
            pairs.select(F.col("pair_id").alias("doc_id"), "caption"),
            text_col="caption", id_col="doc_id", num_hashes=8,
        )
    ) as te:
        out["txt_edges"] = te.count()
    from metric_store_release_spark.pipeline.multimodal import (
        cross_modal_pair_dedup,
    )

    comp = cross_modal_pair_dedup(pairs)
    out["clustered_pairs"] = comp.count()
    out["components"] = comp.select("component").distinct().count()
    return out


def media_trimodal_counts(spark, sf_dir: str) -> dict:
    """Edge volume per family for the round-11 trimodal pair dedup on the
    DECLARED fixture (__spark_entry__._trimodal_pairs — %3 modality
    routing, one plant family per %150 residue): all four edge sets must
    stay candidate-linear across scales."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.dedup import (
        hamming_code_pairs,
        leased,
        minhash_lsh_candidates,
    )
    from metric_store_release_spark.pipeline.multimodal import (
        audio_fingerprint_codes,
        cross_modal_pair_dedup,
        dhash_codes,
        video_fingerprint_codes,
    )

    pairs = e._trimodal_pairs(spark, sf_dir)
    out = {
        "op": "media_pair_dedup_trimodal",
        "sf_dir": sf_dir,
        "pairs": pairs.count(),
    }
    media = pairs.select(
        F.col("pair_id").alias("doc_id"), "media_type", "payload"
    )
    for kind, build, code in (
        ("image", dhash_codes, "phash"),
        ("audio", audio_fingerprint_codes, "afp"),
        ("video", video_fingerprint_codes, "vfp"),
    ):
        codes = build(
            media.filter(F.col("media_type").startswith(f"{kind}/"))
        ).filter(F.col(code).isNotNull())
        with leased(
            hamming_code_pairs(codes, code, "doc_id", bits=64, max_hamming=3)
        ) as edges:
            out[f"{kind[:3]}_edges"] = edges.count()
    with leased(
        minhash_lsh_candidates(
            pairs.select(F.col("pair_id").alias("doc_id"), "caption"),
            text_col="caption", id_col="doc_id", num_hashes=8,
        )
    ) as te:
        out["txt_edges"] = te.count()
    comp = cross_modal_pair_dedup(pairs)
    out["clustered_pairs"] = comp.count()
    out["components"] = comp.select("component").distinct().count()
    return out


def records_counts(spark, sf_dir: str) -> dict:
    """Blocking-volume evidence for the round-11 record linkage on the
    DECLARED fixture (__spark_entry__._records_src — enriched part
    catalog): subset keys are linear in records by construction
    (≤ 2^5 per record); the quantity to watch is distinct blocked
    candidate pairs, which the key-derived q/r/s tokens keep
    candidate-linear despite the 16-word base vocabulary."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.dedup import leased
    from metric_store_release_spark.pipeline.records import (
        blocking_is_lossless,
        normalize_tokens,
        record_linkage_pairs,
        subset_block_keys,
    )

    src = e._records_src(spark, sf_dir)
    j_min = blocking_is_lossless(
        e._RL_NAME_W, e._RL_WEIGHTS, "brand", e._RL_THRESHOLD
    )
    keys = src.select(
        "pk", "brand", normalize_tokens(F.col("name")).alias("toks")
    ).select(
        "pk", "brand",
        F.explode(subset_block_keys("toks", j_min)).alias("k"),
    )
    cand = (
        keys.alias("a")
        .join(
            keys.alias("b"),
            (F.col("a.brand") == F.col("b.brand"))
            & (F.col("a.k") == F.col("b.k"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .select(F.col("a.pk"), F.col("b.pk"))
    )
    out = {
        "op": "records_entity_pairs",
        "sf_dir": sf_dir,
        "records": src.count(),
        "block_keys": keys.count(),
        "cand_rows": cand.count(),
        "cand_pairs": cand.distinct().count(),
    }
    with leased(
        record_linkage_pairs(
            src, "pk", "name", "brand",
            e._RL_WEIGHTS, e._RL_NAME_W, e._RL_THRESHOLD,
        )
    ) as matched:
        out["matched_pairs"] = matched.count()
    return out


def components_incr_counts(spark, sf_dir: str) -> dict:
    """Delta-proportionality evidence for incremental components: the
    super-graph the merge pass actually labels must scale with the
    BATCH (delta pairs), never the base labeling."""
    import __spark_entry__ as e

    from metric_store_release_spark.pipeline.dedup import (
        connected_components_incremental,
    )

    base_labels = e._components_labels_for(spark, sf_dir)
    out = {
        "op": "dedup_components_incr",
        "sf_dir": sf_dir,
        "base_labels": base_labels.count(),
    }
    # reuse the declared query's delta construction, then recount its
    # intermediate volumes
    import pyspark.sql.functions as F2

    docs = e._docs(spark, sf_dir).select("doc_id", "text")
    batch = docs.filter(F2.col("doc_id") % e._PLANT_EVERY == 0).withColumn(
        "doc_id", F2.col("doc_id") + F2.lit(e._PLANT_OFFSET)
    )
    out["batch_docs"] = batch.count()
    full = e._dedup_components_incr(spark, sf_dir)
    out["labels_out"] = full.count()
    # changed/new rows only — the merge-on-read state delta
    from metric_store_release_spark.pipeline.dedup import (
        minhash_band_table,
        minhash_match,
    )

    probe = minhash_match(
        batch, e._mh_index_for(spark, sf_dir),
        num_hashes=8, bands=4, shingle_n=3,
    ).select(
        F2.col("batch_id").alias("id_a"), F2.col("index_id").alias("id_b")
    )
    nb = minhash_band_table(batch, num_hashes=8, bands=4, shingle_n=3)
    selfp = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            (F2.col("a.band_id") == F2.col("b.band_id"))
            & (F2.col("a.bh") == F2.col("b.bh"))
            & (F2.col("a.doc_id") < F2.col("b.doc_id")),
        )
        .select(
            F2.col("a.doc_id").alias("id_a"),
            F2.col("b.doc_id").alias("id_b"),
        )
        .distinct()
    )
    delta = probe.unionByName(selfp)
    out["delta_pairs"] = delta.count()
    out["changed_rows"] = connected_components_incremental(
        base_labels, delta, full=False
    ).count()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark(
        app_name="candidate_counts", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("editdist", "both"):
        print(json.dumps(editdist_counts(spark, sf_dir)), flush=True)
    if which in ("containment", "both"):
        print(json.dumps(containment_counts(spark, sf_dir)), flush=True)
    if which in ("semdedup", "both"):
        print(json.dumps(semdedup_counts(spark, sf_dir)), flush=True)
    if which in ("substring_spans", "both"):
        print(json.dumps(substring_spans_counts(spark, sf_dir)), flush=True)
    if which in ("fuzzy_decon", "both"):
        print(json.dumps(fuzzy_decon_counts(spark, sf_dir)), flush=True)
    if which in ("media_pair", "both"):
        print(json.dumps(media_pair_counts(spark, sf_dir)), flush=True)
    if which in ("media_trimodal", "both"):
        print(json.dumps(media_trimodal_counts(spark, sf_dir)), flush=True)
    if which in ("records", "both"):
        print(json.dumps(records_counts(spark, sf_dir)), flush=True)
    if which in ("components_incr", "both"):
        print(json.dumps(components_incr_counts(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
