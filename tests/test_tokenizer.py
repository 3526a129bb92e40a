"""BPE merge training semantics (pipeline.tokenizer)."""

from __future__ import annotations

from metric_store_release_spark.pipeline.tokenizer import (
    bpe_oracle_sql,
    bpe_train_merges,
)


def _py_bpe(texts: list[str], n_merges: int):
    """Straight-line reference: list-of-token words, greedy left-to-right
    merge application, (count DESC, left, right) argmax."""
    words = [list(w) for t in texts for w in t.split() if w]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for w in words:
            for a, b in zip(w, w[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        out = []
        for w in words:
            nw, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == l and w[i + 1] == r:
                    nw.append(l + r)
                    i += 2
                else:
                    nw.append(w[i])
                    i += 1
            out.append(nw)
        words = out
    return merges


def test_bpe_matches_python_reference(spark):
    texts = [
        "aaaa aaa aa",              # consecutive-pair stress: aa aa inside aaaa
        "banana bandana ban",       # shared prefixes, an/na competition
        "the cat sat on the mat",
        "zz zz zz",                 # tie-break determinism with equal counts
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train_merges(df, n_merges=6)
    assert got == _py_bpe(texts, 6)


def test_bpe_oracle_replays_training(spark):
    import duckdb

    texts = ["mississippi miss sip", "pip pip hooray"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train_merges(df, n_merges=5)
    con = duckdb.connect()
    vals = ", ".join("('" + t + "')" for t in texts)
    con.execute(f"CREATE VIEW d AS SELECT * FROM (VALUES {vals}) v(text)")
    want = [
        (int(r[0]), r[1], r[2], int(r[3]))
        for r in con.execute(bpe_oracle_sql("d", "text", 5)).fetchall()
    ]
    assert got == want


def test_bpe_exhausts_gracefully(spark):
    # single-char words have no pairs at all -> zero merges, no crash
    df = spark.createDataFrame([("a b c",)], "text string")
    assert bpe_train_merges(df, n_merges=3) == []


def test_bpe_unicode_line_separators_match_oracle(spark):
    """Java's regex '.' skips U+2028/U+2029/U+0085 while RE2's matches
    them; both sides now STRIP those chars pre-encoding so the merge
    sequence stays engine-identical on text containing them."""
    import duckdb

    texts = ["aa\u2028aa bb", "aa\u0085bb\u2029aa", "aa aa bb"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train_merges(df, n_merges=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?)", [(t,) for t in texts])
    want = [
        (int(r[0]), r[1], r[2], int(r[3]))
        for r in con.execute(bpe_oracle_sql("d", "text", 3)).fetchall()
    ]
    assert got == want


def test_bpe_token_counts_survive_exhausted_training(spark):
    """Training that exhausts before n_merges must not wipe the oracle's
    vocab chain (empty best rounds are no-ops on both sides)."""
    import duckdb

    from metric_store_release_spark.pipeline.tokenizer import (
        bpe_token_counts,
        bpe_token_counts_oracle_sql,
    )

    texts = [(1, "ab ab"), (2, "ab")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges = bpe_train_merges(df, n_merges=8)
    assert len(merges) < 8  # genuinely exhausts
    got = sorted(
        (r["doc_id"], r["n_bpe_tokens"])
        for r in bpe_token_counts(df, merges).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES (1, 'ab ab'), (2, 'ab')) v(doc_id, text)"
    )
    want = sorted(
        (int(r[0]), int(r[1]))
        for r in con.execute(
            bpe_token_counts_oracle_sql("d", "text", "doc_id", 8)
        ).fetchall()
    )
    assert got == want == [(1, 2), (2, 1)]


# ------------------------------------------------------------- MaxMatch

def test_maxmatch_hand_example(spark):
    """Hand-traced greedy segmentation: vocab top-5 of this corpus is
    {at, he, th, the, ca}; 'there' -> [the, r, e], 'sat' -> [s, at],
    'scatter' -> [s, ca, t, t, e, r]."""
    from metric_store_release_spark.pipeline.tokenizer import (
        maxmatch_token_counts,
        maxmatch_vocab,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cats sat there"), (3, "scatter the")],
        ["doc_id", "text"],
    )
    vocab = {r["piece"]: r["cnt"] for r in maxmatch_vocab(docs, k=5).collect()}
    assert vocab == {"at": 5, "he": 4, "th": 4, "the": 4, "ca": 3}
    counts = {
        r["token"]: r["n"]
        for r in maxmatch_token_counts(docs, k=5).collect()
    }
    assert counts == {
        "the": 4, "ca": 3, "t": 4, "s": 4, "at": 2, "e": 2, "r": 2,
    }


def test_maxmatch_counts_conserve_characters(spark):
    """Tokens tile each word exactly: total characters across weighted
    tokens == total characters across corpus words."""
    from pyspark.sql import functions as F

    from metric_store_release_spark.pipeline.tokenizer import (
        maxmatch_token_counts,
    )
    from metric_store_release_spark.pipeline.text import tokens

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["aa ab ba", "abab aabb", "zzz aa ab", "q qq qqq abab"]
        )],
        ["doc_id", "text"],
    )
    tok = maxmatch_token_counts(docs, k=3, max_piece_len=3)
    got = tok.select(
        F.sum(F.length("token") * F.col("n")).alias("chars")
    ).first()["chars"]
    want = docs.select(
        F.explode(tokens(F.col("text"))).alias("w")
    ).select(F.sum(F.length("w"))).first()[0]
    assert got == want


def test_unigram_viterbi_picks_best_scoring_segmentation(spark):
    """With hand-set scores the DP must take the globally best path,
    and ties must break to the longer piece."""
    from pyspark.sql import functions as F

    from metric_store_release_spark.pipeline.tokenizer import (
        _viterbi_segmented,
    )

    wc = spark.createDataFrame([("abcd", 1)], "w string, wc long")
    # "ab"+"cd" (=-2) beats "abc"+"d" (=-11) and chars (=-20)
    scores = {"a": -5, "b": -5, "c": -5, "d": -5, "ab": -1, "cd": -1,
              "abc": -1, "abcd": -30}
    toks = _viterbi_segmented(wc, scores, 4, 4).collect()[0]["toks"]
    assert toks == ["ab", "cd"]
    # tie: "ab"+"cd" == "abcd" -> longer piece wins at the last cell
    scores2 = dict(scores, abcd=-2)
    toks2 = _viterbi_segmented(wc, scores2, 4, 4).collect()[0]["toks"]
    assert toks2 == ["abcd"]


def test_unigram_em_promotes_frequent_substrings(spark):
    from metric_store_release_spark.pipeline.tokenizer import (
        unigram_token_counts,
        unigram_vocab,
    )
    from metric_store_release_spark.pipeline.dedup import release_index_cache

    docs = spark.createDataFrame(
        [(i, "lowlow lower lowest hello hellos shell") for i in range(4)],
        "doc_id long, text string",
    )
    v = {r["piece"]: r for r in unigram_vocab(docs, seed_k=16, rounds=2).collect()}
    # the dominant substrings survive training as multi-char pieces
    assert any(len(p) > 1 for p in v), v.keys()
    # every char of the corpus words is segmentable (smoothing keeps chars)
    for ch in set("lowerstshell"):
        assert ch in v
    t = unigram_token_counts(docs, seed_k=16, rounds=2)
    rows = {r["token"]: r["n"] for r in t.collect()}
    release_index_cache(t)
    # token counts are occurrence-weighted: every doc contributes
    assert sum(rows.values()) % 4 == 0
