"""editdist_pairs (PassJoin) vs an independent banded-DP ground truth.

The ground truth shares NOTHING with the implementation: normalization is
re-implemented in Python, candidate generation is all-pairs, and the DP is
a classic banded Levenshtein. Mutants are planted at every edit distance
0..k+2 so both recall (every true pair found, with the right distance) and
precision (nothing beyond k reported) are exercised at the boundary.
"""

from __future__ import annotations

import random
import re

import pytest

from metric_store_release_spark.pipeline.editdist import editdist_pairs

K = 3
KEY_LEN = 64
MIN_KEY = 2 * (K + 1)
ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def _norm_key(text: str) -> str:
    t = text.lower()
    t = re.sub(r"[^a-z0-9 ]", " ", t)
    t = re.sub(r" +", " ", t)
    return t.strip()[:KEY_LEN]


def _lev_le_k(a: str, b: str, k: int) -> int | None:
    """Banded Levenshtein: the distance if ≤ k, else None."""
    n, m = len(a), len(b)
    if abs(n - m) > k:
        return None
    inf = k + 1
    prev = [j if j <= k else inf for j in range(m + 1)]
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        if i <= k:
            cur[0] = i
        for j in range(max(1, i - k), min(m, i + k) + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        if min(cur) > k:
            return None
        prev = cur
    return prev[m] if prev[m] <= k else None


def _mutate(rng: random.Random, s: str, edits: int) -> str:
    out = list(s)
    for _ in range(edits):
        op = rng.choice(("sub", "ins", "del"))
        pos = rng.randrange(len(out))
        ch = rng.choice(ALPHABET.strip())  # no spaces: keeps edits 1:1
        if op == "sub":
            # force a real change
            out[pos] = ch if out[pos] != ch else ("z" if ch != "z" else "q")
        elif op == "ins":
            out.insert(pos, ch)
        elif len(out) > MIN_KEY + 1:
            del out[pos]
    return "".join(out)


def _corpus(rng: random.Random):
    docs = []

    def add(text, lang):
        docs.append((len(docs), text, lang))

    for b in range(60):
        # spaces only interior and non-adjacent so normalization is 1:1
        base = "".join(
            rng.choice(ALPHABET.strip()) if i % 7 else " "
            for i in range(rng.randint(70, 90))
        ).strip()
        add(base, "en")
        if b % 2 == 0:
            # one mutant each at distances spanning the threshold
            add(_mutate(rng, base, b // 2 % (K + 3)), "en")
        if b % 10 == 0:
            add(base, "fr")  # same text, other block: must NOT pair
    for b in range(10):
        add("x" * rng.randint(1, MIN_KEY - 1), "en")  # below min_key
    return docs


@pytest.fixture(scope="module")
def found(spark):
    rng = random.Random(20260814)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in editdist_pairs(df, k=K, key_len=KEY_LEN).collect()
    }
    return docs, got


def test_matches_banded_dp_ground_truth(found):
    docs, got = found
    keyed = [
        (i, _norm_key(t), lang)
        for i, t, lang in docs
        if len(_norm_key(t)) >= MIN_KEY
    ]
    expected = {}
    for ai in range(len(keyed)):
        for bi in range(ai + 1, len(keyed)):
            ia, ka, la = keyed[ai]
            ib, kb, lb = keyed[bi]
            if la != lb:
                continue
            d = _lev_le_k(ka, kb, K)
            if d is not None:
                expected[(min(ia, ib), max(ia, ib))] = d
    assert got == expected
    # the planted mutants guarantee the test is not vacuous
    assert len(expected) >= 15
    assert {0, 1, 2, 3} <= set(expected.values())


def test_blocks_and_min_key_respected(found):
    docs, got = found
    langs = {i: lang for i, _, lang in docs}
    short = {i for i, t, _ in docs if len(_norm_key(t)) < MIN_KEY}
    for (a, b) in got:
        assert langs[a] == langs[b]
        assert a not in short and b not in short
