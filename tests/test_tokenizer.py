"""BPE training/encoding vs a sequential pure-Python reference —
the distributed merge loop must learn the IDENTICAL merge list
(deterministic lexicographic tie-break), and the encoder must emit
reference tokenizations.
"""

from __future__ import annotations

from collections import Counter

import pytest

from zolo_spark.llm import tokenizer


def ref_bpe_train(texts: list[str], n_merges: int):
    """Sequential reference: the published algorithm, dict-based."""
    freqs = Counter(
        w for t in texts for w in t.lower().split(" ") if w
    )
    words = {
        w: list(w[:-1]) + [w[-1] + tokenizer.END] for w in freqs
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, then lexicographic — the determinism contract
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((a, b, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest low lower",
    "the new low price the new low price",
]


def test_bpe_train_matches_sequential_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = tokenizer.bpe_train(docs, n_merges=25, checkpoint_every=3)
    want = ref_bpe_train(TEXTS, 25)
    assert got == want
    assert len(got) >= 10  # the corpus supports a real merge sequence


def test_bpe_encode_round_trips_and_caches(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = tokenizer.bpe_train(docs, n_merges=15)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in tokenizer.bpe_encode(docs, merges).collect()}
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.lower().split(" "):
            want.extend(tokenizer.bpe_encode_word(w, ranks))
        assert out[i] == want
        # detokenization closure: concatenating tokens restores the text
        joined = "".join(out[i]).replace(tokenizer.END, " ").strip()
        assert joined == t.lower()


def test_bpe_single_char_and_empty_words(spark):
    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "  a  ")], "doc_id long, text string"
    )
    merges = tokenizer.bpe_train(docs, n_merges=5)
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in tokenizer.bpe_encode(docs, merges).collect()}
    assert out[1] == ["a" + tokenizer.END]
