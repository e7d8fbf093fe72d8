"""BPE tokenizer: hand-computed merge sequence, reversible segmentation,
determinism — the pins that stand in for a SQL oracle."""

from __future__ import annotations

from etl_cloud_logistics_spark.operators.tokenize import (
    END,
    bpe_tokenize,
    segment_word,
    train_bpe,
    word_frequencies,
)

CORPUS = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


def _docs(spark):
    return spark.createDataFrame([(0, CORPUS)], "doc_id long, text string")


def test_train_bpe_matches_hand_computation(spark):
    """Classic Sennrich fixture: freq table {low:5, lower:2, newest:6,
    widest:3}.  Pair counts put (e,s)/(s,t)/(t,</w>) at 9; lexicographic
    tie-break fixes the exact order, then (l,o)/(o,w) at 7."""
    merges = train_bpe(word_frequencies(_docs(spark)), num_merges=4)
    assert merges == [("e", "s"), ("es", "t"), ("est", END), ("l", "o")]


def test_segment_word_greedy_apply(spark):
    merges = train_bpe(word_frequencies(_docs(spark)), num_merges=4)
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("newest", ranks) == ["n", "e", "w", "est" + END]
    assert segment_word("low", ranks) == ["lo", "w", END]
    # unseen word falls back to characters (open vocabulary — the point of BPE)
    assert segment_word("zq", ranks) == ["z", "q", END]


def test_tokenize_round_trips_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "the lowest newest thing"), (2, "WIDEST low!")],
        "doc_id long, text string",
    )
    merges = train_bpe(word_frequencies(_docs(spark)), num_merges=8)
    out = {r.doc_id: r for r in bpe_tokenize(docs, merges).collect()}
    for did, text in [(1, "the lowest newest thing"), (2, "widest low")]:
        words = text.lower().replace("!", "").split()
        rebuilt = "".join(out[did].tokens).replace(END, " ").split()
        assert rebuilt == words, did
        assert out[did].n_words == len(words)
        assert out[did].n_tokens == len(out[did].tokens)
        # markers: exactly one END-terminated token per word
        assert sum(1 for t in out[did].tokens if t.endswith(END)) == len(words)


def test_training_and_apply_deterministic(spark):
    wf = word_frequencies(_docs(spark))
    assert train_bpe(wf, 6) == train_bpe(wf, 6)
    docs = spark.createDataFrame(
        [(i, CORPUS) for i in range(5)], "doc_id long, text string"
    )
    merges = train_bpe(wf, 6)
    a = sorted((r.doc_id, tuple(r.tokens)) for r in bpe_tokenize(docs, merges).collect())
    b = sorted((r.doc_id, tuple(r.tokens)) for r in bpe_tokenize(docs, merges).collect())
    assert a == b


def test_merge_stops_on_singletons(spark):
    """Pairs that occur once are noise — training must stop, not memorize."""
    docs = spark.createDataFrame([(0, "abc def ghi")], "doc_id long, text string")
    merges = train_bpe(word_frequencies(docs), num_merges=50)
    assert merges == []  # every pair count is 1
