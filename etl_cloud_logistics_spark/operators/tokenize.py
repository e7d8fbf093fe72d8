"""Byte-pair-encoding tokenization (X4 extension): train a merge table from
distributed word frequencies, apply it corpus-wide through Arrow batches —
the real token-counting primitive a training-data pipeline runs (the regex
token counter in queries/text_ops.py approximates length; THIS produces the
vocabulary-dependent token count that decides packing, pricing and curricula).

Scale split (Sennrich et al. 2016 trained exactly this way):

- **Word frequencies are the sufficient statistic for BPE training** — not
  the corpus.  ``word_frequencies`` is one distributed shuffle
  (groupBy word); training then consumes only the top-``vocab_limit``
  (word, freq) rows — bounded model metadata, the IVF-centroid legitimacy
  class for a driver-side collect, and Zipf's law makes the tail's
  contribution to pair counts negligible (the cut is an explicit,
  documented approximation knob, not a silent cap).
- **The merge loop itself is inherently sequential** (merge k+1's counts
  depend on merge k having been applied), so it runs in plain Python over
  the ≤ vocab_limit word tuples — O(vocab · merges), independent of corpus
  size.  Ties on pair frequency break lexicographically, so training is
  deterministic for a fixed frequency table.
- **Application is embarrassingly parallel**: the merge-rank dict ships in
  the task closure (broadcast-sized: num_merges entries), ``mapInPandas``
  segments each document's words greedily by lowest merge rank, and a
  per-batch word→tokens memo exploits Zipf again (most words repeat, so
  the greedy loop runs once per DISTINCT word per batch, not per
  occurrence).

End-of-word marker ``</w>`` follows the original formulation: it lets the
learner distinguish suffix pairs from interior pairs and makes the
segmentation reversible (strip the marker, concatenate, and the word
returns — pytest-pinned).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WORD_RE = re.compile(r"[a-z0-9']+")
END = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed (word, freq) table — lowercase alpha-num word split, one
    shuffle with map-side combine."""
    words = docs.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9']+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def train_bpe(
    word_freqs: DataFrame, num_merges: int, vocab_limit: int = 2000
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the frequency table.

    Deterministic: the training sample is the top-``vocab_limit`` words by
    (freq DESC, word ASC), and pair-frequency ties break on the
    lexicographically smallest pair.  Driver-side state is the bounded
    sample only (see module docstring)."""
    rows = (
        word_freqs.orderBy(F.desc("freq"), F.asc("word")).limit(vocab_limit).collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END,): r["freq"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing repeats — further merges are word-specific noise
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (the GPT-2-style apply loop):
    repeatedly merge the present pair with the smallest training rank until
    no learned pair remains."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document: (id, n_words, n_tokens, tokens).  Arrow
    ``mapInPandas`` with the rank dict in the closure and a per-batch
    word→segmentation memo; payload text never shuffles."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("tokens", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, nt, toks = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                # NULL text tokenizes to nothing — str(None) would mint a
                # phantom 'none' word the training side never sees
                words = [] if text is None else _WORD_RE.findall(str(text).lower())
                out: list[str] = []
                for w in words:
                    seg = memo.get(w)
                    if seg is None:
                        seg = segment_word(w, ranks)
                        memo[w] = seg
                    out.extend(seg)
                ids.append(rid)
                nw.append(len(words))
                nt.append(len(out))
                toks.append(out)
            yield pd.DataFrame(
                {"_id": ids, "n_words": nw, "n_tokens": nt, "tokens": toks}
            )

    return (
        docs.select(id_col, text_col)
        .mapInPandas(run, schema=schema)
        .withColumnRenamed("_id", id_col)
    )
