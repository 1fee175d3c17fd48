"""Byte Pair Encoding (BPE) subword vocabulary training.

Semantics contract (reference analysis/subtoken.py): tokens split into
chars plus a trailing ``' '`` end-of-word marker; each iteration merges the
adjacent symbol pair with the highest corpus frequency, tie-broken by the
shortest combined symbol length.  The reference breaks remaining ties by
set-iteration order (process-dependent); we use the lexicographically
smallest pair, making training fully deterministic.

Scale shape: the distributed part of BPE at 100 TB is the token-*type*
histogram (one hash aggregation); the merge loop itself is inherently
sequential and runs on the driver over the collected type histogram —
k iterations of Spark-wide recounting would be the wrong plan
(SURVEY.md §2.7).  ``bpe_from_corpus`` wires the two together.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Sequence, Set, Tuple


def train_bpe(token_counts: Dict[str, int], k: int):
    """Train BPE over a token-type histogram.

    Returns (vocab, merges): the symbol vocabulary (initial chars + merged
    units) and the ordered list of merge pairs."""
    # corpus: one symbol list per distinct token type, weighted by count
    corpus: List[Tuple[List[str], int]] = [
        (list(token) + [" "], count) for token, count in token_counts.items()
    ]
    vocab: Set[str] = {s for symbols, _ in corpus for s in symbols}

    pair_freq: Counter = Counter()
    pair_tokens: Dict[Tuple[str, str], Set[int]] = {}
    for ti, (symbols, count) in enumerate(corpus):
        for pair in zip(symbols, symbols[1:]):
            pair_freq[pair] += count
            pair_tokens.setdefault(pair, set()).add(ti)

    merges: List[Tuple[str, str]] = []
    for _ in range(k):
        if not pair_freq:
            break
        # max frequency, then shortest combined length, then lexicographic
        best = min(
            pair_freq.items(),
            key=lambda kv: (-kv[1], len(kv[0][0]) + len(kv[0][1]), kv[0]),
        )[0]
        if pair_freq[best] <= 0:
            break
        merged = best[0] + best[1]
        merges.append(best)
        vocab.add(merged)
        for ti in sorted(pair_tokens.get(best, ())):
            symbols, count = corpus[ti]
            # remove the token's old pair contributions
            for pair in zip(symbols, symbols[1:]):
                pair_freq[pair] -= count
                if pair_freq[pair] <= 0:
                    del pair_freq[pair]
                bucket = pair_tokens.get(pair)
                if bucket is not None:
                    bucket.discard(ti)
            # apply the merge left-to-right
            out: List[str] = []
            i = 0
            while i < len(symbols):
                if (i + 1 < len(symbols) and symbols[i] == best[0]
                        and symbols[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            corpus[ti] = (out, count)
            # add the new contributions
            for pair in zip(out, out[1:]):
                pair_freq[pair] += count
                pair_tokens.setdefault(pair, set()).add(ti)
    return vocab, merges


def encode_bpe(token: str, merges: Sequence[Tuple[str, str]]) -> List[str]:
    """Segment one token with a learned merge list (training-order greedy)."""
    symbols = list(token) + [" "]
    rank = {pair: i for i, pair in enumerate(merges)}
    while True:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = rank.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i:best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_from_corpus(df, text_col: str = "text", k: int = 200,
                    max_types: int = 50_000):
    """Distributed token-type histogram -> driver-side BPE training.

    Returns (vocab, merges).  ``max_types`` caps the histogram pulled to
    the driver (most frequent types first; deterministic tie order)."""
    from pyspark.sql import functions as F

    hist = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                  .alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(max_types)
        .collect()
    )
    return train_bpe({r.token: r.freq for r in hist}, k)
