"""Byte-pair-encoding tokenizer: deterministic training + application.

The tokenizer-training step of an LLM data pipeline, split the same
way as the quality classifier (`operators/classifier.py`):

* CORPUS PASS (scales): word frequencies via explode + groupBy — the
  only thing BPE training actually consumes (the classic algorithm
  trains on the word-frequency dict, not the raw text), so the
  driver sees vocab-sized data however big the corpus is.
* TRAIN (driver, pure Python): greedy pair merging over the weighted
  vocab. Deterministic: ties in pair frequency break lexicographically
  — no hash-order or insertion-order dependence.
* APPLY (scales): merge ranks broadcast to an Arrow-batched pandas
  UDF; per-batch word memoization makes the cost per DISTINCT word,
  not per token occurrence.

No end-of-word marker scheme: merges never cross word boundaries and
token concatenation reproduces the word exactly, which gives the
apply path a machine-checkable round-trip contract.
"""

from __future__ import annotations


def train_bpe(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merge rules from a word->count dict.

    Classic Sennrich et al. 2016 training: repeatedly merge the most
    frequent adjacent symbol pair (weighted by word frequency).
    Stops early when no pair occurs twice. Ties break on the pair
    itself (lexicographic), making the rule list a pure function of
    the counts dict's CONTENTS."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break  # nothing repeats: further merges memorize noise
        a, b = best[0]
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == a
                    and sym[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
        merges.append((a, b))
    return merges


def bpe_ranks(
    merges: list[tuple[str, str]],
) -> dict[tuple[str, str], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


def bpe_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Tokenize one word: repeatedly merge the LOWEST-RANK adjacent
    pair (the application order that exactly inverts training)."""
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym
