"""Byte-pair-encoding tokenizer with a real merges table (stdlib-only).

SURVEY/VERDICT gap item: `n_bpe_tokens` in text_stats is a regex
APPROXIMATION; a training-data pipeline ultimately counts tokens with
a merges-table BPE. This module implements the classic algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — public method): train learns a ranked list of symbol
merges from word frequencies; encode greedily applies the
lowest-ranked applicable merge until none applies.

Determinism contract (ties broken lexicographically, not by dict
order) makes train/encode reproducible across processes — required
because the Spark stage trains ONCE on the driver (bounded sample) and
broadcasts the merges to executors, the standard shape at corpus scale
(training reads a sample; encoding is the distributed pass).

Word model: whitespace tokens, lowercased NO — case preserved; each
word becomes (c1, c2, ..., cn, "</w>"). The end-of-word marker lets
merges distinguish suffixes from interior substrings, as in the paper.
"""

from __future__ import annotations

from collections import Counter

__all__ = ["train_bpe", "BPE", "END"]

END = "</w>"


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (END,)


def train_bpe(texts, n_merges: int = 200) -> list:
    """Learn up to ``n_merges`` merges from an iterable of texts.

    Returns the ranked merge list [(a, b), ...] — rank = position.
    Ties on pair frequency break lexicographically (smallest pair
    wins) so training is deterministic regardless of iteration order.
    Stops early when no pair occurs twice (merging hapax pairs would
    just memorize the sample).
    """
    vocab = Counter()
    for t in texts:
        if not t:
            continue
        for w in t.split():
            vocab[_word_symbols(w)] += 1
    merges: list = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        ab = a + b
        new_vocab = Counter()
        for sym, freq in vocab.items():
            out = []
            i = 0
            n = len(sym)
            while i < n:
                if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


class BPE:
    """Encoder over a trained merges table (rank-greedy, cached)."""

    def __init__(self, merges: list):
        # list of (a, b) OR [a, b] (merges round-trip through JSON/
        # broadcast as lists) — normalize to tuples for dict keys
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self._cache: dict = {}

    def encode_word(self, word: str) -> list:
        """Symbols for one whitespace token (last symbol carries </w>)."""
        cached = self._cache.get(word)
        if cached is not None:
            # fresh list per hit: the cache stores tuples, so a caller
            # mutating the returned list cannot corrupt later encodes
            return list(cached)
        sym = list(_word_symbols(word))
        ranks = self.ranks
        while len(sym) > 1:
            # classic greedy: apply the lowest-ranked pair present
            best_rank = None
            best_i = -1
            for i in range(len(sym) - 1):
                r = ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        if len(self._cache) < 65536:  # bound executor memory
            self._cache[word] = tuple(sym)
        return sym

    def encode(self, text: str) -> list:
        """All symbols of ``text`` (whitespace-split words, in order)."""
        out: list = []
        for w in text.split():
            out.extend(self.encode_word(w))
        return out

    def count_tokens(self, text: str) -> int:
        n = 0
        for w in text.split():
            n += len(self.encode_word(w))
        return n
