"""Distributed BPE merge training — learn a tokenizer from the corpus.

Sennrich et al. 2016 byte-pair encoding, in the word-frequency-table
formulation every real BPE trainer uses: ONE corpus pass builds the
(word, freq) table, and all K merge iterations run over that distinct-
word frame — at 100 TB the corpus is touched once, the loop touches
|vocab| rows. Per iteration:

  pairs   explode each word's adjacent symbol pairs (map-only)
  count   one combinable groupBy(pair).sum(freq) — k·|vocab| shuffle
          rows at worst, map-side combined
  argmax  the winning pair, ties to the lexicographically smallest —
          a ONE-ROW collect (the kmeans_fit scalar-probe budget)
  apply   a literal string replace over the space-joined symbol column
          (map-only; the chain of K replaces fuses into one codegen
          stage over the frozen word table)

Merge application semantics — pinned, engine-portable: symbols live in
a space-delimited string (symbols never contain spaces) and one
iteration applies ONE non-overlapping left-to-right replace pass of
`' l r '` → `' lr '`. Both Spark's `replace` and DuckDB's `replace`
continue scanning AFTER the inserted replacement, so on degenerate
runs ("a a a a" merges to [aa, a, a], not textbook-BPE's [aa, aa]) the
two engines — and the pure-Python `str.replace` the property test uses
— agree bit-for-bit; residual pairs stay counted and can win a later
rank. This is the one documented divergence from the textbook
rescan-after-merge loop (verified identical across all three engines
in tests).

Reference analogue: none (the reference ships no tokenizer); this is
the training-data-pipeline capability next to text_bpe_tokens'
fixed-regex tokenizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col

__all__ = ["bpe_train", "bpe_vocab_after_merges"]


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
    batch_merges: int = 1,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns one row per merge:
    (merge_rank, lhs, rhs, merged, pair_count), in learning order.

    Deterministic: whitespace word tokenization (the corpus-wide
    tokens contract), character-level initial symbols, winner = max
    weighted pair count with ties to the smallest pair string.

    ``batch_merges > 1`` applies up to that many merges per Spark
    round — output PROVABLY IDENTICAL to the serial trainer (see
    ``_select_batch``), cutting driver round-trips for real (32k)
    vocabularies. Measured on the sf0.001 fixture, num_merges=6:
    serial = 6 pair-count rounds; batch_merges=4 = 3 rounds (batch
    sizes 1, 2, 3 — the prefix rule stops at each first
    symbol-sharing candidate), merges bit-for-bit identical."""
    merges, _ = _train(docs, text_col, num_merges, batch_merges)
    return docs.sparkSession.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string, pair_count bigint",
    )


def bpe_vocab_after_merges(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 6,
    batch_merges: int = 1,
) -> DataFrame:
    """(word, freq, sym): the word-frequency vocabulary AFTER applying
    all ``num_merges`` learned merges — the APPLY side of the trainer
    (``sym`` is the space-joined symbol string; its piece count is the
    word's tokenized length under the learned vocabulary). Same frozen
    one-corpus-pass frame the trainer iterates on, so train + apply
    share every pass."""
    _, w = _train(docs, text_col, num_merges, batch_merges)
    return w.select("word", "freq", "sym")


def _select_batch(cand, want: int, saw_all: bool):
    """Serial-exact batch selection over the sorted candidate list
    (cnt desc, pair asc): take the maximal PREFIX whose pairs are
    pairwise symbol-disjoint, then truncate to counts STRICTLY above
    the stop bound M. Disjointness alone is not enough — applying a
    selected merge creates new pairs containing the merged symbol, and
    such a pair could outrank a later batch member. The guard closes
    that: every new pair (x, l+r) / (l+r, y) arising from a selected
    merge (l, r) is count-bounded by the OLD pair (x, l) / (r, y),
    which shares a symbol with the selection and therefore sorts at or
    below the first non-disjoint candidate — whose count is M. Keeping
    only members with cnt > M (the rank-1 winner is always safe: it IS
    the serial argmax) means no created pair, and no surviving old
    pair (disjoint counts are unchanged; overlapping counts only
    fall), can overtake any batch member, so the serial trainer picks
    exactly this sequence. When the candidate list was truncated
    (``saw_all=False``) the first non-disjoint pair may be unseen, so
    M falls back to the last collected count (conservative)."""
    selected: list[tuple[str, int, str, str]] = []
    used: set[str] = set()
    M = None
    for row in cand:
        left, right = row["pair"].split(" ", 1)
        if used & {left, right}:
            M = int(row["cnt"])
            break
        selected.append((row["pair"], int(row["cnt"]), left, right))
        used |= {left, right}
        if len(selected) == want:
            break
    if M is None and not saw_all:
        M = int(cand[-1]["cnt"])
    if M is not None:
        selected = selected[:1] + [s for s in selected[1:] if s[1] > M]
    return selected


def _train(
    docs: DataFrame, text_col: str, num_merges: int, batch_merges: int = 1
):
    """Shared trainer loop: returns (merges list, final word frame)."""
    w = (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    w = w.withColumn(
        "sym",
        F.concat(
            F.lit(" "), F.concat_ws(" ", F.split(F.col("word"), "")), F.lit(" ")
        ),
    )
    # freeze: every iteration's pair-count job re-reads this frame (plus
    # its growing chain of map-only replaces) — without the freeze each
    # of the K jobs would redo the corpus explode + groupBy shuffle
    w = w.localCheckpoint(eager=False)

    merges: list[tuple[int, str, str, str, int]] = []
    rank = 1
    while rank <= num_merges:
        want = min(batch_merges, num_merges - rank + 1)
        # collect headroom beyond the batch size: the prefix rule needs
        # to SEE the first non-disjoint candidate to bound M exactly —
        # still one bounded driver probe per round (R rows, not 1)
        limit_r = max(4 * want, 16)
        syms = F.split(F.trim(F.col("sym")), " ")
        n = F.size(syms)
        pairs = F.zip_with(
            F.slice(syms, 1, n - 1),
            F.slice(syms, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        cand = (
            w.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(limit_r)
            .collect()
        )
        if not cand:
            break
        selected = _select_batch(cand, want, saw_all=len(cand) < limit_r)
        for pair, cnt, left, right in selected:
            merged = left + right
            merges.append((rank, left, right, merged, cnt))
            rank += 1
            # disjoint replaces commute: chaining them on the frozen
            # frame applies the whole batch in one codegen stage
            w = w.withColumn(
                "sym",
                F.replace(
                    F.col("sym"), F.lit(f" {pair} "), F.lit(f" {merged} ")
                ),
            )
    return merges, w
