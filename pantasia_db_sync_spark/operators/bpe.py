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
    ``_select_batch`` for the three conflict clauses and the strict-M
    truncation; the round-10 counterexample docs=['aacba'], k=3, m=2
    is pinned as a regression @example), cutting driver round-trips
    for real (32k) vocabularies. Measured on the sf0.001 fixture,
    num_merges=6: serial = 6 pair-count rounds; batch_merges=4 =
    3 rounds (batch sizes 1, 2, 3 — the prefix rule stops at each
    first conflicting candidate), merges bit-for-bit identical."""
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


def _select_batch(cand, want: int, saw_all: bool, created: set[str]):
    """Serial-exact batch selection over the sorted candidate list
    (cnt desc, pair asc): take the maximal PREFIX of CONFLICT-free
    pairs, then truncate to counts STRICTLY above the stop bound M.

    A candidate (l, r) CONFLICTS with the selection when
      (a) l or r is a raw symbol of a selected pair,
      (b) l or r equals a selected pair's concatenation, or the
          candidate's own concatenation l+r equals a selected symbol
          or a selected concatenation, or
      (c) l+r already exists as a vocabulary symbol (``created`` is
          the superset of all multi-char symbols: every merge ever
          emitted — initial symbols are single chars, so any
          multi-char symbol must be in it), or
      (d) the candidate is SELF-OVERLAPPING (l == r).

    Why each clause is needed for serial-exactness:
      (a) applying a selected merge (l, r) creates new pairs
          (x, l+r) / (l+r, y); each new occurrence maps to an OLD
          occurrence of (x, l) / (r, y), which raw-shares a symbol
          with the selection — so its count is <= M, the count of the
          FIRST conflicting candidate (sort is cnt desc). Keeping only
          members with cnt > M (rank 1 is always safe: it IS the
          serial argmax) means no created pair can overtake any kept
          member in the serial replay, and raw-sharing old pairs only
          FALL (occurrences consumed).
      (b) a candidate whose symbol equals a selected concatenation
          pre-exists with a counted cnt that RISES once the selected
          merge applies — its recorded count is stale, so it can
          neither be selected nor ignored: it bounds M.
      (c) same hazard one level up: if a selected pair's concatenation
          already exists as a symbol, pre-existing pairs containing it
          (possibly UNSEEN in the collected list) gain occurrences —
          their post-merge count is bounded by old_cnt + growth
          <= 2*M, which strict cnt > M does NOT dominate. Clause (c)
          forbids selecting such a pair at rank >= 2; at rank 1 the
          pick itself is still the serial argmax, but nothing later in
          the batch is provably safe, so the batch is cut to rank 1.
      (d) applying a self-overlapping merge (b, b) -> bb over a run
          'bbb...' creates pairs (bb, b) / (bb, bb) whose occurrences
          map to old occurrences of (b, b) — THE SELECTED PAIR
          ITSELF. Their counts are bounded only by cnt(b, b), not by
          M, and the conflict scan cannot see them (the selected pair
          is by definition not a conflict). For any NON-self-
          overlapping merge (l, r), every created pair maps to an old
          pair raw-sharing l or r — (x, lr) -> (x, l), (lr, y) ->
          (r, y), (lr, lr) -> (r, l) — all distinct from (l, r) when
          l != r, so clauses (a)-(c) bound them; (r, l) = (l, r)
          exactly when l == r, which is the ONE hazard those clauses
          miss (the round-11 hole: docs=['ca','bbb'], k=2, m=2 —
          selected (b,b):2 creates (bb,b):1 that ties the batch
          member (c,a):1 and beats it on the lexicographic tiebreak).
          Treatment mirrors clause (c): at rank 1 the pick is the
          serial argmax and is taken ALONE; at rank >= 2 it
          terminates the batch and bounds M (conservative — any
          later genuine conflict sorts at or below it).

    The scan continues over the ENTIRE collected list after the batch
    fills — the first conflicting candidate may sort below the last
    selected member, and M must still see it (missing this was the
    round-10 hole: docs=['aacba'], k=3, m=2 filled the batch with
    (aa,c),(b,a) and never learned that (c,b) bounded M=1, letting the
    created pair (aac,b) tie-break past (b,a) in the serial replay).
    When the candidate list was truncated (``saw_all=False``) the
    first conflicting pair may be unseen, so M is additionally capped
    by the last collected count (conservative)."""
    selected: list[tuple[str, int, str, str]] = []
    used: set[str] = set()
    concats: set[str] = set()
    M = None
    for row in cand:
        left, right = row["pair"].split(" ", 1)
        merged = left + right
        conflict = (
            bool(used & {left, right})
            or left in concats
            or right in concats
            or merged in used
            or merged in concats
        )
        if not conflict and (merged in created or left == right):
            if not selected:
                # rank-1 is the serial argmax regardless; but its
                # application can boost pre-existing pairs containing
                # `merged` (clause c) or create pairs bounded only by
                # its own count (clause d), so nothing after it is
                # provably exact
                selected.append((row["pair"], int(row["cnt"]), left, right))
                return selected[:1]
            conflict = True
        if conflict:
            M = int(row["cnt"])
            break
        if len(selected) < want:
            selected.append((row["pair"], int(row["cnt"]), left, right))
            used |= {left, right}
            concats.add(merged)
        # else: batch full — keep scanning for the first conflicting
        # candidate so M is still established (the round-10 hole)
    if M is None and not saw_all:
        # no seen conflict, but unseen pairs (cnt <= last collected)
        # may conflict: bound by the last collected count
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
        # still one bounded driver probe per round (R rows, not 1).
        # Serial (want == 1) keeps selected[:1] unconditionally, so M
        # never matters and the probe is exactly the argmax row.
        limit_r = 1 if want == 1 else max(4 * want, 16)
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
        created = {m[3] for m in merges}
        selected = _select_batch(
            cand, want, saw_all=len(cand) < limit_r, created=created
        )
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
