"""Distributed BPE merge learning (Sennrich et al. 2016, public
paper): learn the first N byte-pair merges of a tokenizer from a
corpus.

Why this shape scales: BPE trains on the WORD-FREQUENCY table, not the
corpus — the corpus collapses to (word, n) once (one shuffle, output
bounded by vocabulary size, which grows ~Heaps' law, sub-linearly in
corpus bytes), and every merge iteration runs on that compact frame:

- pair counting is a map-side explode + partial/final aggregate whose
  key space is ≤ |alphabet ∪ learned tokens|², tiny;
- the argmax pair is a TakeOrdered of ONE row (count desc, then
  lexicographic pair for a deterministic tie-break);
- applying the merge is a narrow per-row array fold, no shuffle;
- per-iteration ``localCheckpoint`` truncates lineage so N iterations
  cost N plans, not one 2^N plan (the connected-components lesson).

The driver holds only the learned merge table (N rows) — never ids,
words, or text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _explode_chars(w: Column) -> Column:
    """word → array of single-character symbols."""
    return F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, F.lit(1))
    )


def _apply_merge(seq: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — the fold keeps the merged token as the new tail, so
    overlapping occurrences ("aaa" under (a,a)) merge non-overlapping
    left-to-right exactly like the reference implementation."""
    merged = left + right
    return F.aggregate(
        seq,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    spark: SparkSession, vocab: DataFrame, n_merges: int
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word STRING, n BIGINT)
    frequency frame; returns a DataFrame
    (rank INT, left STRING, right STRING, merged STRING, pair_n BIGINT)
    built from the N-row merge table the loop accumulates."""
    df = vocab.select(
        _explode_chars(F.col("word")).alias("seq"), F.col("n").cast("long")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = df.select(
            F.explode(
                F.filter(
                    F.transform(
                        F.col("seq"),
                        lambda x, i: F.struct(
                            x.alias("l"),
                            # try_: the last position has no successor
                            # (ANSI mode makes element_at throw there)
                            F.try_element_at(F.col("seq"), i + 2).alias("r"),
                        ),
                    ),
                    lambda p: p["r"].isNotNull(),
                )
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("pn"))
            .orderBy(F.desc("pn"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, pn = top[0]["l"], top[0]["r"], int(top[0]["pn"])
        merges.append((rank, l, r, l + r, pn))
        df = df.select(
            _apply_merge(F.col("seq"), l, r).alias("seq"), "n"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank INT, left STRING, right STRING, merged STRING, pair_n BIGINT"
    )


def learn_bpe_merges_py(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Single-process reference implementation (classic get_stats /
    merge_vocab loop) used by the parity test — same per-adjacent-
    position pair counting, same greedy left-to-right merge, same
    (count desc, pair lexicographic) tie-break."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        stats: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] = (
                    stats.get((sym[i], sym[i + 1]), 0) + n
                )
        if not stats:
            break
        (l, r), pn = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, l, r, l + r, pn))
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            merged: list[str] = []
            for x in sym:
                if merged and merged[-1] == l and x == r:
                    merged[-1] = l + r
                else:
                    merged.append(x)
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return out


def apply_bpe_merges(seq: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode: apply an ordered, already-learned merge table to a
    symbol array — one narrow fold per merge, chained in rank order
    (the plan nests |merges| expressions, no shuffle, no Python)."""
    for left, right in merges:
        seq = _apply_merge(seq, left, right)
    return seq


def encode_bpe_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encode for the parity test."""
    sym = list(word)
    for left, right in merges:
        out: list[str] = []
        for x in sym:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        sym = out
    return sym
