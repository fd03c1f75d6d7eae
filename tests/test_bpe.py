"""BPE merge learning: the distributed loop must reproduce the classic
single-process algorithm exactly — same pair statistics, same
tie-break, same greedy merge application."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from articulation_vector_db_api_spark.functions.bpe import (
    learn_bpe_merges,
    learn_bpe_merges_py,
)

SF_DIR = "/root/testdata/sf0.001"


def _fixture_word_counts() -> dict[str, int]:
    rows = duckdb.sql(
        f"""
        SELECT w, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE length(trim(text)) > 0
        ) WHERE length(w) >= 2 GROUP BY w
        """
    ).fetchall()
    return {w: int(n) for w, n in rows}


def test_spark_bpe_matches_reference_implementation(spark):
    """Full-value parity on the real fixture: 8 learned merges, each
    (rank, left, right, merged, pair_n) identical to the classic
    get_stats/merge_vocab loop run in one process."""
    wc = _fixture_word_counts()
    expected = learn_bpe_merges_py(wc, n_merges=8)
    vocab = spark.createDataFrame(
        list(wc.items()), "word STRING, n BIGINT"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in learn_bpe_merges(spark, vocab, 8).orderBy("rank").collect()
    ]
    assert got == expected


def test_overlapping_pairs_merge_greedy_left_to_right(spark):
    """'aaaa' under merge (a,a): counted at every adjacent position
    (3 per word) but merged non-overlapping left-to-right -> 'aa','aa';
    the second merge then sees ('aa','aa')."""
    vocab = spark.createDataFrame([("aaaa", 5)], "word STRING, n BIGINT")
    rows = learn_bpe_merges(spark, vocab, 2).orderBy("rank").collect()
    assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_n"]) == ("a", "a", 15)
    assert (rows[1]["left"], rows[1]["right"], rows[1]["pair_n"]) == ("aa", "aa", 5)
    assert learn_bpe_merges_py({"aaaa": 5}, 2) == [
        (1, "a", "a", "aa", 15),
        (2, "aa", "aa", "aaaa", 5),
    ]


def test_tie_break_is_lexicographic(spark):
    vocab = spark.createDataFrame(
        [("zy", 3), ("ab", 3)], "word STRING, n BIGINT"
    )
    rows = learn_bpe_merges(spark, vocab, 1).collect()
    assert (rows[0]["left"], rows[0]["right"]) == ("a", "b")


def test_exhausted_vocab_stops_early(spark):
    """Single-symbol words yield no pairs: the loop stops and returns
    the merges learned so far (here: one, then nothing)."""
    vocab = spark.createDataFrame([("ab", 2)], "word STRING, n BIGINT")
    rows = learn_bpe_merges(spark, vocab, 5).collect()
    assert len(rows) == 1
    assert rows[0]["merged"] == "ab"


def test_spark_encode_matches_reference(spark):
    """Encode parity on the fixture: per-document BPE token totals under
    the learned 8-merge table equal the single-process encoder's."""
    from articulation_vector_db_api_spark.registry import load_all

    wc = _fixture_word_counts()
    merges = [(l, r) for _, l, r, _, _ in learn_bpe_merges_py(wc, 8)]

    from articulation_vector_db_api_spark.functions.bpe import encode_bpe_py

    rows = duckdb.sql(
        f"""
        SELECT doc_id, w, count(*) AS cnt FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE length(trim(text)) > 0
        ) WHERE length(w) >= 2 GROUP BY doc_id, w
        """
    ).fetchall()
    want: dict[int, tuple[int, int]] = {}
    for doc_id, w, cnt in rows:
        ch, tk = want.get(doc_id, (0, 0))
        want[doc_id] = (
            ch + cnt * len(w),
            tk + cnt * len(encode_bpe_py(w, merges)),
        )

    got = {
        r["doc_id"]: (r["n_chars"], r["n_bpe_tokens"])
        for r in load_all()["text_bpe_encode_tokens"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_batched_py_batch1_equals_sequential():
    """batch=1 IS the classic algorithm — the batched twin must
    reproduce learn_bpe_merges_py exactly, so existing oracles stay
    byte-identical."""
    from articulation_vector_db_api_spark.functions.bpe import (
        learn_bpe_merges_batched_py,
    )

    wc = _fixture_word_counts()
    assert learn_bpe_merges_batched_py(wc, 12, batch=1) == (
        learn_bpe_merges_py(wc, 12)
    )


def test_spark_batched_matches_batched_reference(spark):
    """Full-value parity of the BATCHED variant on the real fixture:
    64 merges in batches of 8, Spark == the single-process twin that
    replays the identical candidate-window/skip/apply rule."""
    from articulation_vector_db_api_spark.functions.bpe import (
        learn_bpe_merges_batched_py,
    )

    wc = _fixture_word_counts()
    expected = learn_bpe_merges_batched_py(wc, 64, batch=8)
    vocab = spark.createDataFrame(list(wc.items()), "word STRING, n BIGINT")
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_n"])
        for r in learn_bpe_merges(spark, vocab, 64, batch=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == expected


def test_batched_skip_rule_blocks_interacting_pairs():
    """Pairs sharing a symbol with — or consuming the merged token of
    — an earlier same-round pick must wait for the next round's
    recount; disjoint pairs batch together."""
    from articulation_vector_db_api_spark.functions.bpe import (
        learn_bpe_merges_batched_py,
    )

    # (a,b) n=9 and (c,d) n=7 are disjoint -> same round.
    # (b,c) n=8 shares b -> skipped in round 1 despite outranking (c,d).
    wc = {"ab": 9, "bc": 8, "cd": 7}
    out = learn_bpe_merges_batched_py(wc, 3, batch=3)
    assert [(m[1], m[2], m[4]) for m in out[:2]] == [
        ("a", "b", 9),
        ("c", "d", 7),
    ]
    # round 2: 'bc' words are untouched, (b,c) finally merges
    assert (out[2][1], out[2][2]) == ("b", "c")


def test_pick_disjoint_blocks_operand_producing_candidate():
    """ADVICE r8 hardening: a candidate whose merged token equals an
    earlier pick's OPERAND must be deferred — in one fold pass the
    freshly-formed token could cascade into the earlier merge,
    diverging from sequential application."""
    from articulation_vector_db_api_spark.functions.bpe import (
        _pick_disjoint,
    )

    cand = [("abc", "d", 10), ("a", "bc", 9), ("x", "y", 8)]
    picked = _pick_disjoint(cand, take=3)
    # ('a','bc') produces 'abc' == pick 1's left operand -> skipped
    assert picked == [("abc", "d", 10), ("x", "y", 8)]
    # symmetric case on the right operand
    cand = [("z", "qr", 10), ("q", "r", 9)]
    assert _pick_disjoint(cand, take=2) == [("z", "qr", 10)]
    # plain disjoint batch is untouched
    cand = [("a", "b", 5), ("c", "d", 4)]
    assert _pick_disjoint(cand, take=2) == cand
