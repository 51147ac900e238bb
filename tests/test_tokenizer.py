"""Learned BPE tokenizer: trainer math on hand-computed micro-vocabs
(pure Python), application semantics, and the end-to-end eval
contract. The full DuckDB oracle for the eval runs in
tests/test_registry.py (test_registry lane — driver window full)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quebic_spark.functions.bpe import bpe_ranks, bpe_word, train_bpe
from quebic_spark.operators.tokenizer import (
    tokenize_with,
    train_bpe_tokenizer,
)


def test_train_bpe_hand_computed_sequence():
    # "abab" x3: pair (a,b) count 6 -> merge to "ab"; then (ab,ab)
    # count 3 -> "abab". Next round has no repeating pair.
    m = train_bpe({"abab": 3}, 10)
    assert m == [("a", "b"), ("ab", "ab")]
    # classic Sennrich vocab: 'es' is the most frequent pair (9 =
    # newest 6 + widest 3), then 'est'
    m2 = train_bpe({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 2)
    assert m2 == [("e", "s"), ("es", "t")]


def test_train_bpe_tie_break_and_order_independence():
    # both pairs occur twice; lexicographic tie-break picks ('a','b')
    m = train_bpe({"ab": 2, "cd": 2}, 1)
    assert m == [("a", "b")]
    # merge list is a pure function of dict CONTENTS, not order
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert train_bpe(dict(reversed(list(wc.items()))), 10) == train_bpe(
        wc, 10
    )


def test_bpe_word_application_and_oov():
    ranks = bpe_ranks(train_bpe({"low": 5, "newest": 6}, 10))
    assert bpe_word("low", ranks) == ["low"]
    assert "".join(bpe_word("lowest", ranks)) == "lowest"
    # fully OOV word degrades to characters, round-trip intact
    assert bpe_word("xyz", ranks) == ["x", "y", "z"]
    assert bpe_word("", ranks) == []


def test_train_stops_when_nothing_repeats():
    # every word unique, every pair frequency 1: zero merges learned
    assert train_bpe({"abc": 1, "def": 1}, 50) == []


def test_tokenize_with_roundtrip_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    model = train_bpe_tokenizer(docs)
    assert 0 < len(model.merges)
    out = tokenize_with(docs, model).select(
        "doc_id",
        (
            F.concat_ws("", "bpe_tokens")
            == F.regexp_replace("text", " ", "")
        ).alias("rt"),
        F.size("bpe_tokens").alias("n"),
    )
    rows = out.collect()
    assert all(r["rt"] for r in rows)
    again = tokenize_with(docs, model).select(
        F.size("bpe_tokens").alias("n")
    ).collect()
    assert [r["n"] for r in again] == [r["n"] for r in rows]


def test_vocab_cap_binds_and_training_stays_deterministic(spark):
    # heavy-tail synthetic vocab: a few hot words + a long hapax tail
    # (the web-scale shape that OOMs an uncapped driver collect)
    rows = []
    for i in range(40):
        rows.append((f"hot{i}", ("alpha beta " * (50 - i)).strip()))
    for i in range(400):
        rows.append((f"tail{i}", f"zunique{i:04d}"))
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    capped = train_bpe_tokenizer(docs, min_count=2, max_vocab=5)
    # the floor drops every hapax tail word; the cap keeps <=5 words,
    # so only alpha/beta pairs can be learned — cap demonstrably binds
    merged = {a + b for a, b in capped.merges}
    assert merged, capped
    assert all("zunique" not in m for m in merged)

    # determinism: same data, different physical layout, same model
    again = train_bpe_tokenizer(
        docs.repartition(7), min_count=2, max_vocab=5
    )
    assert again.merges == capped.merges

    # a tie at the cap boundary resolves by word asc, not plan order:
    # every tail word has count 1, so with min_count=1 and a cap of 3
    # the survivors beyond the hot words are the lexicographically
    # first — training over them is still reproducible
    m1 = train_bpe_tokenizer(docs, min_count=1, max_vocab=3)
    m2 = train_bpe_tokenizer(docs.repartition(13), min_count=1, max_vocab=3)
    assert m1.merges == m2.merges


def test_bpe_model_round_trips_through_fs_artifact(spark, tmp_path):
    from quebic_spark.operators.tokenizer import (
        load_bpe_model,
        save_bpe_model,
        tokenize_with,
        train_bpe_tokenizer,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta alpha beta gamma") for i in range(20)],
        "doc_id long, text string",
    )
    model = train_bpe_tokenizer(docs, min_count=1)
    path = "file://" + str(tmp_path / "artifacts" / "bpe.json")
    save_bpe_model(spark, model, path)
    loaded = load_bpe_model(spark, path)
    assert loaded.merges == model.merges
    a = tokenize_with(docs, model).select("bpe_tokens").collect()
    b = tokenize_with(docs, loaded).select("bpe_tokens").collect()
    assert [r.bpe_tokens for r in a] == [r.bpe_tokens for r in b]

    import pytest

    with pytest.raises(FileNotFoundError):
        load_bpe_model(spark, "file://" + str(tmp_path / "missing.json"))
