"""Sliding token-window chunking (operators/sampling.py).

Checks the chunk arithmetic against an independent pure-Python
reference and the reconstruction invariant (stitching chunks by their
non-overlapping prefixes reproduces the original text exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from quebic_spark.operators.sampling import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    chunk_documents,
)


def _py_chunks(text: str, chunk: int, stride: int) -> list[list[str]]:
    toks = text.split(" ")
    n = len(toks)
    n_chunks = max(1, math.ceil((n - chunk) / stride) + 1)
    return [toks[i * stride: i * stride + chunk] for i in range(n_chunks)]


def _doc(doc_id: int, n_tokens: int) -> tuple[int, str]:
    return doc_id, " ".join(f"w{doc_id}_{j}" for j in range(n_tokens))


def test_chunks_match_python_reference(spark):
    # boundary sizes around the window arithmetic: short doc, exactly
    # one window, one-past, exact two-window fit, one-past, long tail
    sizes = [1, 5, CHUNK_TOKENS - 1, CHUNK_TOKENS, CHUNK_TOKENS + 1,
             CHUNK_TOKENS + CHUNK_STRIDE, CHUNK_TOKENS + CHUNK_STRIDE + 1,
             5 * CHUNK_STRIDE + 7]
    rows = [_doc(i, n) for i, n in enumerate(sizes)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_documents(docs).collect()
    }
    for doc_id, text in rows:
        expect = _py_chunks(text, CHUNK_TOKENS, CHUNK_STRIDE)
        doc_rows = [got[k] for k in got if k[0] == doc_id]
        assert len(doc_rows) == len(expect)
        for i, piece in enumerate(expect):
            r = got[(doc_id, i)]
            assert r.n_chunks == len(expect)
            assert r.chunk_tokens == len(piece)
            assert r.chunk_text == " ".join(piece)


def test_chunk_prefix_stitching_reconstructs_text(spark):
    # every chunk except the last contributes its first STRIDE tokens;
    # the last contributes all of its tokens — concatenation must be
    # the original document (proves full coverage, no gaps, no drift)
    rows = [_doc(i, n) for i, n in enumerate([3, 64, 200, 977])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        parts = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        toks: list[str] = []
        for r in parts[:-1]:
            toks.extend(r.chunk_text.split(" ")[:CHUNK_STRIDE])
        toks.extend(parts[-1].chunk_text.split(" "))
        assert " ".join(toks) == text


def test_chunk_plan_has_no_shuffle(spark, sf_dir):
    from quebic_spark.operators.sampling import q_chunk_documents

    plan = q_chunk_documents(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    # the single allowed Exchange is the deliberate round-robin
    # fan_out of the one-file local input; the operator itself must
    # not introduce a key shuffle (no hashpartitioning anywhere)
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan


def test_chunk_ids_unique_and_deterministic(spark):
    rows = [_doc(i, 150) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = chunk_documents(docs).select("chunk_id").collect()
    b = chunk_documents(docs.repartition(7)).select("chunk_id").collect()
    ids_a = sorted(r.chunk_id for r in a)
    ids_b = sorted(r.chunk_id for r in b)
    assert ids_a == ids_b
    assert len(set(ids_a)) == len(ids_a)
