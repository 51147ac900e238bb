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


# ---------------------------------------------------------------------------
# cdc_chunks — content-defined chunking
# ---------------------------------------------------------------------------

def _py_cdc(text: str, k: int, div: int) -> list[tuple[int, str]]:
    import hashlib

    toks = text.split(" ")
    n = len(toks)
    cuts = []
    for p in range(k, n + 1):
        gram = " ".join(toks[p - k: p])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:4], 16)
        if h % div == 0:
            cuts.append(p)
    starts = [1] + [c + 1 for c in cuts]
    ends = cuts + [n]
    return [
        (s, " ".join(toks[s - 1: e]))
        for s, e in zip(starts, ends) if s <= e
    ]


def test_cdc_matches_python_reference(spark):
    import random

    from quebic_spark.operators.sampling import CDC_DIV, CDC_K, cdc_chunks

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(n)))
        for i, n in enumerate([1, 2, 3, 40, 120, 400])
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        expect = _py_cdc(text, CDC_K, CDC_DIV)
        mine = sorted(got[doc_id], key=lambda r: r.chunk_no)
        assert [r.chunk_no for r in mine] == list(range(len(expect)))
        for r, (s, ctext) in zip(mine, expect):
            assert r.start_tok == s
            assert r.chunk_text == ctext
            assert r.chunk_tokens == len(ctext.split(" "))


def test_cdc_chunks_are_edit_stable(spark):
    """THE content-defined property: inserting tokens near the front
    shifts every fixed window, but CDC chunks beyond the edited
    neighborhood keep their exact content — chunk-level dedup across
    crawl snapshots hinges on this."""
    import random

    from quebic_spark.operators.sampling import cdc_chunks, chunk_documents

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    base_toks = [rng.choice(vocab) for _ in range(300)]
    edited_toks = ["NEW1", "NEW2", "NEW3"] + base_toks
    docs = spark.createDataFrame(
        [(0, " ".join(base_toks)), (1, " ".join(edited_toks))],
        "doc_id long, text string",
    )

    cdc = cdc_chunks(docs).collect()
    cdc_a = {r.chunk_text for r in cdc if r.doc_id == 0}
    cdc_b = {r.chunk_text for r in cdc if r.doc_id == 1}
    shared_cdc = len(cdc_a & cdc_b) / len(cdc_a)

    fixed = chunk_documents(docs).collect()
    fix_a = {r.chunk_text for r in fixed if r.doc_id == 0}
    fix_b = {r.chunk_text for r in fixed if r.doc_id == 1}
    shared_fixed = len(fix_a & fix_b) / len(fix_a)

    # CDC re-synchronizes after the edit; fixed windows never do
    assert shared_cdc >= 0.6, (shared_cdc, shared_fixed)
    assert shared_fixed <= 0.2, (shared_cdc, shared_fixed)
    assert shared_cdc > shared_fixed


def test_cdc_covers_text_exactly(spark):
    from quebic_spark.operators.sampling import cdc_chunks

    rows = [_doc(i, n) for i, n in enumerate([1, 7, 80, 250])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list] = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        parts = sorted(got[doc_id], key=lambda r: r.chunk_no)
        assert " ".join(p.chunk_text for p in parts) == text
        # spans tile [1, n] with no gaps or overlap
        pos = 1
        for p in parts:
            assert p.start_tok == pos
            pos += p.chunk_tokens
        assert pos == len(text.split(" ")) + 1


def test_cdc_plan_is_scan_resident(spark, sf_dir):
    from quebic_spark.operators.sampling import q_cdc_chunks

    plan = q_cdc_chunks(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan  # fan_out only


def test_chunkers_fuzz_against_python_reference(spark):
    """300 random docs (varied lengths incl. boundary sizes) through
    BOTH chunkers in one Spark job each, compared field-by-field to
    the independent Python references."""
    import math
    import random

    from quebic_spark.operators.sampling import (
        CDC_DIV,
        CDC_K,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        cdc_chunks,
        chunk_documents,
    )

    rng = random.Random(1234)
    vocab = [f"v{i}" for i in range(60)]
    sizes = [1, 2, CDC_K, CHUNK_TOKENS - 1, CHUNK_TOKENS,
             CHUNK_TOKENS + 1] + [rng.randrange(1, 600)
                                  for _ in range(294)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(n)))
        for i, n in enumerate(sizes)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    texts = dict(rows)

    got_fixed: dict[int, list] = {}
    for r in chunk_documents(docs).collect():
        got_fixed.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        toks = text.split(" ")
        n = len(toks)
        n_chunks = max(1, math.ceil((n - CHUNK_TOKENS) / CHUNK_STRIDE) + 1)
        mine = sorted(got_fixed[doc_id], key=lambda r: r.chunk_idx)
        assert len(mine) == n_chunks, doc_id
        for i, r in enumerate(mine):
            piece = toks[i * CHUNK_STRIDE: i * CHUNK_STRIDE + CHUNK_TOKENS]
            assert r.chunk_text == " ".join(piece), (doc_id, i)

    got_cdc: dict[int, list] = {}
    for r in cdc_chunks(docs).collect():
        got_cdc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        expect = _py_cdc(text, CDC_K, CDC_DIV)
        mine = sorted(got_cdc[doc_id], key=lambda r: r.chunk_no)
        assert [(r.start_tok, r.chunk_text) for r in mine] == expect, doc_id


def test_chunk_share_stats_flags_boilerplate_reuse(spark):
    """A doc that reuses another doc's chunks (template + novel tail)
    must show a high shared fraction while fully-novel docs show 0 —
    the chunk-granular dup signal document-level dedup cannot see."""
    import random

    from quebic_spark.operators.sampling import cdc_chunks, chunk_share_stats

    rng = random.Random(21)
    vocab = [f"b{i}" for i in range(50)]
    template = [rng.choice(vocab) for _ in range(200)]
    novel_a = [rng.choice(vocab) for _ in range(180)]
    novel_b = [rng.choice(vocab) for _ in range(190)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(template + novel_a)),   # template + own tail
            (1, " ".join(template + novel_b)),   # same template, other tail
            (2, " ".join(rng.choice(vocab) for _ in range(250))),  # novel
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in chunk_share_stats(docs).collect()}

    # python reference over the same cdc chunks
    chunks = cdc_chunks(docs).collect()
    from collections import defaultdict

    docs_per = defaultdict(set)
    per_doc = defaultdict(list)
    for r in chunks:
        docs_per[r.chunk_text].add(r.doc_id)
        per_doc[r.doc_id].append(r.chunk_text)
    for d in (0, 1, 2):
        n = len(per_doc[d])
        shared = sum(1 for c in per_doc[d] if len(docs_per[c]) > 1)
        assert got[d].n_chunks == n
        assert got[d].n_shared_chunks == shared, d
        assert abs(got[d].shared_fraction - shared / n) < 1e-12

    # the templated pair shares a meaningful prefix; the novel doc
    # shares essentially nothing
    assert got[0].shared_fraction > 0.3
    assert got[1].shared_fraction > 0.3
    assert got[2].shared_fraction <= 0.05
