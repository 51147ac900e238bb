"""Scale-growth smoke: replicate the corpus in-memory and check that
the headline operators grow roughly linearly, not quadratically.

The correctness gate runs at sf0.01 and the bench at sf0.1; this tool
answers the remaining question — "what happens when the same plans see
N times the rows?" — without needing bigger testdata on disk. Each
replica perturbs the text with a replica-suffix token, so dedup
operators see realistic near-dup families (every doc gains N-1 close
neighbors) rather than degenerate exact copies.

Usage: python tools/scale_smoke.py [--factors 1,4,16] [--sf DIR]
                                   [--ops name1,name2,...]
Prints one JSON line:
  {"op": {"1": sec, "4": sec, "16": sec, "growth_16x": ratio}, ...}
where growth_16x = t(16x) / t(1x); linear-ish ops land well under the
16x row growth, a quadratic blowup lands near 256.

The r18 64x evidence run (VERDICT r17 next #5 — one more doubling
pair past 16x kills any hidden quadratic) targets the dedup/ANN/
packing families via --ops:
  python tools/scale_smoke.py --factors 1,4,16,64 \
    --ops keep_best,snapshot_diff,strip_spans,minhash_lsh_pairs,\
bloom_incremental,line_dedup,ivf_cell_join,pq_encode,\
embedding_decontaminate,sequence_packing
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def replicate_docs(spark, sf_dir: str, factor: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if factor == 1:
        return docs
    n = docs.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(n)).alias("doc_id"),
            # replica-suffix token: near-dup families, not exact copies
            F.concat(
                F.col("text"), F.lit(" rtag"), F.col("rep")
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    )


def replicate_emb(spark, sf_dir: str, factor: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if factor == 1:
        return emb
    n = emb.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    jitter = (F.col("rep") + 1).cast("float") / F.lit(1000.0)
    return (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + jitter
            ).alias("embedding"),
            "label",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--ops", default=None,
                    help="comma-separated op subset (default: all)")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from pyspark.sql import functions as F

    from quebic_spark import clear_caches
    from quebic_spark.operators.dedup import (
        _content_key,
        keep_best,
        minhash_lsh_pairs,
    )
    from quebic_spark.operators.sampling import hash_bucket
    from quebic_spark.session import get_spark

    spark = get_spark(app_name="quebic_scale_smoke")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    def op_keep_best(docs, emb):
        toks = F.split(F.col("text"), " ")
        scored = docs.select(
            "doc_id",
            _content_key().alias("content_key"),
            (F.size(F.array_distinct(toks))
             / F.size(toks).cast("double")).alias("q"),
        )
        return keep_best(scored, "content_key", "q").count()

    def op_minhash(docs, emb):
        return minhash_lsh_pairs(docs.select("doc_id", "text")).count()

    def op_shard_agg(docs, emb):
        return (
            docs.select(hash_bucket(F.col("doc_id"), 64).alias("s"))
            .groupBy("s").count().count()
        )

    def op_ivf_probe(docs, emb):
        # inline IVF shape over the replicated embeddings: seeded cells,
        # cell-blocked join (never all-pairs)
        from quebic_spark.functions.vector import l2_norm
        from quebic_spark.operators.similarity import (
            _cell_col,
        )

        dots, cell = _cell_col()
        indexed = (
            emb.select("vec_id", "embedding", *dots)
            .withColumn("cell", cell)
            .withColumn("norm", l2_norm(F.col("embedding")))
            .select("vec_id", "embedding", "cell", "norm")
        )
        # query set FIXED to the factor-1 replica (r16 review): ids
        # are vec_id + rep*n, so `% 997` alone selected ~1/997 of
        # EVERY replica — queries grew with the corpus while cells
        # stayed fixed, making matched pairs grow ~factor^2 and a
        # correct cell-blocked plan read as a quadratic blowup
        queries = indexed.filter(
            (F.col("vec_id") < n_emb_base)
            & (F.col("vec_id") % 997 == 0)
        ).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("cell").alias("qc"),
        )
        return (
            indexed.join(
                F.broadcast(queries),
                (F.col("cell") == F.col("qc"))
                & (F.col("vec_id") != F.col("qid")),
            ).count()
        )

    def op_bloom_incremental(docs, emb):
        from quebic_spark.operators.dedup import (
            _content_key,
            bloom_incremental_dedup,
        )

        tagged = docs.select(
            "doc_id", _content_key().alias("content_key"),
            hash_bucket(F.col("doc_id"), 2).alias("half"),
        )
        snapshot = tagged.filter("half = 0").select("content_key")
        batch = tagged.filter("half = 1")
        return bloom_incremental_dedup(batch, snapshot).count()

    def op_strip_spans(docs, emb):
        # replica-suffix texts make every doc a member of a duplicated
        # span family -> the detection+cut pipeline sees worst-case
        # span density; linear growth means the posexplode/groupBy/
        # window chain scales with rows, not pairs
        from quebic_spark.operators.dedup import strip_spans

        return strip_spans(docs).count()

    def op_lm_perplexity(docs, emb):
        # one explode + vocab-bounded count joins + per-doc agg; linear
        # growth means the count tables stay vocab-sized while only the
        # scoring explode scales with rows
        from quebic_spark.operators.textops import lm_perplexity_score

        return lm_perplexity_score(
            docs, hash_bucket(F.col("doc_id")) < 50
        ).count()

    def op_classifier_score(docs, emb):
        # scan-resident scoring: growth should track the scan alone —
        # the model is trained ONCE outside the timed region (r16
        # review: training on the replicated corpus inside the op
        # collected 16x rows to the driver and conflated untimed-by-
        # design training growth with the scoring growth the smoke
        # watches, the same train/apply conflation op_bpe_apply fixed)
        from quebic_spark.operators.classifier import (
            score_quality_classifier,
        )

        return score_quality_classifier(docs, cls_model).count()

    # train ONCE on the factor-1 corpus OUTSIDE any timed region so
    # op_bpe_apply measures apply alone (review catch: training
    # inside the op conflated training-scan growth with the memoized
    # apply growth the smoke exists to watch)
    from quebic_spark.operators.tokenizer import (
        tokenize_with,
        train_bpe_tokenizer,
    )

    bpe_model = train_bpe_tokenizer(replicate_docs(spark, args.sf, 1))
    # same once-outside-the-timed-region discipline for the quality
    # classifier (r16 review) and the fixed-size slices' id bound
    from quebic_spark.operators.classifier import (
        train_quality_classifier,
    )

    cls_model = train_quality_classifier(replicate_docs(spark, args.sf, 1))
    n_emb_base = spark.read.parquet(
        f"{args.sf}/embeddings.parquet"
    ).count()

    def op_bpe_apply(docs, emb):
        return (
            tokenize_with(docs, bpe_model)
            .select(F.sum(F.size("bpe_tokens")))
            .collect()
        )

    def op_snapshot_diff(docs, emb):
        from quebic_spark.operators.dedup import (
            _content_key,
            snapshot_diff,
        )

        keyed = docs.select(
            _content_key().alias("content_key"),
            hash_bucket(F.col("doc_id"), 4).alias("q"),
        )
        return snapshot_diff(
            keyed.filter("q <= 1"), keyed.filter("q >= 1")
        ).count()

    def op_chunk_documents(docs, emb):
        # pure scan fan-out: growth must track rows (~n/STRIDE chunks)
        from quebic_spark.operators.sampling import chunk_documents

        return chunk_documents(docs).count()

    def op_cdc_chunks(docs, emb):
        # scan-resident rolling-hash segmentation: linear growth means
        # the O(n_tokens * n_cuts) in-array cost stays row-local
        from quebic_spark.operators.sampling import cdc_chunks

        return cdc_chunks(docs).count()

    def op_embedding_decontaminate(docs, emb):
        # bench side FIXED (factor-1 slice) while the corpus grows:
        # linear growth proves cost is corpus-scan * |bench|, with the
        # max collapsing map-side before the one tiny exchange
        from quebic_spark.operators.similarity import (
            embedding_decontaminate,
        )

        # bench side truly FIXED (r16 review): replica ids are
        # vec_id + rep*n, so `% 211` alone selected ~1/211 of EVERY
        # replica — |bench| grew ~16x alongside |corpus| and the
        # |corpus|*|bench| broadcast join was quadratic by
        # construction, never testing the linear contract the comment
        # claimed. The base-replica bound pins |bench| at factor 1.
        bench = emb.filter(
            (F.col("vec_id") < n_emb_base)
            & (F.col("vec_id") % 211 == 0)
        ).select("embedding")
        corpus = emb.filter(
            (F.col("vec_id") >= n_emb_base)
            | (F.col("vec_id") % 211 != 0)
        ).select("vec_id", "embedding")
        return embedding_decontaminate(corpus, bench).count()

    def op_zorder_stats(docs, emb):
        # min/max agg + scan-resident bit math + 16-group agg: growth
        # must track the two scans alone
        from quebic_spark.functions.zorder import zorder_keys

        withz, _b, _z, zfile = zorder_keys(
            docs.select("doc_id", "n_chars"), ["doc_id", "n_chars"],
            file_bits=4,
        )
        return (
            withz.select(zfile.alias("zfile"))
            .groupBy("zfile").count().count()
        )

    def op_cms_sketch(docs, emb):
        # sketch output is DEPTH*WIDTH-bounded: growth must track the
        # explode scan, and the result row count must NOT grow at all
        from quebic_spark.operators.sampling import (
            CMS_DEPTH,
            CMS_WIDTH,
            cms_sketch,
        )

        n = cms_sketch(
            docs.select(F.col("source").alias("key"))
        ).count()
        assert n <= CMS_DEPTH * CMS_WIDTH, n
        return n

    def op_split_groups(docs, emb):
        # group-keyed split is pure in-scan arithmetic + one agg:
        # growth must track the scan; the replica families prove no
        # group-level shuffle sneaks in
        from quebic_spark.operators.sampling import split_by_group

        return (
            split_by_group(docs)
            .groupBy("split").count().count()
        )

    def op_pq_encode(docs, emb):
        # Arrow-batched argmin per subspace: growth must track rows
        # (codebooks are fixed literals trained once outside)
        from quebic_spark.operators.similarity import pq_encode

        return pq_encode(
            emb.select("vec_id", "embedding"), pq_books
        ).count()

    def op_line_dedup(docs, emb):
        # delimiter-generic boilerplate removal; space-delimited here
        # so the replica corpus yields real hot tokens. Linear growth
        # means the DF-count agg + hot anti-join + reassembly all
        # track rows, never pairs
        from quebic_spark.operators.textops import line_dedup

        return line_dedup(docs, max_df=256, delim=" ").count()

    def op_sequence_packing(docs, emb):
        # ONE shard-keyed shuffle + per-shard window cumsum (the
        # packing discipline: never a global single-reducer window);
        # linear growth proves every shard's cumsum stays independent
        # as the corpus multiplies (r18, VERDICT r17 next #5)
        from pyspark.sql import Window

        from quebic_spark.operators.sampling import (
            N_SHARDS,
            PACK_BUDGET,
        )

        toks = F.size(F.split(F.col("text"), " ")).cast("long")
        base = docs.select(
            "doc_id",
            hash_bucket(F.col("doc_id"), N_SHARDS).alias("shard"),
            F.md5(F.col("doc_id").cast("string")).alias("ord"),
            toks.alias("n_toks"),
        )
        w = (
            Window.partitionBy("shard")
            .orderBy("ord", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        before = F.sum("n_toks").over(w) - F.col("n_toks")
        return (
            base.select(
                "shard",
                F.floor(before / F.lit(PACK_BUDGET)).alias("bin_id"),
            )
            .groupBy("shard", "bin_id").count().count()
        )

    from quebic_spark.operators.similarity import train_pq_codebooks

    pq_books = train_pq_codebooks(spark, args.sf)

    ops = {
        "split_groups": op_split_groups,
        "pq_encode": op_pq_encode,
        "line_dedup": op_line_dedup,
        "cms_sketch": op_cms_sketch,
        "chunk_documents": op_chunk_documents,
        "cdc_chunks": op_cdc_chunks,
        "embedding_decontaminate": op_embedding_decontaminate,
        "zorder_stats": op_zorder_stats,
        "keep_best": op_keep_best,
        "lm_perplexity": op_lm_perplexity,
        "classifier_score": op_classifier_score,
        "bpe_apply": op_bpe_apply,
        "snapshot_diff": op_snapshot_diff,
        "strip_spans": op_strip_spans,
        "minhash_lsh_pairs": op_minhash,
        "shard_agg": op_shard_agg,
        "ivf_cell_join": op_ivf_probe,
        "bloom_incremental": op_bloom_incremental,
        "sequence_packing": op_sequence_packing,
    }
    if args.ops:
        wanted = [x for x in args.ops.split(",") if x]
        unknown = sorted(set(wanted) - set(ops))
        if unknown:
            raise SystemExit(
                f"unknown ops {unknown}; available: {sorted(ops)}"
            )
        ops = {k: ops[k] for k in wanted}
    out: dict[str, dict] = {name: {} for name in ops}
    for factor in factors:
        docs = replicate_docs(spark, args.sf, factor).cache()
        emb = replicate_emb(spark, args.sf, factor).cache()
        docs.count(), emb.count()
        for name, fn in ops.items():
            t0 = time.time()
            fn(docs, emb)
            out[name][str(factor)] = round(time.time() - t0, 2)
            clear_caches()
        docs.unpersist()
        emb.unpersist()
    lo, hi = str(factors[0]), str(factors[-1])
    for name in ops:
        base = out[name][lo] or 0.01
        out[name][f"growth_{hi}x"] = round(out[name][hi] / base, 1)
    print(json.dumps({"sf": args.sf, "factors": factors, "ops": out}))
    spark.stop()


if __name__ == "__main__":
    main()
