"""Streaming ANN-index ingestion (streaming/::stream_append_to_pq_index):
micro-batch appends into the persistent IVF-PQ artifact must leave an
index identical to batch append of the same vectors — FAISS add()
semantics under Structured Streaming, stream == batch pinned."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from queryengine_spark.operators.annindex import (
    ivf_pq_topk_from_index,
    read_pq_index,
    write_pq_index,
)
from queryengine_spark.sources.tables import load_table
from queryengine_spark.streaming import stream_append_to_pq_index

PARAMS = dict(n_cells=8, m=8, ksub=16, dim=64, sample_n=64, pq_sample_n=128, train_iters=2)


def test_stream_append_equals_batch_append(spark, sf_dir, tmp_path):
    e = load_table(spark, sf_dir, "embeddings")
    first = e.filter(F.col("vec_id") % 2 == 0)
    second = e.filter(F.col("vec_id") % 2 == 1)

    # batch reference: build on the first half, append the second in
    # one call
    ref_path = str(tmp_path / "ref")
    write_pq_index(first, "vec_id", "embedding", ref_path, **PARAMS)
    from queryengine_spark.operators.annindex import append_to_pq_index

    append_to_pq_index(second, "vec_id", "embedding", ref_path)

    # streaming path: same build, then the second half arrives as
    # THREE parquet micro-batches through a file-source stream
    st_path = str(tmp_path / "st")
    write_pq_index(first, "vec_id", "embedding", st_path, **PARAMS)
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    for k in range(3):
        second.filter(F.col("vec_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(second.schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(watch)
    )
    q = stream_append_to_pq_index(stream, "vec_id", "embedding", st_path)
    q.awaitTermination()

    ref_codes = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{ref_path}/codes").collect()
    )
    st_codes = sorted(
        (r["neighbor_id"], r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(f"{st_path}/codes").collect()
    )
    assert st_codes == ref_codes and len(st_codes) == e.count()

    # and queries over the streamed index equal the batch index
    queries = e.filter(F.col("vec_id") % 50 == 0)

    def rows(path):
        idx = read_pq_index(spark, path)
        return sorted(
            tuple(r)
            for r in ivf_pq_topk_from_index(
                queries, idx, "vec_id", "embedding", k=3, nprobe=2
            ).collect()
        )

    got, want = rows(st_path), rows(ref_path)
    assert got == want and len(got) > 0


def test_minhash_stream_append_equals_batch_append(spark, sf_dir, tmp_path):
    """r7: the MinHash band-bucket dedup index ingests micro-batches
    through foreachBatch with the artifact's frozen hash parameters —
    the streamed index must flag a probe batch IDENTICALLY to batch
    append of the same documents (stream == batch, the dedup twin of
    the IVF-PQ ingestion pin)."""
    from queryengine_spark.operators.annindex import (
        append_to_minhash_index,
        incremental_flags_from_index,
        read_minhash_index,
        write_minhash_index,
    )
    from queryengine_spark.streaming import stream_append_to_minhash_index

    d = load_table(spark, sf_dir, "documents")
    history = d.filter(F.col("doc_id") % 4 == 0)
    arriving = d.filter(F.col("doc_id") % 4 == 1)
    probe = d.filter(F.col("doc_id") % 4 == 2)

    # batch reference: build on history, append the arrivals in one call
    ref_path = str(tmp_path / "mh_ref")
    write_minhash_index(history, "doc_id", "text", ref_path)
    append_to_minhash_index(arriving, "doc_id", "text", ref_path)

    # streaming path: same build, arrivals as THREE parquet micro-batches
    st_path = str(tmp_path / "mh_st")
    write_minhash_index(history, "doc_id", "text", st_path)
    watch = str(tmp_path / "mh_watch")
    os.makedirs(watch)
    for k in range(3):
        arriving.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    q = stream_append_to_minhash_index(stream, "doc_id", "text", st_path)
    q.awaitTermination()

    # the streamed index's DISTINCT bucket relation equals the batch one
    def bucket_set(path):
        return {
            (r["id"], r["bucket"])
            for r in spark.read.parquet(f"{path}/buckets").collect()
        }

    assert bucket_set(st_path) == bucket_set(ref_path)

    # and the flags a probe batch gets are identical (stream == batch)
    def flags(path):
        idx = read_minhash_index(spark, path)
        return sorted(
            tuple(r)
            for r in incremental_flags_from_index(
                probe, idx, "doc_id", "text"
            ).collect()
        )

    got, want = flags(st_path), flags(ref_path)
    assert got == want and len(got) == probe.count()
    # the planted near-dup structure guarantees some history hits
    assert any(r[1] == 1 for r in got)


def test_stream_quality_gate_equals_batch_scores(spark, sf_dir, tmp_path):
    """r8: the trained quality classifier's serving half as a
    streaming ingest gate — micro-batch scores with frozen weights
    must equal batch serving of the same documents (stream == batch),
    and the frozen-weight serve must agree with the in-query
    trained_feature_classifier columns on the same corpus."""
    from queryengine_spark.operators.curation import (
        fit_feature_classifier,
        serve_feature_classifier,
        trained_feature_classifier,
    )
    from queryengine_spark.streaming import stream_quality_gate

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    arriving = d.filter(F.col("doc_id") % 2 == 1)

    weights = fit_feature_classifier(train, "doc_id", "text")
    assert len(weights) > 100  # the perceptron really updated

    # the frozen weights are the SAME model trained_feature_classifier
    # serves in-query: its trained_margin must match serve() on the
    # training corpus itself
    want_inline = {
        r["id"]: (r["trained_margin"], r["trained_label"])
        for r in trained_feature_classifier(train, "doc_id", "text").collect()
    }
    got_inline = {
        r["id"]: (r["trained_margin"], r["trained_label"])
        for r in serve_feature_classifier(
            train, "doc_id", "text", weights
        ).collect()
    }
    assert got_inline == want_inline and len(got_inline) > 0

    # batch reference on the arriving half
    ref = sorted(
        tuple(r)
        for r in serve_feature_classifier(
            arriving, "doc_id", "text", weights
        ).collect()
    )

    # streaming path: arrivals as THREE parquet micro-batches
    watch = str(tmp_path / "qg_watch")
    os.makedirs(watch)
    for k in range(3):
        arriving.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    gate = str(tmp_path / "qg_log")
    q = stream_quality_gate(stream, "doc_id", "text", weights, gate)
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.read.parquet(gate).collect())
    assert got == ref and len(got) == arriving.count()


def test_stream_warc_wet_gate_equals_batch(spark, sf_dir, tmp_path):
    """r9 (verdict item 7): the full CommonCrawl ingest path —
    container → record walk → HTTP header strip → text extraction →
    frozen-weight quality gate — streamed in micro-batches must equal
    the batch run of the same shards. The corpus mixes plain .warc
    and record-per-gzip-member .warc.gz single-page shards, a
    multi-record binary-body shard (its non-HTML records must be
    skipped, not crash the batch), and one malformed shard (refused
    whole, contributing nothing on either path)."""
    from queryengine_spark.operators.curation import fit_feature_classifier
    from queryengine_spark.queries.curation2 import html_clean_text
    from queryengine_spark.sources.warc import (
        _gzip_member,
        make_warc_shard,
        make_wet_record,
        warc_wet_payloads,
    )
    from queryengine_spark.streaming import stream_warc_wet_gate
    from queryengine_spark.operators.curation import serve_feature_classifier

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    weights = fit_feature_classifier(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text"
    )
    assert len(weights) > 100

    pages = docs.filter(F.col("doc_id") % 2 == 1).limit(60).collect()
    shards = []
    for r in pages:
        did = int(r["doc_id"])
        html = (
            f"<html><head><style>b {{x}}</style></head><body><h1>D{did}"
            f"</h1><p>{r['text']} &amp; tail</p></body></html>"
        )
        rec = make_wet_record(did, html.encode("utf-8"))
        shards.append((did, bytearray(rec if did % 4 == 1 else _gzip_member(rec))))
    # a multi-record shard with binary HTTP bodies (skipped per record)
    shards.append((10_001, bytearray(make_warc_shard(4))))
    # a malformed shard (refused whole)
    shards.append((10_002, bytearray(b"WARC/9.9 garbage")))
    sdf = spark.createDataFrame(shards, "shard_id long, payload binary")

    def gate_batch(df):
        wet = warc_wet_payloads(df).withColumn(
            "text", html_clean_text(F.col("html"))
        ).withColumn("rid", F.col("shard_id") * 1_000_000 + F.col("rec_idx"))
        scored = serve_feature_classifier(wet, "rid", "text", weights)
        return (
            wet.select("rid", "shard_id", "rec_idx", "fmt", "uri_hash", "text")
            .join(scored.withColumnRenamed("id", "rid"), "rid")
            .drop("rid")
        )

    ref_rows = gate_batch(sdf).collect()
    ref = sorted(tuple(r) for r in ref_rows)
    assert len(ref) >= 55  # the single-page shards all pass the gate
    # header bytes never leak into the extracted text
    assert all(
        "HTTP/1.1" not in r["text"] and "Content-Type" not in r["text"]
        for r in ref_rows
    )

    watch = str(tmp_path / "warc_watch")
    os.makedirs(watch)
    for k in range(3):
        sdf.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    log = str(tmp_path / "warc_gate_log")
    q = stream_warc_wet_gate(stream, weights, log)
    q.awaitTermination()

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(log)
        .select(*gate_batch(sdf).columns)
        .collect()
    )
    assert got == ref


def test_stream_warc_cdx_equals_batch(spark, sf_dir, tmp_path):
    """r9: incremental CDX indexing — micro-batch appends must leave
    an index identical to one batch pass over the same shards."""
    from queryengine_spark.sources.warc import (
        synthesize_warc,
        warc_cdx_records,
    )
    from queryengine_spark.streaming import stream_warc_cdx

    ids = spark.createDataFrame([(i,) for i in range(40)], "shard_id long")
    shards = synthesize_warc(ids)
    ref = sorted(tuple(r) for r in warc_cdx_records(shards).collect())
    assert len(ref) > 40

    watch = str(tmp_path / "cdx_watch")
    os.makedirs(watch)
    for k in range(3):
        shards.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    idx = str(tmp_path / "cdx_index")
    q = stream_warc_cdx(stream, idx)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(idx)
        .select(*warc_cdx_records(shards).columns)
        .collect()
    )
    assert got == ref


def test_stream_archive_members_equals_batch(spark, sf_dir, tmp_path):
    """r10: incremental archive-shard ingestion — micro-batch member
    fan-out must leave a relation identical to one batch pass over
    the same shards (all SEVEN container flavors present: ids 0..39
    cover tgz/tar/tbz/txz/zip plus the r11 tzst/jzst zstd slots on
    the % 16 routing — the from-scratch RFC 8878 decoder runs inside
    the stream's per-batch walk)."""
    from queryengine_spark.sources.archives import (
        archive_members,
        synthesize_archives,
    )
    from queryengine_spark.streaming import stream_archive_members

    ids = spark.createDataFrame([(i,) for i in range(40)], "shard_id long")
    shards = synthesize_archives(ids)
    batch = archive_members(shards)
    ref = sorted(
        tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r)
        for r in batch.collect()
    )
    assert len({r[1] for r in ref}) == 7  # all seven fmts walked

    watch = str(tmp_path / "arch_watch")
    os.makedirs(watch)
    for k in range(3):
        shards.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "arch_members")
    q = stream_archive_members(stream, out)
    q.awaitTermination()
    got = sorted(
        tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v for v in r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref


def test_stream_tfrecord_examples_equals_batch(spark, sf_dir, tmp_path):
    """r11: incremental TFRecord ingestion — micro-batch CRC/wire
    walks must leave a relation identical to one batch pass (plain
    and gzip flavors both present on the % 2 routing)."""
    from queryengine_spark.sources.tfrecord import (
        synthesize_tfrecord,
        tfrecord_examples,
    )
    from queryengine_spark.streaming import stream_tfrecord_examples

    ids = spark.createDataFrame([(i,) for i in range(14)], "shard_id long")
    shards = synthesize_tfrecord(ids)
    batch = tfrecord_examples(shards)
    ref = sorted(tuple(r) for r in batch.collect())

    watch = str(tmp_path / "tfr_watch")
    os.makedirs(watch)
    for k in range(3):
        shards.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "tfr_examples")
    q = stream_tfrecord_examples(stream, out)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref


def test_stream_sqlite_rows_equals_batch(spark, sf_dir, tmp_path):
    """r11: incremental SQLite ingestion — micro-batch page walks
    must leave a relation identical to one batch pass."""
    from queryengine_spark.sources.sqlitefile import (
        sqlite_rows,
        synthesize_sqlite,
    )
    from queryengine_spark.streaming import stream_sqlite_rows

    ids = spark.createDataFrame([(i,) for i in range(12)], "shard_id long")
    shards = synthesize_sqlite(ids)
    batch = sqlite_rows(shards)
    ref = sorted(tuple(r) for r in batch.collect())

    watch = str(tmp_path / "sqlite_watch")
    os.makedirs(watch)
    for k in range(3):
        shards.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "sqlite_rows")
    q = stream_sqlite_rows(stream, out)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref


def test_stream_hard_negatives_equals_batch(spark, sf_dir, tmp_path):
    """r11: incremental hard-negative mining — anchor micro-batches
    mined against the static corpus must leave a relation identical
    to one batch pass."""
    from queryengine_spark.operators.knn import hard_negative_mining

    from queryengine_spark.streaming import stream_hard_negatives

    corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    anchors = corpus.filter(F.col("vec_id") % 100 == 0).filter(
        F.col("vec_id") < 1200
    )
    batch = hard_negative_mining(
        anchors, corpus, "vec_id", "embedding", k=4, pos_threshold=0.30
    )
    ref = sorted(tuple(r) for r in batch.collect())

    watch = str(tmp_path / "anchor_watch")
    os.makedirs(watch)
    for kdrop in range(3):
        anchors.filter(F.col("vec_id") % 3 == kdrop).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(anchors.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "hard_negs")
    q = stream_hard_negatives(
        stream, corpus, out, k=4, pos_threshold=0.30
    )
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref


def test_stream_avro_records_equals_batch(spark, sf_dir, tmp_path):
    """r11: incremental Avro OCF ingestion — micro-batch container
    walks must leave a relation identical to one batch pass (all
    three codecs present on the % 3 routing)."""
    from queryengine_spark.sources.avro import avro_records, synthesize_avro
    from queryengine_spark.streaming import stream_avro_records

    ids = spark.createDataFrame([(i,) for i in range(15)], "shard_id long")
    shards = synthesize_avro(ids)
    batch = avro_records(shards)
    ref = sorted(tuple(r) for r in batch.collect())

    watch = str(tmp_path / "avro_watch")
    os.makedirs(watch)
    for k in range(3):
        shards.filter(F.col("shard_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(shards.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "avro_recs")
    q = stream_avro_records(stream, out)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref


def test_stream_pdf_text_equals_batch(spark, sf_dir, tmp_path):
    """r11: incremental PDF text extraction — micro-batch document
    walks must leave a relation identical to one batch pass (both
    single-generation and /Prev-updated documents present on the
    % 3 routing)."""
    from queryengine_spark.sources.pdf import pdf_text_stats, synthesize_pdf
    from queryengine_spark.streaming import stream_pdf_text

    ids = spark.createDataFrame([(i,) for i in range(24)], "doc_id long")
    docs = synthesize_pdf(ids)
    batch = pdf_text_stats(docs)
    ref = sorted(tuple(r) for r in batch.collect())

    watch = str(tmp_path / "pdf_watch")
    os.makedirs(watch)
    for k in range(3):
        docs.filter(F.col("doc_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(watch)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(watch)
    )
    out = str(tmp_path / "pdf_stats")
    q = stream_pdf_text(stream, out)
    q.awaitTermination()
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).select(*batch.columns).collect()
    )
    assert got == ref
