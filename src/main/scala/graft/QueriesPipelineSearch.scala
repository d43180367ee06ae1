package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.Changelog
import graft.schema.{Flattener, Stringifier}
import graft.shard.{ModuloSharding, ShardingStrategyFactory}
import graft.sink.DocQueries
import graft.SparkEntry.{dec, tempDir, sharedExactPairs, sharedPrunedCosinePairs}
import graft.SparkEntry.eventsChangelog
import graft.OracleDefs.bpeApplyMerges

/** Gate registry 1/4: ingestion pipeline rows (scan/flatten/stringify/CDC/sharding/batching) and the Lucene/ES-shaped search query surface.
  * (Verbatim slice of the former SparkEntry.queries literal — the
  * registry split is pure file layout, zero behavior change.)
  */
private[graft] object QueriesPipelineSearch {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2 S1/S3 — full source scan, every column (ts as epoch micros).
    "s1_scan_events" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
        .orderBy("event_id")),

    // §2 S2 — incremental snapshot scan: only records past the checkpoint.
    // The cutoff is predicated on BOTH time columns — the two legs are
    // equivalent by construction (Tables derives one from the other), and
    // each parquet layout pushes its native one into the scan: the
    // TIMESTAMP(MICROS) layout unwraps the cast on `ts`, the
    // nanos-as-long layout pushes the raw `ts_ns` comparison. The
    // redundant leg prunes nothing extra but costs one codegen compare.
    "s2_incremental_scan" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts") >= lit("2024-01-15T00:00:00Z").cast("timestamp") &&
          col("ts_ns") >= lit(1705276800000000000L))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"))
        .orderBy("event_id")),

    // CSV source with the JsonlSource poison contract: every row's text
    // is FORCED through the RFC-4180 edge cases (delimiter inside a
    // quoted field, escaped double-quote, EMBEDDED NEWLINE — multiLine
    // records spanning physical lines), two hand-planted poison records
    // (unclosed quote, unparseable doc_id) go to the DLQ, and the good
    // relation must round-trip bit-exact against the parquet oracle
    // recomputing the same decoration.
    "s_csv_scan" -> ((s, d) => {
      val dir = tempDir("graft-csv")
      val hard = Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(", \"quoted\",\nline2")).as("text"),
          col("lang"), col("n_chars"))
      hard.write.mode("overwrite")
        .option("header", true).option("escape", "\"")
        .csv(s"$dir/data")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/data/zz-poison.csv"),
        "doc_id,text,lang,n_chars\n" +
          "notanumber,plain,en,11\n" +          // doc_id fails the schema
          "9000001,\"unclosed quote,en,10\n")   // unterminated quote LAST:
          // it legitimately consumes the rest of the file as one record
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      val (good, dlq) = sources.CsvSource.read(s, s"$dir/data", schema)
      // the DLQ count rides along as a column so the gate hash-checks
      // both legs (2 poison records; the count is corpus-independent).
      // The two conditional counts partition the DLQ on a DATA column's
      // nullness and sum back to the row count — unlike count(1) or
      // count(coalesce(...)), Catalyst can neither fold them nor prune
      // the data column, which keeps the scan off Spark's
      // corrupt-column-only refusal
      good.crossJoin(broadcast(dlq.agg(
          (count(when(col("doc_id").isNotNull, 1)) +
            count(when(col("doc_id").isNull, 1))).as("n_dlq"))))
        .orderBy("doc_id")
    }),

    // Avro Object Container Files through the own task-side
    // reader/writer (sources/AvroOcf — the spark-avro module is not
    // deployed here; avro-core is): the corpus round-trips through real
    // OCF bytes AND the read path is forced through the SPLIT reader —
    // maxSplitBytes 64 KB cuts every file into many byte ranges, so the
    // sync-marker range contract (no loss, no duplication) is what the
    // hash-match actually gates. The read schema also REORDERS columns
    // vs the written layout (lang before text), exercising Avro reader-
    // schema resolution, not positional luck.
    "s_avro_scan" -> ((s, d) => {
      val dir = tempDir("graft-avro")
      sources.AvroOcf.write(
        Tables.documents(s, d).select("doc_id", "text", "lang", "n_chars")
          .repartition(4),
        s"$dir/data", syncIntervalBytes = 1 << 13)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      sources.AvroOcf.read(s, s"$dir/data", schema,
          maxSplitBytes = 64L * 1024)
        .orderBy("doc_id")
    }),

    // Avro LOGICAL types through the same OCF reader/writer: date,
    // timestamp-micros, and decimal(14,4) columns round-trip through
    // container bytes (reference AvroToAddDocumentConverterTest.java:
    // 60-84 pins date/timestamp logical-type semantics; §1.2 the value
    // mapping). Split reading stays on (64 KB ranges) and the read
    // schema again reorders columns, so the hash-match gates logical-
    // type decode UNDER the range-partition contract. The decimal is
    // derived from cent-valued o_totalprice at scale 4 — both engines
    // round the same doubles identically (no half-way values exist),
    // and the final projection stringifies date+decimal only to make
    // the driver's pandas dtype canonicalization apples-to-apples
    // (DuckDB DATE -> datetime64 vs parquet date32 -> object; decimal
    // -> float64 vs object) — the typed round-trip happens BEFORE the
    // cast, through the container. The file is DEFLATE-coded (r17):
    // real-world OCF drops are block-compressed, and per-block codecs
    // leave the sync-marker split contract untouched — which this row
    // now also proves end-to-end.
    "s_avro_logical" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val dir = tempDir("graft-avro-logical")
      sources.AvroOcf.write(
        Tables.orders(s, d).select(
          col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate"),
          col("o_orderdate").as("ots"),
          col("o_totalprice").cast(DecimalType(14, 4)).as("price"))
          .repartition(3),
        s"$dir/data", syncIntervalBytes = 1 << 13, codec = "deflate")
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("price", DecimalType(14, 4)),
        StructField("odate", DateType),
        StructField("ots", TimestampNTZType)))
      sources.AvroOcf.read(s, s"$dir/data", schema, maxSplitBytes = 64L * 1024)
        .select(col("o_orderkey"),
          col("odate").cast("string").as("odate_s"),
          col("ots"),
          col("price").cast("string").as("price_s"))
        .orderBy("o_orderkey")
    }),

    // ORC source round-trip: Spark's native ORC datasource (the second
    // first-class lake format next to parquet) — write the corpus as
    // ORC, read it back, must hash-match the parquet oracle exactly.
    "s_orc_scan" -> ((s, d) => {
      val dir = tempDir("graft-orc")
      Tables.documents(s, d).write.mode("overwrite").orc(s"$dir/data")
      s.read.orc(s"$dir/data").orderBy("doc_id")
    }),

    // GZIP-compressed JSONL through the same poison-contract reader:
    // Hadoop's codec layer decompresses .gz transparently, so the SAME
    // JsonlSource serves compressed drops unchanged. Scale note
    // (documented here because the gate can't show it): gzip is not
    // splittable — one task per .gz file — so compressed corpora shard
    // into many files upstream; the gate writes 4.
    "s_jsonl_gz_scan" -> ((s, d) => {
      val dir = tempDir("graft-jsonl-gz")
      Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
        .repartition(4)
        .write.mode("overwrite").option("compression", "gzip")
        .json(s"$dir/data")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      val (good, _) = sources.JsonlSource.read(s, s"$dir/data", schema)
      good.orderBy("doc_id")
    }),

    // End-to-end "switch-user" pipeline: JSONL drop → poison-contract
    // source → document sink (bucketed index, manifest commit) → term
    // query off the INDEX's searchable view. Every stage is gated on its
    // own elsewhere; this row pins their composition — the reference's
    // actual deployment shape (source → converter → indexed search).
    "p_e2e_ingest_query" -> ((s, d) => {
      val dir = tempDir("graft-e2e")
      Tables.documents(s, d)
        .write.mode("overwrite").json(s"$dir/drop")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType)))
      val (good, _) = sources.JsonlSource.read(s, s"$dir/drop", schema)
      val sinkI = new sink.ParquetIndexSink(s, s"$dir/index")
      sinkI.addDocuments(good.withColumn("_id", col("doc_id").cast("string")))
      sinkI.commit()
      DocQueries.term(sinkI.searchable(), "lang", "en")
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    }),

    // §2 F3 — modulo sharding: partition filter from a service name.
    "f3_shard_modulo" -> ((s, d) => {
      val shard = ModuloSharding.forService("user_id", 8, "nrtsearch-idx-3")
      ShardingStrategyFactory(Tables.events(s, d), shard)
        .select("event_id", "user_id").orderBy("event_id")
    }),

    // §2 P1 — nested-struct flattening to parent_child columns.
    "p1_flatten" -> ((s, d) => {
      val nested = Tables.documents(s, d).select(
        col("doc_id"),
        struct(col("source").as("author"), col("n_chars").as("len"))
          .as("metadata"),
        col("lang"))
      Flattener.flatten(nested).orderBy("doc_id")
    }),

    // §2 P2 — typed row → string-document conversion (§1.2 rules).
    // r17 (guide §2.3 "project before the exchange", inverted for a
    // global sort): sort FIRST on the raw key columns, project the six
    // stringified columns AFTER — the range exchange ships narrow typed
    // columns instead of six rendered strings, the range-sampling job
    // evaluates none of the stringify expressions, and each expression
    // runs exactly once, post-shuffle, in parallel. Same rows, same
    // total order (the projection is narrow and order-preserving).
    "p2_stringify" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate",
          "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Stringifier.stringify(col("l_orderkey"), LongType).as("orderkey_str"),
          Stringifier.stringify(col("l_linenumber"), IntegerType).as("linenumber_str"),
          Stringifier.stringify(dec(col("l_quantity")), DecimalType(12, 2)).as("quantity_str"),
          Stringifier.stringify(to_date(col("l_shipdate")), DateType).as("shipdate_days"),
          Stringifier.stringify(col("l_shipdate"), TimestampNTZType).as("shipdate_ms"),
          Stringifier.stringify(col("l_returnflag"), StringType).as("returnflag_str"))),

    // §2 P3 — column rename via field mapping.
    "p3_rename" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumnRenamed("source", "origin")
        .withColumnRenamed("n_chars", "char_count")
        .orderBy("doc_id")),

    // §2 P4 — drop columns by prefix.
    "p4_drop_prefix" -> ((s, d) => {
      val df = Tables.documents(s, d)
      val dropped = df.columns.filter(c => Seq("n_").exists(c.startsWith))
      df.drop(dropped: _*).orderBy("doc_id")
    }),

    // §2 P7 — poison-pill filter: conversion failures skipped, not fatal.
    // get_json_object + cast, NOT from_json(k INT): the oracle's
    // json_extract_string→CAST coerces a string-typed "5" to 5, and
    // from_json's PERMISSIVE null would silently drop such rows.
    "p7_poison_filter" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("k").isNotNull && col("k") % 3 =!= 0)
        .select("event_id", "k").orderBy("event_id")),

    // §2 C1 — RowKind state machine: -U dropped, +I/+U upsert, -D delete.
    "c1_cdc_classify" -> ((s, d) =>
      Changelog.classify(eventsChangelog(s, d), "op")
        .select(col("event_id"), col("_action")).orderBy("event_id")),

    // §2 C2/C6 — per-key compaction in explicit (snapshot, sequence) order.
    "c2_cdc_compact" -> ((s, d) =>
      Changelog.compact(
        Changelog.classify(eventsChangelog(s, d), "op"),
        "user_id", Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("_action").as("final_action"))
        .orderBy("user_id")),

    // SCD type-2 history: every non-view change becomes a version row
    // with a half-open validity interval — merge keeps the latest
    // state, this keeps the whole lineage queryable ("the dimension as
    // of time T"). One per-key window (partitioned, no global funnel).
    "c8_scd2" -> ((s, d) =>
      Changelog.scd2(
          Tables.events(s, d).filter(col("event_type") =!= "view")
            .withColumn("ts_us", unix_micros(col("ts"))),
          "user_id", Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("version"), col("event_id"),
          col("ts_us").as("valid_from_us"),
          col("valid_to").as("valid_to_us"), col("is_current"))
        .orderBy("user_id", "version")),

    // §2 C4 — delete-by-key-set (TermInSetQuery) as a left-anti join.
    "c4_delete_keyset" -> ((s, d) => {
      val deleted = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      Changelog.deleteByKeySet(Tables.lineitem(s, d), "l_orderkey", deleted)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // §2 C7 — full changelog merge into a keyed snapshot (upsert+delete).
    "c7_cdc_merge" -> ((s, d) => {
      val cl = eventsChangelog(s, d)
      // 2024-01-15T00:00Z, predicated on both time columns so either
      // parquet layout pushes its native leg (the s2 convention)
      val cutoffNs = 1705276800000000000L
      val cutoffTs = lit("2024-01-15T00:00:00Z").cast("timestamp")
      val baseCompact = Changelog.compact(
        Changelog.classify(
          cl.filter(col("ts") < cutoffTs && col("ts_ns") < cutoffNs), "op"),
        "user_id", Seq(col("ts_us"), col("event_id")))
      val base = baseCompact.filter(col("_action") === "upsert")
        .select("user_id", "event_id", "value")
      val changes = Changelog.compact(
        Changelog.classify(
          cl.filter(col("ts") >= cutoffTs && col("ts_ns") >= cutoffNs), "op"),
        "user_id", Seq(col("ts_us"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("value"), col("_action"))
      Changelog.merge(base, changes, "user_id")
        .withColumnRenamed("event_id", "last_event_id")
        .orderBy("user_id")
    }),

    // §2 B1/C3 — size-bounded micro-batching: 1000-record batches in
    // arrival (event_id) order, one summary row per batch. Two-phase
    // global numbering (operators.Batching) — no SinglePartition window.
    "b1_batching" -> ((s, d) =>
      operators.Batching.sizeBatchSummary(Tables.events(s, d), "event_id", 1000)
        .orderBy("batch_id")),

    // §2.6 — BooleanQuery MUST clauses: every term must appear.
    "q_match_all_terms" -> ((s, d) =>
      DocQueries.matchAllTerms(Tables.documents(s, d), "text",
        "merge window scan")
        .select("doc_id").orderBy("doc_id")),

    // Deterministic training order: global row number in (md5-hash, id)
    // order via the two-phase numbering — the reproducible corpus
    // shuffle that naturally interleaves sources; no single-partition
    // window (same machinery as b1_batching).
    "x_train_order" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          operators.Corpus.sampleHash(col("doc_id")).as("_h"))
      operators.Batching.withGlobalRowNumber(docs,
          struct(col("_h"), col("doc_id")), "train_order")
        .select(col("train_order"), col("doc_id"), col("source"))
        .orderBy("train_order")
    }),

    // Source-interleaved training order: reproducible per-source
    // shuffle + round-robin across sources — balanced source mix in
    // every training window. Per-source ranks via the two-phase
    // grouped numbering (no per-source window task), global position
    // via the two-phase global numbering.
    "x_interleave" -> ((s, d) =>
      operators.Corpus.interleaveBySource(
        Tables.documents(s, d).select("doc_id", "source"),
        "doc_id", "source")
        .orderBy("position")),

    // §2.6 — TermQuery point lookup.
    "q_term" -> ((s, d) =>
      DocQueries.term(Tables.documents(s, d), "lang", "en")
        .select("doc_id", "lang", "source").orderBy("doc_id")),

    // §2.6 — TermInSetQuery set membership.
    "q_term_in_set" -> ((s, d) =>
      DocQueries.termInSet(Tables.documents(s, d), "lang", Seq("de", "fr"))
        .select("doc_id", "lang").orderBy("doc_id")),

    // §2.6 — full-text MatchQuery (OR of query tokens).
    "q_match_text" -> ((s, d) =>
      DocQueries.matchText(Tables.documents(s, d), "text", "merge window")
        .select("doc_id").orderBy("doc_id")),

    // §2.6 — ranked MatchQuery: tf scoring over query tokens, top-k.
    "q_match_ranked" -> ((s, d) =>
      DocQueries.matchTextRanked(
        Tables.documents(s, d).select("doc_id", "text"), "text",
        "merge window scan", 20)
        .select("doc_id", "score")),

    // §2.6 upgrade — BM25-ranked MatchQuery (Lucene's default scoring):
    // idf + length-normalized tf from one broadcast corpus-stats row,
    // fixed-order term accumulation (engine-reproducible), top-k via
    // TakeOrderedAndProject.
    "q_match_bm25" -> ((s, d) =>
      DocQueries.matchTextBM25(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        "merge window scan", 20)),

    // ES rescore: phase 1 ranks the corpus by BM25 and keeps a
    // window_size=50 candidate window (deterministic cut — rounded
    // score, id tie-break); phase 2 re-scores ONLY the window with a
    // match_phrase boost (0.5 × occurrences of the exact bigram) and
    // returns the re-ranked top 20. The standard cheap-query/expensive-
    // rerank serving split; the phrase leg runs on 50 rows, never the
    // corpus.
    "q_rescore" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val window = DocQueries.matchTextBM25(docs, "doc_id", "text",
        "merge window scan", 50)
      val phraseTf = size(filter(
        graft.functions.TextExpressions.wordShingles(lower(col("text")), 2),
        x => x === lit("window scan"))).cast("double")
      window.join(docs, "doc_id")
        .withColumn("rescored", round(col("bm25") + lit(0.5) * phraseTf, 6))
        .select(col("doc_id"), col("bm25"), col("rescored"))
        .orderBy(col("rescored").desc, col("doc_id")).limit(20)
    }),

    // DisjunctionMax (Lucene DisMax): best clause + 0.3 × the others —
    // two BM25 clauses, per-clause 6dp rounding mirrored in the oracle.
    "q_dis_max" -> ((s, d) =>
      DocQueries.disMaxSearch(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        Seq("merge window", "scan stream"), tieBreaker = 0.3, k = 20)),

    // BoostingQuery (Lucene): BM25 for "merge window", halved when
    // "stream" appears — downranked, not excluded (0.5 is an exact
    // binary fraction, so demoted scores are engine-identical).
    "q_boosting" -> ((s, d) =>
      DocQueries.boostingSearch(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        positive = "merge window", negative = Seq("stream"),
        demoteFactor = 0.5, k = 20)),

    // FunctionScoreQuery + Gaussian decay (ES function_score/gauss):
    // BM25 relevance × a length decay on n_chars — full score inside the
    // 500-char plateau, ×0.5 at 2500 chars. One extra codegen'd
    // projection on the BM25 plan; no join, no extra shuffle.
    "q_function_score" -> ((s, d) =>
      DocQueries.functionScoreGauss(
        Tables.documents(s, d).select("doc_id", "text", "n_chars"),
        "doc_id", "text", "merge window scan", "n_chars",
        origin = 0.0, scale = 2000.0, offset = 500.0, decay = 0.5, k = 20)),

    // ConstantScoreQuery (Lucene): filter context — every match gets the
    // boost as its score, no corpus statistics computed at all.
    "q_constant_score" -> ((s, d) =>
      DocQueries.matchAllTerms(
          Tables.documents(s, d).select("doc_id", "text"), "text",
          "merge window")
        .select(col("doc_id"), lit(1.2).as("score"))
        .orderBy("doc_id")),

    // SignificantTermsAggregation (ES): vocabulary characteristic of the
    // German slice vs the whole corpus, JLH-scored document frequencies
    // out of ONE vocabulary-sized aggregate.
    "q_significant_terms" -> ((s, d) =>
      DocQueries.significantTerms(
        Tables.documents(s, d).select("doc_id", "text", "lang"),
        "doc_id", "text", col("lang") === "de", minDocCount = 5, k = 20)),

    // RareTerms aggregation (ES rare_terms): the exact long tail —
    // rarest first. ONE vocabulary-sized map-side-combinable
    // doc-frequency aggregate; no per-shard ascending-top-k error to
    // bound (the failure mode ES documents for count-ascending terms
    // aggs). The synthetic vocabulary's doc-frequency floor is 25 (one
    // outlier term) then ~373+; the 380 cutoff keeps 4 genuinely-rare
    // terms at sf0.01 so the gate pins values (a ≤2 cutoff matched the
    // oracle only at zero rows).
    "q_rare_terms" -> ((s, d) =>
      DocQueries.rareTerms(Tables.documents(s, d), "text",
        maxDocCount = 380, k = 20)),

    // AdjacencyMatrix aggregation (ES adjacency_matrix): per-filter and
    // pairwise-intersection document counts in ONE corpus pass — each
    // doc projects its matched-filter-name array, singles + ordered
    // pairs explode from it (higher-order functions, O(filters²) only
    // per matching doc), one hash agg. Never a per-pair corpus scan.
    "q_adjacency_matrix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def hasTok(t: String) =
        array_contains(split(lower(col("text")), " "), t)
      DocQueries.adjacencyMatrix(docs, Seq(
        "en" -> (col("lang") === "en"),
        "merge" -> hasTok("merge"),
        "window" -> hasTok("window")))
    }),

    // MultiTerms aggregation (ES multi_terms): top composite keys by
    // document count — the terms agg over a key TUPLE (keeps per-column
    // typing a concatenated-string key would lose). One map-side-
    // combinable hash agg + TakeOrderedAndProject.
    "q_multi_terms" -> ((s, d) =>
      DocQueries.multiTerms(Tables.documents(s, d),
        Seq("lang", "source"), k = 10)),

    // Filters aggregation (ES filters + other_bucket): named-predicate
    // doc counts INCLUDING the "_other_" bucket for docs matching no
    // filter — one projection + hash agg (a doc can land in several
    // named buckets, the ES semantics). NULL predicates (null lang or
    // text) count as no-match here (`when` falls through) and the
    // oracle coalesces each flag to false, so such docs land in
    // `_other_` on both sides.
    "q_filters_agg" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      def hasTok(t: String) =
        array_contains(split(lower(col("text")), " "), t)
      val preds = Seq("de_docs" -> (col("lang") === "de"),
        "has_merge" -> hasTok("merge"), "has_window" -> hasTok("window"))
      val matched = filter(array(preds.map { case (n, p) =>
        when(p, lit(n)).otherwise(lit(null).cast("string"))
      }: _*), x => x.isNotNull)
      docs.select(explode(concat(
          when(size(matched) === 0, array(lit("_other_")))
            .otherwise(array().cast("array<string>")),
          matched)).as("key"))
        .groupBy("key").agg(count(lit(1)).as("doc_count"))
        .orderBy("key")
    }),

    // Range aggregation (ES range agg, arbitrary edges): custom
    // [from, to) buckets over n_chars with a decimal-exact sub-agg mean
    // — the histogram's irregular-edge sibling.
    "q_range_agg" -> ((s, d) => {
      val edges = Seq((None, Some(600L)), (Some(600L), Some(1200L)),
        (Some(1200L), None))
      val key = edges.foldLeft(lit(null).cast("string")) { case (acc, (lo, hi)) =>
        val in = (lo.map(col("n_chars") >= _).getOrElse(lit(true))) &&
          (hi.map(col("n_chars") < _).getOrElse(lit(true)))
        when(in, lit(s"${lo.map(_.toString).getOrElse("*")}-${hi.map(_.toString).getOrElse("*")}"))
          .otherwise(acc)
      }
      Tables.documents(s, d)
        .groupBy(key.as("bucket"))
        .agg(count(lit(1)).as("doc_count"),
          round(sum(col("n_chars").cast("decimal(20,0)")).cast("double") /
            count(lit(1)), 6).as("avg_chars"))
        .orderBy("bucket")
    }),

    // TopHits aggregation (ES terms + top_hits): the 2 longest docs per
    // language — representative documents per bucket, a per-key window
    // (partitioned, no global funnel).
    "q_top_hits" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select("lang", "rk", "doc_id", "n_chars")
        .orderBy("lang", "rk")
    }),

    // Terms aggregation ordered by a SUB-aggregation (the ES
    // `order: {avg_chars: desc}` shape — ES documents this as
    // approximate under sharding; one global hash agg makes it exact):
    // top sources by average doc length, decimal-exact mean.
    "q_terms_by_subagg" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("doc_count"),
          round(sum(col("n_chars").cast("decimal(20,0)")).cast("double") /
            count(lit(1)), 6).as("avg_chars"))
        .orderBy(col("avg_chars").desc, col("source"))
        .limit(5)),

    // Numeric histogram aggregation (ES histogram): fixed 250-char
    // buckets over n_chars, ES floor bucket-key convention, empty
    // buckets absent. One projection + hash agg — no sort over the
    // value space.
    "q_histogram" -> ((s, d) =>
      DocQueries.histogram(Tables.documents(s, d), "n_chars",
        interval = 250)),

    // BucketSort pipeline aggregation (ES bucket_sort): terms buckets
    // re-ranked by a SUB-aggregation with from/size truncation — the
    // "page 2 of sources by average length" shape. One hash agg + a
    // bucket-space window (bucket count, never doc count).
    "q_bucket_sort" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("avg_chars").desc, col("source"))
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("n_chars").cast("decimal(20,0)")).cast("double") /
            count(lit(1)), 6).as("avg_chars"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") > 1 && col("rk") <= 4) // from=1, size=3
        .select("source", "n_docs", "avg_chars", "rk")
        .orderBy("rk")
    }),

    // Rate aggregation (ES rate inside date_histogram): per-week
    // buckets reporting per-DAY event and value rates — the unit
    // rescale is a bucket-space projection over the one hash agg
    // (decimal sum for merge-order determinism, one final double).
    "q_rate_agg" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).as("_sv"))
        .select(unix_micros(col("bucket")).as("bucket_us"),
          col("n_events"),
          round(col("n_events") / lit(7.0), 6).as("events_per_day"),
          round(col("_sv").cast("double") / 7.0, 6).as("value_per_day"))
        .orderBy("bucket_us")),

    // StatsBucket pipeline aggregation (ES stats_bucket): min/max/sum/
    // avg over the SIBLING buckets' sums — one hash agg to bucket
    // space, one single-row fold over it (buckets, never events, enter
    // the second agg). Decimal bucket sums; doubles only at the end.
    "q_stats_bucket" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(sum(col("value").cast("decimal(12,2)")).as("_sv"))
        .agg(count(lit(1)).as("n_buckets"),
          round(min(col("_sv")).cast("double"), 6).as("min_sum"),
          round(max(col("_sv")).cast("double"), 6).as("max_sum"),
          round(sum(col("_sv")).cast("double"), 6).as("total_sum"),
          round(sum(col("_sv")).cast("double") / count(lit(1)), 6)
            .as("avg_sum"))),

    // Terms aggregation with the `missing` parameter (ES terms
    // missing bucket): null keys route to an explicit bucket instead
    // of vanishing. The corpus has no null langs, so every 13th doc's
    // lang is nulled FIRST (identical planting in the oracle) — the
    // missing bucket then provably collects exactly those docs.
    "q_terms_missing" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("lang2", when(pmod(col("doc_id"), lit(13)) === 0,
          lit(null).cast("string")).otherwise(col("lang")))
        .groupBy(coalesce(col("lang2"), lit("(missing)")).as("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("n_docs").desc, col("lang"))),

    // exists query (ES `exists`): docs whose FIELD holds a value —
    // the positive sibling of the missing bucket above. Every 13th
    // vector's embedding is nulled first (the q_terms_missing planting
    // convention — the raw column has no nulls at gate SFs, and a
    // vacuous filter would pin nothing).
    "q_exists" -> ((s, d) =>
      Tables.embeddings(s, d)
        .withColumn("e2", when(pmod(col("vec_id"), lit(13)) === 0,
          lit(null).cast("array<float>")).otherwise(col("embedding")))
        .filter(col("e2").isNotNull)
        .select("vec_id")
        .orderBy("vec_id")),

    // Score explanation (ES _explain): the BM25 top-15 with per-term
    // contribution columns riding the SAME scoring projection — no
    // second pass; legs round independently, the total rounds once.
    "q_explain_score" -> ((s, d) =>
      DocQueries.explainBm25(Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", "merge window", k = 15)),

    // Ranking evaluation (ES _rank_eval): precision@10 / MRR / nDCG@10
    // of the deterministic tf ranking against all-terms-present binary
    // judgments — the offline relevance loop. Evaluation cost scales
    // with judgments × k, never the corpus.
    "x_rank_eval" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val queries = Seq("merge window scan", "stream data")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("doc_id"))
      val rankings = queries.map { q =>
        DocQueries.matchTextRanked(docs, "text", q, 10)
          .select(lit(q).as("query"), row_number().over(w).as("rk"),
            col("doc_id"))
      }.reduce(_ unionByName _)
      val judgments = queries.map { q =>
        val all = q.split(" ").toSeq.map(t =>
          array_contains(split(lower(col("text")), " "), t)).reduce(_ && _)
        docs.select(lit(q).as("query"), col("doc_id"),
            when(all, 1).otherwise(0).as("rel"))
          .filter(col("rel") > 0)
      }.reduce(_ unionByName _)
      DocQueries.rankEval(rankings, judgments, k = 10)
        .withColumnRenamed("ndcg_at_k", "ndcg_10")
        .withColumnRenamed("p_at_k", "p_10")
        .orderBy("query")
    }),

    // ES date-math range ("now-7d/d".."now/d"): bounds resolved on the
    // driver against an EXPLICIT now (the max-ts cursor row — no hidden
    // clock), then dropped in as plan-literal timestamps so the scan
    // keeps a plain pushable comparison.
    "q_date_math" -> ((s, d) => {
      val e = Tables.events(s, d)
      val now = e.agg(max(col("ts"))).head().getTimestamp(0).toInstant
      val from = sink.DateMath.resolve("now-7d/d", now)
      val to = sink.DateMath.resolve("now/d", now)
      e.filter(col("ts") >= lit(java.sql.Timestamp.from(from)) &&
          col("ts") < lit(java.sql.Timestamp.from(to)))
        .groupBy("event_type").agg(count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // Phrase suggester ("did you mean"): per-token best correction
    // among vocabulary terms within Levenshtein 1, ranked (distance,
    // df desc, term). One vocabulary-sized df aggregate + a broadcast
    // token join; best-per-token is a min(struct) hash agg.
    "q_phrase_suggest" -> ((s, d) =>
      DocQueries.phraseSuggest(Tables.documents(s, d), "doc_id", "text",
        "mrge windw scan", maxEdits = 1)),

    // Lucene query_string: the user-facing query box parsed (recursive
    // descent, driver-side, bounded by query length) and compiled into
    // ONE Catalyst predicate — the whole boolean tree optimizes and
    // pushes as a unit. lang gets keyword semantics, text analyzed
    // semantics (token membership / padded phrase / token prefix).
    "q_query_string" -> ((s, d) =>
      sink.QueryString.search(Tables.documents(s, d), "text",
          """lang:de AND (merge OR "window scan") NOT filter*""",
          textFields = Set("text"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // query_string, Lucene field-grouping + q.op=OR profile: a grouped
    // clause `lang:(de OR en)` scopes the group's default field (what a
    // real query box emits for multi-value field filters), and implicit
    // adjacency inside the text group ORs under q.op=OR. Still ONE
    // compiled Catalyst predicate.
    "q_query_string_grouped" -> ((s, d) =>
      sink.QueryString.search(Tables.documents(s, d), "text",
          """lang:(de OR en) AND (merge "window scan") AND NOT filter*""",
          textFields = Set("text"), defaultOr = true)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // simple_query_string (the never-throw query box): a MALFORMED
    // query — unbalanced paren — degrades to the documented
    // bag-of-terms AND instead of erroring; the oracle encodes exactly
    // the degraded semantics.
    "q_simple_query_string" -> ((s, d) =>
      sink.QueryString.searchLenient(Tables.documents(s, d), "text",
          """merge (window scan""",
          textFields = Set("text"))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Unordered proximity (ES intervals all_of ordered=false): 'merge'
    // and 'window' within 3 intervening tokens in EITHER order, best
    // gap reported — the ordered spanNear's sibling, served off the
    // same positional layout.
    "q_intervals_unordered" -> ((s, d) =>
      sink.InvertedIndex.spanUnorderedSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        "merge", "window", maxGaps = 3)
        .orderBy("doc_id")),

    // Frequent item-set pairs (ES frequent_item_sets at level 2, the
    // apriori market-basket core): token pairs co-occurring in ≥ 30
    // docs. Apriori pruning is the scale mechanism — only
    // frequent SINGLES enter the per-doc pair join, so pair volume is
    // bounded by per-doc frequent-token counts squared, never
    // vocabulary². Top 20, total order.
    "q_frequent_pairs" -> ((s, d) => {
      val minSup = 30L
      val dt = Tables.documents(s, d)
        .select(col("doc_id"), explode(array_distinct(filter(
          split(lower(col("text")), " "), t => t =!= lit("")))).as("term"))
      val freq = dt.groupBy("term").agg(count(lit(1)).as("df"))
        .filter(col("df") >= minSup).select("term")
      val pruned = dt.join(broadcast(freq), Seq("term"))
      pruned.as("a").join(pruned.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSup)
        .orderBy(col("support").desc, col("term_a"), col("term_b"))
        .limit(20)
    }),

    // Text categorization (ES categorize_text, the log-triage agg):
    // digit runs collapse to '#', the first 5 tokens form the pattern
    // key, patterns with ≥ 2 docs reported with an example. One
    // projection + hash agg — the message-template discovery every
    // log pipeline runs.
    "q_categorize_text" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(lower(col("text")), "[0-9]+", "#").as("_sig"))
        .withColumn("pattern", array_join(slice(filter(
          split(col("_sig"), " "), t => t =!= lit("")), 1, 5), " "))
        .groupBy("pattern")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("example_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("pattern"))),

    // Sampler / DiversifiedSampler aggregation (ES diversified_sampler):
    // a deterministic 60-doc sample in md5(id) order with at most 20
    // docs per lang — one viral slice cannot flood the sample the
    // downstream aggs run over. Hash-ordered window cap + hash-ordered
    // global cut, both engine-reproducible.
    "q_sampler" -> ((s, d) =>
      DocQueries.diversifiedSampler(Tables.documents(s, d), "doc_id",
          "lang", maxDocsPerValue = 20, shardSize = 60)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // AutoDateHistogram (ES auto_date_histogram, fixed-interval rung
    // ladder): the FINEST rung keeping the bucket count within target —
    // rung choice is integer arithmetic off one min/max probe row (the
    // cursor convention), mirrored exactly by the oracle's CASE ladder.
    "q_auto_histogram" -> ((s, d) =>
      DocQueries.autoDateHistogram(Tables.events(s, d), "ts",
        targetBuckets = 40)),

    // StringStats aggregation (ES string_stats): per-lang length stats
    // + character-distribution Shannon entropy. Lengths aggregate in
    // exact integers; entropy contributions are per-(lang, char) — an
    // alphabet-sized frame — decimal-summed so the total is
    // order-independent (the KL/CE convention).
    "q_string_stats" -> ((s, d) =>
      DocQueries.stringStats(Tables.documents(s, d), "lang", "text")),

    // RankFeature query (ES rank_feature, saturation): static-signal
    // ranking with diminishing returns — score = boost·S/(S+pivot),
    // pivot scores exactly boost/2. Pure projection + top-k; docs
    // without a positive feature never match (ES semantics).
    "q_rank_feature" -> ((s, d) =>
      DocQueries.rankFeature(Tables.documents(s, d), "doc_id", "n_chars",
        pivot = 1000.0, boost = 1.5, k = 20)),

    // DistanceFeature query (ES distance_feature): rank by PROXIMITY to
    // an origin on a numeric axis — boost·pivot/(pivot+|x−origin|), the
    // linear-decay sibling of q_function_score's gauss.
    "q_distance_feature" -> ((s, d) =>
      DocQueries.distanceFeature(Tables.documents(s, d), "doc_id",
        "n_chars", origin = 1000.0, pivot = 500.0, boost = 2.0, k = 20)),

    // Pinned query (ES pinned): ids 42, 7, 99 rank first IN THAT ORDER
    // whether or not they match; the organic integer-tf ranking follows
    // with pins excluded (over-fetched by the pin count so exclusion
    // never underfills the page).
    "q_pinned" -> ((s, d) =>
      DocQueries.pinnedSearch(Tables.documents(s, d), "doc_id", "text",
        "merge window scan", pinnedIds = Seq(42L, 7L, 99L), k = 15)),

    // TermsSet query (ES terms_set): matched-terms count vs a
    // PER-DOCUMENT minimum-should-match expression (the
    // minimum_should_match_field contract — no clamping, required >
    // |terms| never matches).
    "q_terms_set" -> ((s, d) =>
      DocQueries.termsSetQuery(Tables.documents(s, d), "doc_id", "text",
          Seq("merge", "window", "filter"),
          pmod(col("n_chars"), lit(3)) + lit(1))
        .orderBy("doc_id")),

    // MatchBoolPrefix query (ES match_bool_prefix): search-as-you-type —
    // full tokens as term clauses, the last as a prefix clause, OR'd;
    // score = matched clause count (deterministic integer core).
    "q_match_bool_prefix" -> ((s, d) =>
      DocQueries.matchBoolPrefix(Tables.documents(s, d), "doc_id", "text",
        "window mer", k = 30)),

    // The same aggregation served off the MATERIALIZED postings — the
    // corpus text is never re-tokenized at query time. Same oracle as
    // the scan form.
    "q_significant_terms_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text", "lang")
      sink.InvertedIndex.significantTermsIndexed(
        sink.InvertedIndex.postings(docs, "doc_id", "text"),
        docs.select("doc_id"),
        docs.filter(col("lang") === "de").select("doc_id"),
        minDocCount = 5, k = 20)
    }),

    // Join-field queries (ES has_child / has_parent): relational
    // semi-joins — the child/parent predicate never duplicates or
    // widens the kept side, and Spark picks broadcast/shuffled-hash by
    // the filtered side's size.
    "q_has_child" -> ((s, d) =>
      Tables.orders(s, d).join(
          Tables.lineitem(s, d).filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")),

    "q_has_parent" -> ((s, d) =>
      Tables.lineitem(s, d).join(
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // ES date_histogram with sub-aggregations: calendar-week buckets,
    // per-bucket count / exact distinct users / decimal-exact value sum
    // (order-independent partial aggregation).
    "q_date_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("week", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("sum_value"))
        .select(unix_micros(col("bucket")).as("bucket_us"),
          col("n_events"), col("n_users"), col("sum_value"))
        .orderBy("bucket_us")),

    // §2.6 index structure — the flat (term, doc_id, tf) postings table
    // (Lucene's postings lists, Spark-native: no giant per-term arrays,
    // every op a partitioned aggregate; see InvertedIndex scaladoc).
    "x_inverted_postings" -> ((s, d) =>
      graft.sink.InvertedIndex.postings(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text")
        .orderBy("term", "doc_id")),

    // §2.6 index-accelerated BM25: same Lucene scoring as q_match_bm25
    // but reading ONLY the query terms' postings rows — on a persisted
    // term-sorted index the query is a pruned lookup, not a corpus scan.
    "x_bm25_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      graft.sink.InvertedIndex.bm25Search(
        graft.sink.InvertedIndex.postings(docs, "doc_id", "text"),
        graft.sink.InvertedIndex.docLengths(docs, "doc_id", "text"),
        "merge window scan", 20)
    }),

    // DisjunctionMax off the postings layout: each clause a pushed
    // term-set leg; identical rounding to the scan form ⇒ same oracle.
    "q_dis_max_indexed" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      graft.sink.InvertedIndex.disMaxSearch(
        graft.sink.InvertedIndex.postings(docs, "doc_id", "text"),
        graft.sink.InvertedIndex.docLengths(docs, "doc_id", "text"),
        Seq("merge window", "scan stream"), tieBreaker = 0.3, k = 20)
    }),

    // BATCH BM25: two queries answered in one postings pass — union-of-
    // terms pushed filter, per-query fan-out after the stats joins,
    // bounded TopKByScore per query (no window). The text twin of
    // x_knn_indexed's batch serving shape.
    "x_bm25_batch" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val qs = Seq(("q0", "merge window"), ("q1", "stream data scan"))
        .toDF("query_id", "query")
      sink.InvertedIndex.bm25SearchBatch(
          sink.InvertedIndex.postings(docs, "doc_id", "text"),
          sink.InvertedIndex.docLengths(docs, "doc_id", "text"),
          qs, "query_id", "query", k = 5)
        .orderBy("query_id", "rk")
    }),

    // More-like-this: doc 0's top-5 TF-IDF terms (6dp-rounded score,
    // term tie-break — engine-reproducible selection) become an OR
    // query, BM25-ranked over full-corpus stats, source excluded.
    "x_mlt" -> ((s, d) =>
      DocQueries.moreLikeThis(
        Tables.documents(s, d).select("doc_id", "text"), "doc_id", "text",
        sourceId = 0L, topTerms = 5, k = 10)),

    // Incremental corpus statistics: init on a third of orders, two
    // O(columns)-sized appended commits for the rest, then the profile
    // is read from PERSISTED partials — no corpus rescan. Exact counts
    // and min/max must equal a full-table profile; the merged
    // DataSketches HLL union gates within ±5% of exact distinct.
    "x_profile_incremental" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cols = Seq("o_custkey", "o_orderkey", "o_orderstatus")
      val dir = tempDir("graft-statstore")
      sink.StatsStore.init(o.filter(pmod(col("o_orderkey"), lit(3)) === 0),
        cols, dir)
      sink.StatsStore.append(o.filter(pmod(col("o_orderkey"), lit(3)) === 1), dir)
      sink.StatsStore.append(o.filter(pmod(col("o_orderkey"), lit(3)) === 2), dir)
      val prof = sink.StatsStore.profile(s, dir)
      val exactAggs = cols.map(c => countDistinct(col(c)).cast("long").as(c))
      val exact = o.agg(exactAggs.head, exactAggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).as("exact_distinct"))): _*)).as("e"))
        .select("e.*")
      prof.join(broadcast(exact), "col_name")
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("min_v"), col("max_v"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("dist_ok"))
        .orderBy("col_name")
    }),

    // Incremental PERCENTILES off the profiling store (r11): each commit
    // persists a bounded 99-point equi-probability grid per numeric
    // column; the corpus-wide p50/p90 is the weighted merge of those
    // points — approximate quantiles under continuous ingest with NO
    // corpus rescan. The gate re-ranks each estimate against the raw
    // corpus (the ws_quantile pattern): its true rank must sit within
    // max(2, 2%) of the target, covering the per-batch sketch error plus
    // the 1% merge grid.
    "x_profile_quantiles" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tracked = docs.select("n_chars", "doc_id")
      val dir = tempDir("graft-statq")
      sink.StatsStore.init(
        tracked.filter(pmod(col("doc_id"), lit(3)) === 0),
        Seq("n_chars", "doc_id"), dir)
      sink.StatsStore.append(
        tracked.filter(pmod(col("doc_id"), lit(3)) === 1), dir)
      sink.StatsStore.append(
        tracked.filter(pmod(col("doc_id"), lit(3)) === 2), dir)
      val est = sink.StatsStore.quantiles(s, dir, Seq(0.5, 0.9))
        .select(col("col_name"), col("n_nonnull"),
          element_at(col("qs"), 1).as("q50"),
          element_at(col("qs"), 2).as("q90"))
      val legs = Seq("doc_id", "n_chars").map { name =>
        val c = col(name).cast("double")
        docs.crossJoin(broadcast(est.filter(col("col_name") === name)))
          .agg(first(col("col_name")).as("col_name"),
            first(col("n_nonnull")).as("n"),
            sum(when(c < col("q50"), 1).otherwise(0)).as("_lo50"),
            sum(when(c <= col("q50"), 1).otherwise(0)).as("_hi50"),
            sum(when(c < col("q90"), 1).otherwise(0)).as("_lo90"),
            sum(when(c <= col("q90"), 1).otherwise(0)).as("_hi90"))
      }
      val tol = greatest(lit(2.0), col("n") * 0.02)
      legs.reduce(_.unionByName(_))
        .select(col("col_name"), col("n"),
          (col("_lo50") - tol <= col("n") * 0.5 &&
            col("n") * 0.5 <= col("_hi50") + tol).as("p50_ok"),
          (col("_lo90") - tol <= col("n") * 0.9 &&
            col("n") * 0.9 <= col("_hi90") + tol).as("p90_ok"))
        .orderBy("col_name")
    }),

    // Column profiling ("analyze table" for pipeline observability): one
    // aggregate pass — per-column null/non-null counts, exact min/max,
    // HLL++ distinct. The approx cardinality is gated within ±5% of the
    // exact count (computed gate-side, like x_sketch_distinct).
    "x_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
      val prof = operators.Profile.profile(o, cols)
      val exactAggs = cols.map(c => countDistinct(col(c)).cast("long").as(c))
      val exact = o.agg(exactAggs.head, exactAggs.tail: _*)
        .select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"), col(c).as("exact_distinct"))): _*)).as("e"))
        .select("e.*")
      prof.join(broadcast(exact), "col_name")
        .select(col("col_name"), col("n_nonnull"), col("n_null"),
          col("min_v"), col("max_v"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("dist_ok"))
        .orderBy("col_name")
    }),

    // §2.6 — BooleanQuery full clause composition (Lucene MUST +
    // SHOULD/minimumShouldMatch + MUST_NOT): docs with "merge", without
    // "window", and at least one of {"stream", "scan"}. Scan form —
    // pure filter, no shuffle.
    "q_bool" -> ((s, d) =>
      DocQueries.boolQuery(Tables.documents(s, d), "text",
        must = Seq("merge"), should = Seq("stream", "scan"),
        mustNot = Seq("window"), minimumShouldMatch = 1)
        .select("doc_id").orderBy("doc_id")),

    // BooleanQuery OFF THE INDEX: MUST legs are per-term postings reads
    // (pushed EqualTo, row-group pruning) intersected by shrinking
    // joins; SHOULD is one pushed-In aggregate to per-doc clause counts;
    // MUST_NOT a df-sized left_anti. Must equal the scan form exactly
    // (same oracle; shared clause semantics in DocQueries.boolClauses).
    "q_bool_indexed" -> ((s, d) => {
      val dir = tempDir("graft-boolidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.postings(Tables.documents(s, d), "doc_id", "text"),
        s"$dir/postings")
      sink.InvertedIndex.boolSearch(
          sink.InvertedIndex.readPostings(s, s"$dir/postings"),
          must = Seq("merge"), should = Seq("stream", "scan"),
          mustNot = Seq("window"), minimumShouldMatch = 1)
        .orderBy("doc_id")
    }),

    // §2.6 — RangeQuery (Lucene Point/TermRange): numeric bounds, mixed
    // inclusivity, pushed to the scan.
    "q_range" -> ((s, d) =>
      DocQueries.range(Tables.documents(s, d), "n_chars",
        lower = Some(500L), upper = Some(1500L), includeUpper = false)
        .select("doc_id", "n_chars").orderBy("doc_id")),

    // Facet counts over a query's result set (Lucene facets): per-lang
    // doc counts of the "merge window" matches, top-5 by (count, value).
    "q_facets" -> ((s, d) =>
      DocQueries.facetCounts(
        DocQueries.matchText(Tables.documents(s, d), "text", "merge window"),
        "lang", 5)),

    // Cursor pagination (searchAfter): page 2 of the BM25 ranking via
    // the (score, id) cursor from page 1's last hit — must equal rows
    // 11-20 of the full ranking (OFFSET form in the oracle), without
    // offset's sort-n-plus-k scale trap.
    "q_search_after" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val q = "merge window scan"
      val cur = DocQueries.matchTextBM25(docs, "doc_id", "text", q, 10)
        .orderBy(col("bm25").asc, col("doc_id").desc).limit(1)
        .collect().head // the cursor: ONE row of driver state
      DocQueries.searchAfter(docs, "doc_id", "text", q,
        cur.getDouble(cur.fieldIndex("bm25")),
        cur.getLong(cur.fieldIndex("doc_id")), 10)
    }),

    // ES CompositeAggregation: bucket-space pagination — page 2 of the
    // (lang, source) buckets after a key cursor, in key order, via the
    // operator form (DocQueries.compositeAfter; multi-page reassembly
    // spec-pinned in DocQueriesSpec). The after-key filter is a plain
    // predicate on the GROUPED frame, so no page ever materializes the
    // full bucket space anywhere, and the page cut is
    // TakeOrderedAndProject — the aggs twin of search_after.
    "q_composite_agg" -> ((s, d) =>
      sink.DocQueries.compositeAfter(Tables.documents(s, d),
        Seq("lang", "source"),
        Seq(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars")),
        afterKey = Some(Seq("de", "web")), // page-2 cursor
        size = 5)),

    // Ordered proximity (SpanNearQuery, slop 1) off the positional
    // index: "stream data" with at most one interleaved token.
    "q_span_near" -> ((s, d) =>
      sink.InvertedIndex.spanNearSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        "stream data", slop = 1)
        .orderBy("doc_id")),

    // SpanOr: union of two ordered-proximity clauses, per-doc count of
    // matched clauses (the matched_queries evidence).
    "q_span_or" -> ((s, d) =>
      sink.InvertedIndex.spanOrSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        Seq(("stream data", 1), ("merge window", 2)))
        .orderBy("doc_id")),

    // SpanWithin (Lucene SpanWithin/SpanContaining doc semantics):
    // 'merge' occurring INSIDE a stream…data span of slop ≤ 10 — over
    // ALL qualifying spans, not the greedy minimal ones (which would
    // miss containment in a wider span).
    "q_span_within" -> ((s, d) =>
      sink.InvertedIndex.spanWithinSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        "merge", "stream", "data", slop = 10)
        .orderBy("doc_id")),

    // Completion suggester: top-4 "s…" completions by corpus frequency,
    // term tie-break — ranked row-for-row against the oracle.
    "q_suggest" -> ((s, d) =>
      sink.InvertedIndex.suggest(
        sink.InvertedIndex.postings(Tables.documents(s, d), "doc_id", "text"),
        "s", k = 4)
        .orderBy(col("freq").desc, col("term"))),

    // SpanFirstQuery: "merge" within the first 3 token positions.
    "q_span_first" -> ((s, d) =>
      sink.InvertedIndex.spanFirstSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        "merge", end = 3)
        .orderBy("doc_id")),

    // SpanNotQuery: an occurrence of "scan" with no "merge" adjacent
    // (within 1 position either side).
    "q_span_not" -> ((s, d) =>
      sink.InvertedIndex.spanNotSearch(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"),
        include = "scan", exclude = "merge", pre = 1, post = 1)
        .orderBy("doc_id")),

    // Per-SOURCE quality percentile: percent_rank within each source by
    // (n_chars, doc_id) — the per-group normalization step, computed
    // with NO per-group window (a hot source would serialize one task);
    // range-partitioned two-phase ranks like x_quality_rank.
    "x_quality_rank_by_source" -> ((s, d) =>
      operators.Corpus.groupPercentRank(
        Tables.documents(s, d).select("doc_id", "source", "n_chars"),
        "source", struct(col("n_chars"), col("doc_id")), "pr")
        .select(col("doc_id"), col("source"), round(col("pr"), 6).as("pr"))
        .orderBy("doc_id")),

    // Percolation (reverse search): three registered alert queries,
    // every document routed to the alerts it matches — term-keyed
    // joins + clause counting, never a doc × query cross product.
    "q_percolate" -> ((s, d) => {
      import s.implicits._
      val registered = Seq(
        ("alert_merge", Seq("merge", "window"), Seq.empty[String],
          Seq("scan"), -1),
        ("alert_stream", Seq("stream", "data"), Seq.empty[String],
          Seq.empty[String], -1),
        ("alert_common", Seq("the"), Seq.empty[String],
          Seq.empty[String], -1),
        // SHOULD-only with explicit msm=2: ≥2 of 3 topical terms
        ("alert_topic", Seq.empty[String], Seq("merge", "stream", "query"),
          Seq.empty[String], 2),
        // SHOULD-only, default msm (must-less ⇒ 1): the OR query
        ("alert_any", Seq.empty[String], Seq("window", "scan"),
          Seq.empty[String], -1))
        .toDF("query_id", "must", "should", "must_not",
          "minimum_should_match")
      DocQueries.percolate(Tables.documents(s, d), "doc_id", "text",
          registered)
        .orderBy("doc_id", "query_id")
    }),

    // Snippet highlighting: first-occurrence position of "merge" and
    // ±2 tokens of context, edge-clamped — the search-UI hit preview.
    "q_highlight" -> ((s, d) =>
      DocQueries.highlightTerm(Tables.documents(s, d), "doc_id", "text",
        "merge", context = 2)
        .orderBy("doc_id")),

    // Temperature-scaled source mixture (w_s ∝ n_s^α, α=0.5, target
    // half the corpus): the multilingual-LM balancing scheme with rates
    // DERIVED from the corpus — small sources up-weighted vs
    // proportional sampling; md5-56 keep-set, engine-reproducible.
    "x_temp_sample" -> ((s, d) =>
      operators.Corpus.temperatureSample(
        Tables.documents(s, d).select("doc_id", "source"), "doc_id",
        "source", alpha = 0.5, targetFraction = 0.5)
        .select("doc_id", "source").orderBy("doc_id")),

    // §2.6 — PhraseQuery (slop 0): tokens must be consecutive.
    "q_match_phrase" -> ((s, d) =>
      DocQueries.matchPhrase(Tables.documents(s, d), "text", "stream data")
        .select("doc_id").orderBy("doc_id")),

    // MatchPhrasePrefix (autocomplete-as-you-type): "stream da" hits
    // "stream data …" — leading tokens consecutive, last is a prefix.
    "q_match_phrase_prefix" -> ((s, d) =>
      DocQueries.matchPhrasePrefix(Tables.documents(s, d), "text",
          "stream da")
        .select("doc_id").orderBy("doc_id")),

    // PrefixQuery (scan form): any token starts with "merg".
    "q_term_prefix" -> ((s, d) =>
      DocQueries.termPrefix(Tables.documents(s, d), "text", "merg")
        .select("doc_id").orderBy("doc_id")),

    // WildcardQuery (scan form): glob over whole tokens — "m?rge*"
    // compiles to one anchored regexp, codegen'd per token.
    "q_wildcard" -> ((s, d) =>
      DocQueries.matchWildcard(Tables.documents(s, d), "text", "m?rge*")
        .select("doc_id").orderBy("doc_id")),

    // WildcardQuery off the index: literal prefix "m" pushed onto the
    // term-sorted postings, regexp over the pruned vocabulary, postings
    // gathered by broadcast semi-join — must equal the scan form.
    "q_wildcard_indexed" -> ((s, d) => {
      val dir = tempDir("graft-wcidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.postings(Tables.documents(s, d), "doc_id", "text"),
        s"$dir/postings")
      sink.InvertedIndex.wildcardSearch(
          sink.InvertedIndex.readPostings(s, s"$dir/postings"), "m?rge*")
        .orderBy("doc_id")
    }),

    // RegexpQuery (scan form): full-token regexp, RE2-portable subset.
    "q_regex" -> ((s, d) =>
      DocQueries.matchRegexp(Tables.documents(s, d), "text", "(scan|merge)s?")
        .select("doc_id").orderBy("doc_id")),

    // PrefixQuery off the index: pushed StringStartsWith on the
    // term-sorted postings (row-group seek-to-prefix, spec-pinned).
    "q_prefix_indexed" -> ((s, d) => {
      val dir = tempDir("graft-preidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.postings(Tables.documents(s, d), "doc_id", "text"),
        s"$dir/postings")
      sink.InvertedIndex.prefixSearch(
          sink.InvertedIndex.readPostings(s, s"$dir/postings"), "merg")
        .orderBy("doc_id")
    }),

    // FuzzyQuery off the index: edit-distance-1 neighbors of "mergs"
    // found in the VOCABULARY (distinct-term dictionary), postings
    // gathered by broadcast semi-join — must equal the scan form.
    "q_fuzzy_indexed" -> ((s, d) => {
      val dir = tempDir("graft-fuzidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.postings(Tables.documents(s, d), "doc_id", "text"),
        s"$dir/postings")
      sink.InvertedIndex.fuzzySearch(
          sink.InvertedIndex.readPostings(s, s"$dir/postings"), "mergs",
          maxEdits = 1)
        .orderBy("doc_id")
    }),

    // Phrase query OFF THE INDEX: positional postings (Lucene's position
    // data) + consecutive-position join — must equal the corpus-scan
    // matchPhrase membership exactly (same oracle as q_match_phrase).
    // Each query term's leg reads only its row groups (pushed EqualTo on
    // the term-sorted layout, InvertedIndexSpec pin).
    "q_phrase_indexed" -> ((s, d) => {
      val dir = tempDir("graft-posidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"), s"$dir/positional")
      sink.InvertedIndex.phraseSearch(
          sink.InvertedIndex.readPostings(s, s"$dir/positional"),
          "stream data")
        .select("doc_id").orderBy("doc_id")
    }),

    // MatchPhrasePrefix off the positional layout: leading tokens as
    // exact phrase legs, the last as a pushed StringStartsWith prefix
    // leg — q_match_phrase_prefix's contract served from the index.
    "q_phrase_prefix_indexed" -> ((s, d) => {
      val dir = tempDir("graft-posidx")
      sink.InvertedIndex.writePostings(
        sink.InvertedIndex.positionalPostings(
          Tables.documents(s, d), "doc_id", "text"), s"$dir/positional")
      sink.InvertedIndex.phrasePrefixSearch(
          sink.InvertedIndex.readPostings(s, s"$dir/positional"),
          "stream da")
        .orderBy("doc_id")
    }),

    // §2.6 — MatchAllQuery + field retrieval.
    "q_match_all" -> ((s, d) =>
      DocQueries.retrieve(DocQueries.matchAll(Tables.documents(s, d)),
        Seq("doc_id", "source")).orderBy("doc_id")),

    // §2 P1–P5 + C5 composed — the full document-assembly path: flatten,
    // drop-prefix, rename, stringify, null-elide, _id extraction; exploded
    // to (id, field, value) rows for the oracle compare.
    "p_documents" -> ((s, d) => {
      val docs = graft.schema.DocumentBuilder.documents(
        Tables.documents(s, d),
        graft.schema.DocumentBuilder.Config(
          idField = "doc_id",
          fieldMapping = Map("source" -> "origin"),
          dropPrefixes = Seq("n_")))
      docs.select(col("_id"), explode(col("fields")).as(Seq("fname", "fval")))
        .select(col("_id"), col("fname"),
          array_join(col("fval"), "|").as("fval"))
        .orderBy("_id", "fname")
    }),
  )
}
