package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datagen.DocGen
import graft.engine.Pipeline
import graft.ops.{Dedup, Similarity, TextAnalysis}
// Ivf referenced fully-qualified in q_ivf_topk
import graft.stats.ColumnStats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` exposes one demo per implemented operator family (SURVEY.md §2
  * + the training-pipeline ops). SQL-expressible ones carry a DuckDB oracle
  * in [[oracleSql]]; engine-native ones (the synthesized-docs validation
  * pipeline, LSH dedup, ANN) are rows-only checks.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship: the full validation pipeline over the synthesized interleaved
    * docs table; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.violations(spark, DocGen.documents(spark, 5000L).toDF(), DocGen.schema)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- projections / distinct (SURVEY §2.2 P1-P2) --------------------
    "q_distinct_projection" -> ((s, d) =>
      t(s, d, "lineitem").select(col("l_returnflag").as("flag"),
        col("l_linestatus").as("status")).distinct()),

    // --- anti-join: defined-kinds shape (J1/J2) ------------------------
    "q_anti_join_defined" -> ((s, d) =>
      t(s, d, "customer").join(t(s, d, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")),

    // --- referential anti-join: URI-existence shape (J3) ---------------
    "q_referential_anti" -> ((s, d) =>
      t(s, d, "orders").select(col("o_custkey").as("missing_key")).distinct()
        .join(t(s, d, "customer"),
          col("missing_key") === col("c_custkey"), "left_anti")),

    // --- semi-join: affected-records shape (J4) ------------------------
    "q_semi_join" -> ((s, d) =>
      t(s, d, "orders").join(
        t(s, d, "lineitem").filter(col("l_quantity") > 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")),

    // --- inner broadcast join: kinds × schema shape (J5) ---------------
    "q_inner_join_broadcast" -> ((s, d) =>
      t(s, d, "supplier").join(broadcast(t(s, d, "nation")),
        col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation")).agg(count(lit(1)).as("n_suppliers"))
        .select("nation", "n_suppliers")),

    // --- left outer join: property ⟕ range shape (J6/J7) ---------------
    "q_left_outer_join" -> ((s, d) =>
      t(s, d, "nation").join(t(s, d, "supplier"),
        col("n_nationkey") === col("s_nationkey"), "left")
        .groupBy(col("n_name").as("nation"))
        .agg(count(col("s_suppkey")).as("n_suppliers"))),

    // --- group-count + HAVING: max-cardinality shape (A1) --------------
    "q_group_having_max" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders")).filter(col("n_orders") > 5)),

    // --- HAVING =: exact-cardinality shape (A3) ------------------------
    "q_group_having_exact" -> ((s, d) =>
      t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders")).filter(col("n_orders") === 1)),

    // --- per-subject cardinality (A1 row-local flavor) ------------------
    "q_card_per_subject" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items")).filter(col("n_items") > 6)),

    // --- single-pass stats stage (north star; A5/§4.4) ------------------
    "q_agg_stats" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("cnt"),
        count(col("l_quantity")).as("q_cnt"),
        countDistinct(col("l_partkey")).as("partkeys"),
        // quantities are integral; BIGINT keeps the oracle compare
        // representation-stable across engines (DECIMAL → pandas float)
        min(col("l_quantity")).cast("bigint").as("q_min"),
        max(col("l_quantity")).cast("bigint").as("q_max"),
        sum(col("l_quantity").cast("bigint")).as("q_sum"))),

    // --- distinct values per kind (A5) ----------------------------------
    "q_distinct_per_kind" -> ((s, d) =>
      t(s, d, "lineitem").groupBy(col("l_returnflag").as("kind"))
        .agg(countDistinct(col("l_quantity")).as("n_values"))),

    // --- point lookup: CRUD-read shape (SURVEY §2.1 S4) -----------------
    "q_point_lookup" -> ((s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") === 1)
        .select("o_orderkey", "o_custkey", "o_orderstatus")),

    // --- deterministic sort + limit (report-ordering shape, §2.5) -------
    "q_sort_limit" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10).select("o_orderkey")),

    // --- event-time tumbling-window aggregation (streaming-shape, batch) -
    "q_event_window" -> ((s, d) =>
      t(s, d, "events").groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
        col("event_type"))
        .agg(count(lit(1)).as("n"))),

    // --- training-pipeline ops over the driver documents table ----------
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(t(s, d, "documents")).select("digest", "keep_id", "dup_count")),

    "q_token_count" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))),

    "q_fingerprint_dedup" -> ((s, d) =>
      t(s, d, "documents").groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)),

    "q_quality_signals" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.nChars(col("text")).as("n_chars_m"),
        TextAnalysis.nPunct(col("text")).as("n_punct"),
        TextAnalysis.nUpper(col("text")).as("n_upper"))),

    "q_lang_group" -> ((s, d) =>
      t(s, d, "documents").groupBy(col("lang")).agg(count(lit(1)).as("n"))),

    // --- engine-native (rows-only; no SQL equivalent) --------------------
    "q_validate_docs" -> ((s, _) =>
      Pipeline.violations(s, DocGen.documents(s, 20000L).toDF(), DocGen.schema)
        .groupBy("checkId", "severity").agg(count(lit(1)).as("n"))),

    "q_verdicts" -> ((s, _) =>
      Pipeline.verdicts(s, DocGen.documents(s, 20000L).toDF(), DocGen.schema,
        snapshotId = "verify", nBuckets = 16)),

    "q_minhash_neardup" -> ((s, d) =>
      Dedup.nearDupPairs(t(s, d, "documents"), threshold = 0.8)),

    "q_simhash_neardup" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxHamming = 3)),

    "q_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(t(s, d, "documents"), n = 3, threshold = 0.6)),

    "q_langid_heuristic" -> ((s, d) =>
      t(s, d, "documents").groupBy(TextAnalysis.langId(col("text")).as("lid"))
        .agg(count(lit(1)).as("n"))),

    "q_ann_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
      Similarity.annTopK(emb, q, 10)
    }),

    "q_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = emb.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
      val model = graft.ops.Ivf.train(emb, c = 8, iters = 2)
      graft.ops.Ivf.topK(emb, model, q, 10, nProbe = 3)
    }),

    "q_cosine_dup" -> ((s, d) =>
      Similarity.cosineDupPairs(t(s, d, "embeddings"), threshold = 0.99)),

    "q_stats_profile" -> ((s, d) =>
      ColumnStats.profile(t(s, d, "lineitem")).drop("kll"))
  )

  /** DuckDB-dialect oracles; aliases match the Spark column names exactly
    * (the driver sorts columns by name before hashing).
    */
  def oracleSql: Map[String, String] = Map(
    "q_distinct_projection" ->
      "SELECT DISTINCT l_returnflag AS flag, l_linestatus AS status FROM lineitem",
    "q_anti_join_defined" ->
      "SELECT c_custkey FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q_referential_anti" ->
      "SELECT DISTINCT o_custkey AS missing_key FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)",
    "q_semi_join" ->
      "SELECT o_orderkey, o_orderstatus FROM orders WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)",
    "q_inner_join_broadcast" ->
      "SELECT n_name AS nation, count(*) AS n_suppliers FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name",
    "q_left_outer_join" ->
      "SELECT n_name AS nation, count(s_suppkey) AS n_suppliers FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_name",
    "q_group_having_max" ->
      "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) > 5",
    "q_group_having_exact" ->
      "SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey HAVING count(*) = 1",
    "q_card_per_subject" ->
      "SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey HAVING count(*) > 6",
    "q_agg_stats" ->
      ("SELECT count(*) AS cnt, count(l_quantity) AS q_cnt, count(DISTINCT l_partkey) AS partkeys, " +
        "CAST(min(l_quantity) AS BIGINT) AS q_min, CAST(max(l_quantity) AS BIGINT) AS q_max, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q_sum FROM lineitem"),
    "q_distinct_per_kind" ->
      "SELECT l_returnflag AS kind, count(DISTINCT l_quantity) AS n_values FROM lineitem GROUP BY l_returnflag",
    "q_dedup_exact" ->
      "SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS dup_count FROM documents GROUP BY md5(text) HAVING count(*) > 1",
    "q_token_count" ->
      ("SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens, " +
        "len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpeish FROM documents"),
    "q_fingerprint_dedup" ->
      ("SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp, count(*) AS n " +
        "FROM documents GROUP BY 1 HAVING count(*) > 1"),
    "q_quality_signals" ->
      ("SELECT doc_id, length(text) AS n_chars_m, len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct, " +
        "len(regexp_extract_all(text, '[A-Z]')) AS n_upper FROM documents"),
    "q_lang_group" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "q_point_lookup" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey = 1",
    "q_sort_limit" ->
      "SELECT o_orderkey FROM (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)",
    "q_event_window" ->
      "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h, event_type, count(*) AS n FROM events GROUP BY 1, 2"
  )
}
