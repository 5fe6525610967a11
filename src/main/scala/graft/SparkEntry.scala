package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CorpusLake, Curate, Dedup, Ingest, Layout, Multimodal, Packing, Relational, Sampling, Sequence, Similarity, Skew, TextAnalysis, Tokenizer, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is a pure (SparkSession, sfDir) => DataFrame over
  * the parquet fixtures; `oracleSql` carries the ANSI-SQL twin executed by
  * DuckDB on the same tables. Column names and value-producing expression
  * shapes match exactly on both sides (decimal-exact money sums, explicit
  * ROWS window frames, deterministic tiebreaks) so hash comparison is stable.
  */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows>0 on sf0.001. The full
    * reference pipeline (SURVEY.md §7.2): Kafka-envelope encode → decode →
    * date derivation → key filter → keyed last-write-wins upsert. */
  def entry(spark: SparkSession): DataFrame =
    Ingest.referencePipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q0_reference_pipeline" -> (Ingest.referencePipeline _),
    "q1_agg"           -> (Relational.q1PricingSummary _),
    "q6_filter_agg"    -> (Relational.q6ForecastRevenue _),
    "q2_join_broadcast"-> (Relational.q2NationRegion _),
    "q3_join_agg"      -> (Relational.q3CustomerRevenue _),
    "q4_semi_join"     -> (Relational.q4SemiJoin _),
    "q5_anti_join"     -> (Relational.q5AntiJoin _),
    "q_outer_join_agg" -> (Relational.qOuterJoin _),
    "q7_window_topk"   -> (Relational.q7WindowTopK _),
    "q8_window_running"-> (Relational.q8WindowRunning _),
    "q9_rollup"        -> (Relational.q9Rollup _),
    "q10_cube"         -> (Relational.q10Cube _),
    "q11_union"        -> (Relational.q11Union _),
    "q11_intersect"    -> (Relational.q11Intersect _),
    "q11_except"       -> (Relational.q11Except _),
    "q12_topk"         -> (Relational.q12TopK _),
    "q13_distinct_agg" -> (Relational.q13DistinctAgg _),
    "q14_string_funcs" -> (Relational.q14StringFuncs _),
    "q15_date_funcs"   -> (Relational.q15DateFuncs _),
    "q16_case_expr"    -> (Relational.q16CaseExpr _),
    "q_asof_join"      -> (Relational.qAsOfJoin _),
    "q17_grouping_sets"-> (Relational.q17GroupingSets _),
    "q18_pivot"        -> (Relational.q18Pivot _),
    "q19_percentile"   -> (Relational.q19Percentile _),
    "q20_array_funcs"  -> (Relational.q20ArrayFuncs _),
    "q_map_funcs"      -> (Relational.qMapFuncs _),
    // north-star: dedup / similarity / text analysis / windows / multimodal
    "dedup_exact"          -> (Dedup.exact _),
    "dedup_minhash_lsh"    -> (Dedup.minhashLsh _),
    "dedup_clusters"       -> (Dedup.clusters _),
    "dedup_simhash"        -> (Dedup.simhash _),
    "dedup_simhash_wide"   -> (Dedup.simhashWide _),
    "dedup_simhash_auto"   -> (Dedup.simhashAuto _),
    "dedup_ngram_jaccard"  -> (Dedup.ngramJaccard _),
    "dedup_embedding_lsh"  -> (Similarity.nearDupEmbedding _),
    "sim_topk_brute"       -> (Similarity.topkBruteForce _),
    "sim_hard_negatives"   -> (Similarity.hardNegatives _),
    "sim_ann_recall"       -> (Similarity.annRecall _),
    "sim_hybrid_rrf"       -> (Similarity.hybridRrf _),
    "sim_linear_probe"     -> (Similarity.linearProbe _),
    "sim_cluster_assign"   -> (Similarity.clusterAssign _),
    "sim_cell_drift"       -> (Similarity.cellDrift _),
    "sim_label_centroids"  -> (Similarity.labelCentroids _),
    "sim_topk_ivf"         -> (Similarity.topkIvf _),
    "text_tokens"          -> (TextAnalysis.tokenCounts _),
    "text_postings_append" -> (TextAnalysis.postingsAppend _),
    "text_langid"          -> (TextAnalysis.langId _),
    "text_quality"         -> (TextAnalysis.quality _),
    "text_repetition"      -> (TextAnalysis.repetition _),
    "text_fingerprint"     -> (TextAnalysis.fingerprint _),
    "dedup_contamination"  -> (Dedup.contamination _),
    "q_interval_join"      -> (Windows.intervalJoin _),
    "q_funnel"             -> (Sequence.funnel _),
    "q_retention"          -> (Sequence.retention _),
    "q_window_tumbling"    -> (Windows.tumbling _),
    "q_window_sliding"     -> (Windows.sliding _),
    "q_window_session"     -> (Windows.sessions _),
    "q_multimodal_meta"    -> (Multimodal.metadata _),
    "q_multimodal_frames"  -> (Multimodal.frameSample _),
    "q_media_lake"         -> (Multimodal.mediaLake _),
    "media_frame_dedup"    -> (Multimodal.frameDedup _),
    "media_near_dup"       -> (Multimodal.mediaNearDup _),
    "q_sample_systematic"  -> (Sampling.systematic _),
    "q_sample_stratified"  -> (Sampling.stratified _),
    "q_edit_distance"      -> (Sampling.editDistance _),
    "q_props_json"         -> (Ingest.propsJson _),
    "q_salted_agg"         -> (Skew.saltedAgg _),
    "q_salted_join"        -> (Skew.saltedJoin _),
    "pipeline_curate"      -> (Curate.curate _),
    "text_packing"         -> (Packing.packing _),
    "q_sketch_distinct"    -> (Ingest.sketchDistinct _),
    "text_chunking"        -> (Packing.chunking _),
    "text_topgrams"        -> (TextAnalysis.topGrams _),
    "sim_quantize_int8"    -> (Similarity.quantizeInt8 _),
    "q_sample_split"       -> (Sampling.trainValTestSplit _),
    "q_split_cluster_safe" -> (Sampling.clusterSafeSplit _),
    "corpus_split_safe"    -> (Sampling.clusterSafeSplitLake _),
    "corpus_train_shards"  -> (Sampling.trainShardManifest _),
    "corpus_split_shards"  -> (Sampling.splitShardManifest _),
    "q_sketch_quantiles"   -> (Relational.sketchQuantiles _),
    "q_sketch_qsample"     -> (Relational.sketchQuantileSample _),
    "pipeline_prepare"     -> (Curate.prepare _),
    "q21_stats"            -> (Relational.q21Stats _),
    "text_pii_scrub"       -> (TextAnalysis.piiScrub _),
    "text_vocab_oov"       -> (TextAnalysis.vocabOov _),
    "pipeline_mixture"     -> (Sampling.mixture _),
    "text_boilerplate"     -> (TextAnalysis.boilerplate _),
    "text_salient_terms"   -> (TextAnalysis.salientTerms _),
    "sketch_heavy_hitters" -> (TextAnalysis.sketchHeavyHitters _),
    "dedup_incremental"    -> (Dedup.incremental _),
    "dedup_spans"          -> (Dedup.spanDedup _),
    "dedup_semantic"       -> (Similarity.semanticDedup _),
    "dedup_bloom"          -> (Dedup.bloomContamination _),
    "text_bm25_topk"       -> (TextAnalysis.bm25TopK _),
    "sim_kmeans"           -> (Similarity.kmeans _),
    "q_profile_stats"      -> (Relational.profileStats _),
    "q_profile_hll"        -> (Relational.profileStatsSketch _),
    "q_bucketed_join"      -> (Layout.bucketedJoin _),
    "q_shuffle_seeded"     -> (Sampling.seededShuffle _),
    "pipeline_curriculum"  -> (Sampling.curriculum _),
    "text_lm_ppl"          -> (TextAnalysis.lmPerplexity _),
    "sim_topk_pq"          -> (Similarity.topkPq _),
    "sim_topk_ivfpq"       -> (Similarity.topkIvfPq _),
    "sim_index_append"     -> (Similarity.indexAppend _),
    "sim_balanced_sample"  -> (Similarity.balancedSample _),
    "dedup_substrings"     -> (Dedup.substringDedup _),
    "pipeline_dsir"        -> (Sampling.dsir _),
    "pipeline_temperature" -> (Sampling.temperatureMixture _),
    "text_bpe"             -> (Tokenizer.bpeTrain _),
    "q_zorder"             -> (Layout.zorderStats _),
    "sim_hybrid_rrf_ann"   -> (Similarity.hybridRrfAnn _),
    "sim_hard_negatives_ivf" -> (Similarity.hardNegativesIvf _),
    "media_cdc_dedup"      -> (Multimodal.cdcDedup _),
    "media_near_dup_cdc"   -> (Multimodal.mediaNearDupCdc _),
    "sim_ann_recall_pq"    -> (Similarity.annRecallPq _),
    "sim_ann_recall_pq_refined" -> (Similarity.annRecallPqRefined _),
    "sim_index_drift"      -> (Similarity.indexDrift _),
    "dedup_index_serve"    -> (Dedup.dedupIndexServe _),
    "corpus_admission"     -> (Curate.admission _),
    "corpus_expectations"  -> (Curate.expectationsGate _),
    "corpus_changes"       -> (CorpusLake.changesTwin _),
    "corpus_profile"       -> (CorpusLake.profileTwin _),
    "corpus_profile_drift" -> (CorpusLake.profileDriftTwin _),
    "corpus_optimize"      -> (CorpusLake.optimizeTwin _),
    "corpus_delete"        -> (CorpusLake.deleteTwin _),
    "corpus_delete_feed"   -> (CorpusLake.deleteFeedTwin _),
    "corpus_pruned_read"   -> (CorpusLake.prunedTwin _),
    "corpus_branch"        -> (CorpusLake.branchTwin _),
    "corpus_branch_merge"  -> (CorpusLake.branchMergeTwin _),
    "corpus_view"          -> (graft.operators.LakeView.viewTwin _),
    "corpus_view_minmax"   -> (graft.operators.LakeView.viewMinMaxTwin _),
    "corpus_view_evolve"   -> (graft.operators.LakeView.viewEvolveTwin _),
    "corpus_view_distinct" -> (graft.operators.LakeView.viewDistinctTwin _),
    "corpus_view_quantile" -> (graft.operators.LakeView.viewQuantileTwin _),
    "corpus_view_topk"     -> (graft.operators.LakeView.viewTopkTwin _),
    "corpus_views_shared"  -> (graft.operators.LakeView.viewsSharedTwin _),
    "corpus_replica"       -> (CorpusLake.replicaTwin _),
    "corpus_card"          -> (Curate.datasetCard _),
    "corpus_card_lake"     -> (Curate.cardLakeTwin _),
    "corpus_card_live"     -> (Curate.cardLiveTwin _),
    "corpus_card_travel"   -> (Curate.cardLiveAtTwin _),
    "corpus_card_live_q"   -> (Curate.cardLiveQuantTwin _),
    "text_index_drift"     -> (TextAnalysis.postingsDrift _),
    "corpus_run_shards"    -> (CorpusLake.shardManifestTwin _),
    "corpus_run_shards_delta" -> (CorpusLake.shardDeltaTwin _),
    "corpus_lease_refusal" -> (CorpusLake.leaseRefusalTwin _),
  )

  /** The gear CDC byte table as a DuckDB list literal — single source of
    * truth with the native kernel (both derive from hash60("gear|b")). */
  private val GearSqlTable = graft.functions.GearKernels.gearSqlList

  /** `dedup_simhash_auto` shares the NARROW oracle verbatim: at every
    * driver scale nDocs ≤ 5 000, far below the 2¹⁸ dispatch knee, so the
    * auto operator provably selects the narrow scheme there (the
    * crossover itself is pinned in DedupSpec — no oracle run reaches
    * 262 k docs; the wide branch keeps its own `dedup_simhash_wide`
    * oracle). */
  def oracleSql: Map[String, String] =
    oracleSqlBase + ("dedup_simhash_auto" -> oracleSqlBase("dedup_simhash"))

  private val oracleSqlBase: Map[String, String] = Map(
    // End-to-end twin of the reference pipeline: computes the keyed-upsert
    // final state directly from `events`, verifying the whole Spark-side
    // envelope encode → split → from_json → derive → filter → dedup chain.
    "q0_reference_pipeline" ->
      """SELECT event_type AS fx_marker,
        |  CAST(epoch_ns(ts) // 1000000 AS VARCHAR) AS timestamp_ms,
        |  CAST(CAST(make_timestamp(((epoch_ns(ts) // 1000000) // 1000) * 1000000) AS DATE) AS VARCHAR) AS timestamp_dt
        |FROM events
        |WHERE event_type IS NOT NULL AND event_type != ''
        |QUALIFY row_number() OVER (PARTITION BY event_type
        |                           ORDER BY epoch_ns(ts) // 1000000 DESC) = 1
        |ORDER BY fx_marker""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(l_quantity) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q2_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name AS region_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q3_join_agg" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q_outer_join_agg" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_orders,
        |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q7_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  lag(o_orderdate, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderdate
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q9_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  count(*) AS n_cust
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q11_union" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |UNION
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q11_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q11_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
        |ORDER BY o_custkey""".stripMargin,

    "q12_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q13_distinct_agg" ->
      """SELECT l_suppkey,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_items
        |FROM lineitem
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin,

    "q14_string_funcs" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  substring(p_type, 1, 5) AS type_prefix,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q15_date_funcs" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(year(date_trunc('month', o_orderdate)) AS INTEGER) AS order_year
        |FROM orders
        |GROUP BY 1
        |ORDER BY order_month""".stripMargin,

    "q16_case_expr" ->
      """SELECT
        |  CASE WHEN o_totalprice > 200000 THEN 'large'
        |       WHEN o_totalprice > 100000 THEN 'medium'
        |       ELSE 'small' END AS size_bucket,
        |  coalesce(nullif(o_orderstatus, 'F'), 'finished') AS status_label,
        |  count(*) AS n
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY size_bucket, status_label""".stripMargin,

    "q_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |  (SELECT max(o.o_orderdate) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS last_orderdate
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,

    "q17_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q18_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS p99_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_array_funcs" ->
      """SELECT vec_id,
        |  list_max(embedding) AS arr_max,
        |  list_min(embedding) AS arr_min,
        |  embedding[1] AS first_dim,
        |  CAST(len([x for x in embedding if x > 0]) AS INTEGER) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // the map is an in-plan representation on the Spark side; the oracle
    // computes the same extracted scalars relationally
    "q_map_funcs" ->
      """WITH c AS (
        |  SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS INTEGER) AS n_statuses,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN n END), 0) AS BIGINT) AS n_open,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN n END), 0) AS BIGINT) AS n_filled,
        |  CAST(sum(n) AS BIGINT) AS n_total
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" ->
      """SELECT lang, source, min(doc_id) AS representative, count(*) AS n_docs
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "dedup_minhash_lsh" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |)
        |SELECT c.id_a, c.id_b,
        |  len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |  len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
        |FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // connected components over the minhash pair graph via recursive CTE;
    // cluster_rep = min doc_id of the component (the dedup survivor)
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |)
        |SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
        |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    [CAST(concat('0x',substr(md5(t),1,15)) AS BIGINT) % 281474976710656 for t in string_split(text,' ')] AS hs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, CAST(list_sum(
        |    [ CASE WHEN list_sum([ CASE WHEN CAST(floor(h / 2^j) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END for h in hs ]) > 0
        |      THEN CAST(2^j AS BIGINT) ELSE 0 END for j in range(0,48) ]) AS BIGINT) AS sim
        |  FROM tok
        |)
        |-- all-pairs witness: the Spark side's 4x12-bit banding is provably
        |-- complete for hamming <= 3 (pigeonhole), so the oracle need not
        |-- mirror it and independently checks the declared semantics
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
        |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        |WHERE CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // the two-word WIDE variant (Dedup.simhashWide): word A over
    // hash60(token), word B over hash60('w2|' || token), 2*12 = 24 bits
    // per word at the fixture floor (mod 2^24 keeps the double-arithmetic
    // bit extraction exact); hamming = popcount sum across the two words,
    // same all-pairs witness as the narrow twin
    "dedup_simhash_wide" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    [CAST(concat('0x',substr(md5(t),1,15)) AS BIGINT) % 16777216 for t in ts] AS ha,
        |    [CAST(concat('0x',substr(md5('w2|'||t),1,15)) AS BIGINT) % 16777216 for t in ts] AS hb
        |  FROM tok),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(list_sum(
        |      [ CASE WHEN list_sum([ CASE WHEN CAST(floor(h / 2^j) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END for h in ha ]) > 0
        |        THEN CAST(2^j AS BIGINT) ELSE 0 END for j in range(0,24) ]) AS BIGINT) AS sa,
        |    CAST(list_sum(
        |      [ CASE WHEN list_sum([ CASE WHEN CAST(floor(h / 2^j) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END for h in hb ]) > 0
        |        THEN CAST(2^j AS BIGINT) ELSE 0 END for j in range(0,24) ]) AS BIGINT) AS sb
        |  FROM h
        |)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(bit_count(xor(x.sa, y.sa)) + bit_count(xor(x.sb, y.sb)) AS INTEGER) AS hamming
        |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        |WHERE CAST(bit_count(xor(x.sa, y.sa)) + bit_count(xor(x.sb, y.sb)) AS INTEGER) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, n_chars,
        |    list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]),1,15)) AS BIGINT) for i in range(1, len(s))]) AS grams
        |  FROM (SELECT doc_id, n_chars, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 2
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.grams, b.grams)) * 1.0 /
        |  (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 16
        |WHERE len(list_intersect(a.grams, b.grams)) * 1.0 /
        |      (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_embedding_lsh" ->
      """WITH c AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |bits AS (
        |  SELECT vec_id,
        |    [ CASE WHEN list_sum([ v[d+1] * (CASE WHEN CAST(concat('0x',substr(md5(CAST(j AS VARCHAR)||'_'||CAST(d AS VARCHAR)),1,15)) AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END) for d in range(0,64) ]) > 0 THEN 1 ELSE 0 END for j in range(0,32) ] AS bits
        |  FROM c
        |),
        |buckets AS (
        |  SELECT vec_id, b AS band,
        |    CAST(list_sum([bits[b*8+i+1] * (1<<i) for i in range(0,8)]) AS BIGINT) AS key
        |  FROM bits, (SELECT unnest(range(0,4)) AS b)
        |),
        |probes AS (
        |  SELECT vec_id, band,
        |    CASE WHEN p = 0 THEN key ELSE CAST(xor(key, 1<<(p-1)) AS BIGINT) END AS pkey
        |  FROM buckets, (SELECT unnest(range(0,9)) AS p)
        |),
        |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        |  FROM buckets x JOIN probes y ON x.band = y.band AND x.key = y.pkey AND x.vec_id < y.vec_id)
        |SELECT c2.id_a, c2.id_b,
        |  round(list_sum([a.v[i]*b.v[i] for i in range(1,65)]) / (a.nrm*b.nrm), 6) AS cosine
        |FROM cand c2 JOIN c a ON c2.id_a = a.vec_id JOIN c b ON c2.id_b = b.vec_id
        |WHERE round(list_sum([a.v[i]*b.v[i] for i in range(1,65)]) / (a.nrm*b.nrm), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "sim_label_centroids" ->
      """WITH u AS (
        |  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
        |)
        |SELECT label, CAST(dim AS INTEGER) AS dim,
        |  round(sum(x) / count(*), 6) AS centroid_val
        |FROM u GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,

    "sim_topk_brute" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT query_id, n.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q WHERE n.vec_id != query_id
        |)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // same brute scan as sim_topk_brute with the label-mismatch predicate
    // in the join; anchor_label/neg_label ride along
    "sim_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn,
        |             label AS anchor_label FROM n WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT query_id, anchor_label, n.vec_id AS neighbor_id,
        |    n.label AS neg_label,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q
        |  WHERE n.vec_id != query_id AND n.label != anchor_label
        |)
        |SELECT query_id, anchor_label, neighbor_id, neg_label, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // linear probe, 2 unrolled GD rounds (the sim_kmeans convention):
    // x = [1, v], y = (label < 5), round-1 pred is exactly 0 (w=0), each
    // round's STEP lr*2*avg((pred-y)*x_d) is rounded 6dp (lr folded in so
    // the weight update subtracts two exact 6dp decimals and never lands
    // on a rounding halfway case) and the weight re-rounded 6dp; least squares
    // keeps the arithmetic IEEE-exact (no transcendentals)
    "sim_linear_probe" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    CASE WHEN label < 5 THEN 1.0 ELSE 0.0 END AS y
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, y, i AS dim,
        |    CASE WHEN i = 0 THEN 1.0 ELSE v[i] END AS x
        |  FROM e, (SELECT unnest(range(0, 65)) AS i)),
        |g1 AS (SELECT dim, round(2*0.5*avg((0.0 - y)*x), 6) AS s FROM u GROUP BY dim),
        |w1 AS (SELECT dim, round(0.0 - s, 6) AS w FROM g1),
        |p2 AS (
        |  SELECT u.vec_id, CAST(sum(w1.w * u.x) AS DOUBLE) AS pred
        |  FROM u JOIN w1 USING (dim) GROUP BY u.vec_id),
        |g2 AS (
        |  SELECT u.dim, round(2*0.5*avg((p2.pred - u.y)*u.x), 6) AS s
        |  FROM u JOIN p2 ON u.vec_id = p2.vec_id GROUP BY u.dim),
        |w2 AS (SELECT w1.dim, round(w1.w - g2.s, 6) AS w
        |  FROM w1 JOIN g2 ON w1.dim = g2.dim)
        |SELECT CAST(dim AS INTEGER) AS dim, w AS weight FROM w2 ORDER BY dim""".stripMargin,

    // hybrid RRF: the bm25 lexical leg (same CTE chain as text_bm25_topk,
    // n_terms_dropped omitted — the fused row doesn't carry it) full-outer
    // joined with the dense cosine leg (same CTE chain as sim_topk_brute),
    // each doc scoring sum over present legs of 1/(60 + rank), 6dp, top-10
    // per query on (rrf_score desc, doc_id asc); absent legs rank 0
    "sim_hybrid_rrf" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl,
        |          greatest(4096, count(*) // 20) AS dfcap FROM t),
        |d AS (SELECT doc_id, len(s) AS dl, unnest(s) AS tok FROM t),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d GROUP BY doc_id, dl, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |q AS (
        |  SELECT query_id, tok, df FROM (
        |    SELECT query_id, tok, df, dfcap FROM (
        |      SELECT tf.doc_id AS query_id, tf.tok, dfq.df,
        |        row_number() OVER (PARTITION BY tf.doc_id ORDER BY dfq.df ASC, tf.tok ASC) AS qrn
        |      FROM tf JOIN dfq USING (tok) WHERE tf.doc_id % 100 = 0)
        |    CROSS JOIN stats WHERE qrn <= 8)
        |  WHERE df <= dfcap
        |),
        |sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(ln(1.0 + (n - q.df + 0.5) / (q.df + 0.5)) *
        |      (tf.tf * (1.2 + 1)) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl))), 6) AS score
        |  FROM tf JOIN q USING (tok) CROSS JOIN stats
        |  WHERE tf.doc_id <> q.query_id
        |  GROUP BY q.query_id, tf.doc_id
        |),
        |lex AS (
        |  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS lex_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |    FROM sc) WHERE rank <= 10),
        |nv AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM nv WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT query_id, nv.vec_id AS doc_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM nv CROSS JOIN qv WHERE nv.vec_id != query_id),
        |sem AS (
        |  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS sem_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rank
        |    FROM scored) WHERE rank <= 10),
        |f AS (
        |  SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
        |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |    coalesce(lex.lex_rank, 0) AS lex_rank,
        |    coalesce(sem.sem_rank, 0) AS sem_rank,
        |    round(coalesce(1.0/(60 + lex.lex_rank), 0) +
        |          coalesce(1.0/(60 + sem.sem_rank), 0), 6) AS rrf_score
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
        |SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
        |  CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rank
        |  FROM f)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the shared IVF assignment as its own query: argmax over centroids by
    // (round6 cosine desc, cent_id asc) — pins the native NearestCentroid
    // kernel against DuckDB's window-rank formulation directly
    "sim_cluster_assign" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0)
        |SELECT vec_id, cent_id AS cell_id, csim FROM (
        |  SELECT vec_id, cent_id, csim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |  FROM (
        |    SELECT n.vec_id, cents.cent_id,
        |      round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |    FROM n CROSS JOIN cents))
        |WHERE arn = 1 ORDER BY vec_id""".stripMargin,

    // dense-leg data drift: per-cell population shift under the PINNED
    // IVF quantizer between the %11 churn twins — integer ppm shares
    // (hash-exact), flag past 2% of corpus mass moving cells; the engine
    // assigns each vector ONCE with both versions' membership flags
    "sim_cell_drift" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT vec_id, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, cents.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN cents))
        |  WHERE arn = 1
        |),
        |f AS (
        |  SELECT cent_id AS cell_id,
        |    CAST(sum(CASE WHEN vec_id % 11 != 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs_v1,
        |    CAST(sum(CASE WHEN vec_id % 11 != 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_vecs_v2
        |  FROM assigned GROUP BY 1)
        |SELECT cell_id, n_vecs_v1, n_vecs_v2,
        |  CAST(round(n_vecs_v2 * 1000000.0 / (SELECT sum(n_vecs_v2) FROM f)
        |     - n_vecs_v1 * 1000000.0 / (SELECT sum(n_vecs_v1) FROM f)) AS BIGINT) AS shift_ppm,
        |  abs(CAST(round(n_vecs_v2 * 1000000.0 / (SELECT sum(n_vecs_v2) FROM f)
        |     - n_vecs_v1 * 1000000.0 / (SELECT sum(n_vecs_v1) FROM f)) AS BIGINT)) > 20000 AS shifted
        |FROM f ORDER BY cell_id""".stripMargin,

    "sim_topk_ivf" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cent_id FROM (
        |    SELECT vec_id, v, nrm, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, n.nrm, cents.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN cents))
        |  WHERE arn = 1
        |),
        |probes AS (
        |  SELECT query_id, qv, qn, cent_id FROM (
        |    SELECT query_id, qv, qn, cent_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cent_id ASC) AS prn
        |    FROM (
        |      SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qn, cents.cent_id,
        |        round(list_sum([q.v[i]*cv[i] for i in range(1,65)]) / (q.nrm*cn), 6) AS csim
        |      FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q CROSS JOIN cents))
        |  WHERE prn <= 2
        |),
        |scored AS (
        |  SELECT query_id, a.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*a.v[i] for i in range(1,65)]) / (qn*a.nrm), 6) AS cosine
        |  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
        |  WHERE a.vec_id != p.query_id
        |)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // truth = the sim_topk_brute chain; approx = the sim_topk_ivf chain;
    // recall@10 = overlap / 10 per query
    "sim_ann_recall" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |bscored AS (
        |  SELECT query_id, n.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q WHERE n.vec_id != query_id
        |),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM bscored) WHERE rank <= 10),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cent_id FROM (
        |    SELECT vec_id, v, nrm, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, n.nrm, cents.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN cents))
        |  WHERE arn = 1
        |),
        |probes AS (
        |  SELECT query_id, qv, qn, cent_id FROM (
        |    SELECT query_id, qv, qn, cent_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cent_id ASC) AS prn
        |    FROM (
        |      SELECT query_id, qv, qn, cents.cent_id,
        |        round(list_sum([qv[i]*cv[i] for i in range(1,65)]) / (qn*cn), 6) AS csim
        |      FROM q CROSS JOIN cents))
        |  WHERE prn <= 2
        |),
        |iscored AS (
        |  SELECT query_id, a.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*a.v[i] for i in range(1,65)]) / (qn*a.nrm), 6) AS cosine
        |  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
        |  WHERE a.vec_id != p.query_id
        |),
        |approx AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM iscored) WHERE rank <= 10),
        |hits AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1)
        |SELECT t.query_id, coalesce(h.n_hits, 0) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall
        |FROM (SELECT query_id FROM truth GROUP BY 1) t
        |LEFT JOIN hits h ON t.query_id = h.query_id
        |ORDER BY t.query_id""".stripMargin,

    // lexical segment-append encode (incremental postings maintenance):
    // every 10th document re-arrives under id+10^6; the stored row is
    // (doc_id, dl, tok, tf) with dl = whitespace token count — df/N/avgdl
    // stay pinned at the base index (the stale-idf segment contract), so
    // only the per-batch tokenize+count is on trial here
    "text_postings_append" ->
      """WITH delta AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS dl,
        |    unnest(string_split(text, ' ')) AS tok
        |  FROM delta)
        |SELECT doc_id, dl, tok, count(*) AS tf
        |FROM toks GROUP BY doc_id, dl, tok
        |ORDER BY doc_id, tok""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INTEGER) AS n_distinct_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH g AS (
        |  SELECT doc_id, lang, list_distinct([substr(lower(text), i, 3) for i in range(1, len(text)-1)]) AS grams
        |  FROM documents WHERE len(text) >= 3
        |),
        |prof AS (
        |  SELECT lang AS profile_lang, gram FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, gram ASC) AS rn
        |    FROM (SELECT lang, unnest(grams) AS gram FROM g)
        |    GROUP BY lang, gram)
        |  WHERE rn <= 20
        |),
        |sc AS (
        |  SELECT doc_id, lang, profile_lang, count(*) AS score
        |  FROM (SELECT doc_id, lang, unnest(grams) AS gram FROM g) d
        |  JOIN prof USING (gram)
        |  GROUP BY doc_id, lang, profile_lang
        |)
        |SELECT doc_id, pred_lang, actual_lang, correct FROM (
        |  SELECT doc_id, profile_lang AS pred_lang, lang AS actual_lang,
        |    (profile_lang = lang) AS correct,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang ASC) AS rn
        |  FROM sc)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS toks FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks) AS stopword_ratio,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
        |  CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks) AS mean_token_len,
        |  0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |  0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |  0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |g AS (
        |  SELECT doc_id, len(s) AS n,
        |    len(list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]),1,15)) AS BIGINT) for i in range(1, len(s))])) AS d2,
        |    len(list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]||' '||s[i+2]),1,15)) AS BIGINT) for i in range(1, len(s)-1)])) AS d3
        |  FROM t WHERE len(s) >= 3
        |)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
        |  (n - 1 - d2) * 1.0 / (n - 1) AS dup_bigram_frac,
        |  (n - 2 - d3) * 1.0 / (n - 2) AS dup_trigram_frac,
        |  ((n - 1 - d2) * 1.0 / (n - 1)) > 0.2 AS flagged
        |FROM g ORDER BY doc_id""".stripMargin,

    "dedup_contamination" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]),1,15)) AS BIGINT) for i in range(1, len(s)-6)]) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 8
        |),
        |b AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
        |c AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0)
        |SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared,
        |  count(*) * 1.0 / ng AS overlap_frac
        |FROM c JOIN b USING (gram)
        |GROUP BY c.doc_id, ng, b.bench_id
        |HAVING count(*) >= 8
        |ORDER BY doc_id, bench_id""".stripMargin,

    "text_fingerprint" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |h AS (SELECT doc_id, list_sort([CAST(concat('0x',substr(md5(sh2),1,15)) AS BIGINT) for sh2 in shingles]) AS hs FROM sh)
        |SELECT doc_id,
        |  CAST(list_sum(list_slice(hs, 1, 8)) AS BIGINT) AS fingerprint,
        |  hs[1] AS min_hash,
        |  CAST(len(list_slice(hs, 1, 8)) AS INTEGER) AS sketch_size
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_interval_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms FROM events
        |)
        |SELECT p.user_id AS user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.ms - c.ms AS lag_ms
        |FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM ev WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND c.ms <= p.ms AND c.ms > p.ms - 1800000
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,

    // Global min-chain formulation; the Spark side is the window-chained
    // running-min over one (user, ms)-sort — Sequence.funnel's scaladoc
    // carries the exact-equivalence argument (strict-ms comparisons agree
    // on equal-timestamp ties in both formulations).
    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events
        |),
        |t1 AS (SELECT user_id, min(ms) AS m FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ms) AS m FROM ev e
        |       JOIN t1 ON e.user_id = t1.user_id
        |       WHERE e.event_type = 'click'
        |         AND e.ms > t1.m AND e.ms <= t1.m + 86400000 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ms) AS m FROM ev e
        |       JOIN t2 ON e.user_id = t2.user_id
        |       WHERE e.event_type = 'purchase'
        |         AND e.ms > t2.m AND e.ms <= t2.m + 86400000 GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS step, 'view' AS event_type,
        |    (SELECT count(*) FROM t1) AS users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM t2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM t3))
        |ORDER BY step""".stripMargin,

    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events
        |),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT f.cohort_day AS cohort_day,
        |  (ev.day - f.cohort_day) // 7 AS week_offset,
        |  count(DISTINCT ev.user_id) AS active_users
        |FROM ev JOIN f ON ev.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_window_tumbling" ->
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS window_start,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_window_sliding" ->
      """SELECT ws AS window_start, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT value, time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL '30 minutes' AS ws
        |  FROM events, (SELECT unnest([0,1]) AS k))
        |GROUP BY ws ORDER BY ws""".stripMargin,

    "q_window_session" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events
        |),
        |s AS (
        |  SELECT user_id, event_id, ts, ms,
        |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |),
        |s2 AS (
        |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM s
        |)
        |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s2 GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    // the Spark side wrote every document's bytes as an individual blob file
    // and read them back via binaryFile; the oracle computes length + md5
    // straight from the source table — equality proves the lake round-trip
    // preserved every byte of every blob
    "q_media_lake" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  'application/x-graft-' || lang AS mime,
        |  CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) AS INTEGER) AS n_frames,
        |  hex(encode(substr(text, 1, 8))) AS head_hex
        |FROM documents ORDER BY doc_id""".stripMargin,

    // perceptual media near-dup: 48-bit simhash over the payload's frame
    // hashes (same frame-hash arithmetic as q_multimodal_frames, same
    // simhash bit math as dedup_simhash), all-pairs witness — the Spark
    // side's banding is pigeonhole-complete for hamming <= 3, so the
    // oracle states the declared semantics instead of mirroring bands
    "media_near_dup" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) AS INTEGER) AS n_frames
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, text, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx FROM m
        |),
        |fh AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(hex(encode(substr(text, frame_idx*64 + 1, 64)))),1,15)) AS BIGINT) % 281474976710656 AS h
        |  FROM f
        |),
        |hs AS (SELECT doc_id, list(h) AS hs FROM fh GROUP BY doc_id),
        |sig AS (
        |  SELECT doc_id, CAST(list_sum(
        |    [ CASE WHEN list_sum([ CASE WHEN CAST(floor(h / 2^j) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END for h in hs ]) > 0
        |      THEN CAST(2^j AS BIGINT) ELSE 0 END for j in range(0,48) ]) AS BIGINT) AS sim
        |  FROM hs
        |)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
        |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        |WHERE CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // frame-level storage dedup: first occurrence of a frame hash (by
    // packed (doc_id, frame_idx) min — doc_id*2^24 + frame_idx) owns it;
    // every later occurrence is a frame a hash-addressed store would not
    // re-write. Same frame-hash arithmetic as q_multimodal_frames.
    "media_frame_dedup" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) AS INTEGER) AS n_frames
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, text, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx FROM m
        |),
        |fh AS (
        |  SELECT doc_id, frame_idx,
        |    CAST(octet_length(encode(substr(text, frame_idx*64 + 1, 64))) AS BIGINT) AS fb,
        |    CAST(concat('0x', substr(md5(hex(encode(substr(text, frame_idx*64 + 1, 64)))),1,15)) AS BIGINT) AS h
        |  FROM f
        |),
        |own AS (SELECT h, min(doc_id*16777216 + frame_idx) AS own_key FROM fh GROUP BY h)
        |SELECT fh.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(sum(CASE WHEN fh.doc_id*16777216 + fh.frame_idx <> own.own_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_frames,
        |  CAST(sum(fb) AS BIGINT) AS payload_bytes,
        |  CAST(sum(CASE WHEN fh.doc_id*16777216 + fh.frame_idx <> own.own_key THEN fb ELSE 0 END) AS BIGINT) AS bytes_saved
        |FROM fh JOIN own ON fh.h = own.h
        |GROUP BY fh.doc_id ORDER BY fh.doc_id""".stripMargin,

    // recall of the FULL IVFADC serving leg vs exact ground truth: the
    // sim_ann_recall truth/hits CTEs around the complete sim_topk_ivfpq
    // chain (both approximations compounded)
    "sim_ann_recall_pq" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |bscored AS (
        |  SELECT query_id, n.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q WHERE n.vec_id != query_id
        |),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM bscored) WHERE rank <= 10),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT n.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM n CROSS JOIN cents)
        |  WHERE arn = 1),
        |probes AS (
        |  SELECT query_id, cent_id FROM (
        |    SELECT qq.vec_id AS query_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |        round(list_sum([qq.v[i]*cv[i] for i in range(1,65)]) / (qq.nrm*cn), 6) DESC,
        |        cent_id ASC) AS prn
        |    FROM (SELECT * FROM n WHERE vec_id % 100 = 0) qq CROSS JOIN cents)
        |  WHERE prn <= 2),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cid, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM n CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT qq.vec_id AS query_id, qq.nrm AS qn, mm.m, cb.cid,
        |    round(list_sum([qq.v[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM (SELECT * FROM n WHERE vec_id % 100 = 0) qq CROSS JOIN cb CROSS JOIN mm),
        |adc AS (
        |  SELECT p.query_id, codes.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes.nrm)), 6) AS adc_cosine
        |  FROM probes p
        |  JOIN assigned a ON a.cent_id = p.cent_id
        |  JOIN codes ON codes.vec_id = a.vec_id
        |  JOIN dt ON dt.query_id = p.query_id AND dt.m = codes.m AND dt.cid = codes.code
        |  WHERE codes.vec_id != p.query_id
        |  GROUP BY p.query_id, codes.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc) WHERE rr <= 50),
        |ex AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id),
        |approx AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex) WHERE rank <= 10),
        |hits AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1)
        |SELECT t.query_id, coalesce(h.n_hits, 0) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall
        |FROM (SELECT query_id FROM truth GROUP BY 1) t
        |LEFT JOIN hits h ON t.query_id = h.query_id
        |ORDER BY t.query_id""".stripMargin,

    // quantizer-drift advisory: the sim_ann_recall_pq chain run TWICE —
    // once over the base corpus (the shipped baseline) and once over
    // base ∪ the %10 re-arrival delta (the delta-serving leg, quantizers
    // and truth pinned to the base) — then 6dp mean-vs-mean against the
    // literal 0.05 margin
    "sim_index_drift" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |u AS (SELECT vec_id, v, nrm FROM n
        |      UNION ALL
        |      SELECT vec_id + 1000000, v, nrm FROM n WHERE vec_id % 10 = 0),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |bscored AS (
        |  SELECT query_id, n.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q WHERE n.vec_id != query_id),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM bscored) WHERE rank <= 10),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |probes AS (
        |  SELECT query_id, cent_id FROM (
        |    SELECT qq.vec_id AS query_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |        round(list_sum([qq.v[i]*cv[i] for i in range(1,65)]) / (qq.nrm*cn), 6) DESC,
        |        cent_id ASC) AS prn
        |    FROM (SELECT * FROM n WHERE vec_id % 100 = 0) qq CROSS JOIN cents)
        |  WHERE prn <= 2),
        |dt AS (
        |  SELECT qq.vec_id AS query_id, qq.nrm AS qn, mm.m, cb.cid,
        |    round(list_sum([qq.v[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM (SELECT * FROM n WHERE vec_id % 100 = 0) qq CROSS JOIN cb CROSS JOIN mm),
        |assigned_b AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT n.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM n CROSS JOIN cents)
        |  WHERE arn = 1),
        |codes_b AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cid, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM n CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |adc_b AS (
        |  SELECT p.query_id, codes_b.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes_b.nrm)), 6) AS adc_cosine
        |  FROM probes p
        |  JOIN assigned_b a ON a.cent_id = p.cent_id
        |  JOIN codes_b ON codes_b.vec_id = a.vec_id
        |  JOIN dt ON dt.query_id = p.query_id AND dt.m = codes_b.m AND dt.cid = codes_b.code
        |  WHERE codes_b.vec_id != p.query_id
        |  GROUP BY p.query_id, codes_b.vec_id),
        |short_b AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc_b) WHERE rr <= 50),
        |ex_b AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short_b s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id),
        |approx_b AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex_b) WHERE rank <= 10),
        |hits_b AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx_b a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1),
        |mb AS (
        |  SELECT round(avg(round(coalesce(h.n_hits, 0) / 10.0, 6)), 6) AS m
        |  FROM (SELECT query_id FROM truth GROUP BY 1) t
        |  LEFT JOIN hits_b h ON t.query_id = h.query_id),
        |assigned_u AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT u.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY u.vec_id ORDER BY
        |        round(list_sum([u.v[i]*cv[i] for i in range(1,65)]) / (u.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM u CROSS JOIN cents)
        |  WHERE arn = 1),
        |codes_u AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT u.vec_id, mm.m, cb.cid, u.nrm,
        |      row_number() OVER (PARTITION BY u.vec_id, mm.m ORDER BY
        |        round(list_sum([(u.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (u.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM u CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |adc_u AS (
        |  SELECT p.query_id, codes_u.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes_u.nrm)), 6) AS adc_cosine
        |  FROM probes p
        |  JOIN assigned_u a ON a.cent_id = p.cent_id
        |  JOIN codes_u ON codes_u.vec_id = a.vec_id
        |  JOIN dt ON dt.query_id = p.query_id AND dt.m = codes_u.m AND dt.cid = codes_u.code
        |  WHERE codes_u.vec_id != p.query_id
        |  GROUP BY p.query_id, codes_u.vec_id),
        |short_u AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc_u) WHERE rr <= 50),
        |ex_u AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short_u s JOIN n qn ON qn.vec_id = s.query_id JOIN u nn ON nn.vec_id = s.neighbor_id),
        |approx_u AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex_u) WHERE rank <= 10),
        |hits_u AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx_u a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1),
        |mu AS (
        |  SELECT round(avg(round(coalesce(h.n_hits, 0) / 10.0, 6)), 6) AS m
        |  FROM (SELECT query_id FROM truth GROUP BY 1) t
        |  LEFT JOIN hits_u h ON t.query_id = h.query_id)
        |SELECT t.query_id, coalesce(h.n_hits, 0) AS n_hits,
        |  round(coalesce(h.n_hits, 0) / 10.0, 6) AS recall,
        |  (SELECT m FROM mu) < (SELECT m FROM mb) - 0.05 AS retrain_advised
        |FROM (SELECT query_id FROM truth GROUP BY 1) t
        |LEFT JOIN hits_u h ON t.query_id = h.query_id
        |ORDER BY t.query_id""".stripMargin,

    // PQ codebook TRAINING end-to-end: two unrolled Lloyd rounds (encode =
    // the sim_topk_pq argmin CTE keyed by cidx; refine = per
    // (entry, subspace, dim) 6dp mean with keep-previous fallback), then
    // the seeded and refined serving chains side by side against the brute
    // truth — Similarity.annRecallPqRefined with earlyStop = false
    "sim_ann_recall_pq_refined" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
        |bscored AS (
        |  SELECT query_id, n.vec_id AS neighbor_id,
        |    round(list_sum([qv[i]*v[i] for i in range(1,65)]) / (qn*nrm), 6) AS cosine
        |  FROM n CROSS JOIN q WHERE n.vec_id != query_id),
        |truth AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM bscored) WHERE rank <= 10),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |dd AS (SELECT unnest(range(0, 64)) AS dim0),
        |cb0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS cidx, v AS cv
        |  FROM n WHERE vec_id % 8 = 0),
        |codes0 AS (
        |  SELECT vec_id, m, cidx, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cidx, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cidx ASC) AS rn
        |    FROM n CROSS JOIN cb0 cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |means1 AS (
        |  SELECT c.cidx, dd.dim0, round(avg(n.v[dd.dim0 + 1]), 6) AS mv
        |  FROM codes0 c JOIN n ON n.vec_id = c.vec_id JOIN dd ON dd.dim0 // 8 = c.m
        |  GROUP BY c.cidx, dd.dim0),
        |cb1 AS (
        |  SELECT cb0.cidx, list(coalesce(m.mv, cb0.cv[dd.dim0 + 1]) ORDER BY dd.dim0) AS cv
        |  FROM cb0 CROSS JOIN dd
        |  LEFT JOIN means1 m ON m.cidx = cb0.cidx AND m.dim0 = dd.dim0
        |  GROUP BY cb0.cidx),
        |codes1 AS (
        |  SELECT vec_id, m, cidx FROM (
        |    SELECT n.vec_id, mm.m, cb.cidx,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cidx ASC) AS rn
        |    FROM n CROSS JOIN cb1 cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |means2 AS (
        |  SELECT c.cidx, dd.dim0, round(avg(n.v[dd.dim0 + 1]), 6) AS mv
        |  FROM codes1 c JOIN n ON n.vec_id = c.vec_id JOIN dd ON dd.dim0 // 8 = c.m
        |  GROUP BY c.cidx, dd.dim0),
        |cb2 AS (
        |  SELECT cb1.cidx, list(coalesce(m.mv, cb1.cv[dd.dim0 + 1]) ORDER BY dd.dim0) AS cv
        |  FROM cb1 CROSS JOIN dd
        |  LEFT JOIN means2 m ON m.cidx = cb1.cidx AND m.dim0 = dd.dim0
        |  GROUP BY cb1.cidx),
        |codes2 AS (
        |  SELECT vec_id, m, cidx, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cidx, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cidx ASC) AS rn
        |    FROM n CROSS JOIN cb2 cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |dt0 AS (
        |  SELECT q.query_id, q.qn, mm.m, cb.cidx,
        |    round(list_sum([q.qv[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM q CROSS JOIN cb0 cb CROSS JOIN mm),
        |dt2 AS (
        |  SELECT q.query_id, q.qn, mm.m, cb.cidx,
        |    round(list_sum([q.qv[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM q CROSS JOIN cb2 cb CROSS JOIN mm),
        |adc0 AS (
        |  SELECT dt.query_id, c.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(c.nrm)), 6) AS adc_cosine
        |  FROM codes0 c JOIN dt0 dt ON dt.m = c.m AND dt.cidx = c.cidx
        |  WHERE c.vec_id != dt.query_id
        |  GROUP BY dt.query_id, c.vec_id),
        |adc2 AS (
        |  SELECT dt.query_id, c.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(c.nrm)), 6) AS adc_cosine
        |  FROM codes2 c JOIN dt2 dt ON dt.m = c.m AND dt.cidx = c.cidx
        |  WHERE c.vec_id != dt.query_id
        |  GROUP BY dt.query_id, c.vec_id),
        |short0 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc0) WHERE rr <= 50),
        |short2 AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc2) WHERE rr <= 50),
        |ex0 AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short0 s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id),
        |ex2 AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short2 s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id),
        |approx0 AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex0) WHERE rank <= 10),
        |approx2 AS (SELECT query_id, neighbor_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex2) WHERE rank <= 10),
        |hits0 AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx0 a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1),
        |hits2 AS (
        |  SELECT t.query_id, count(*) AS n_hits FROM truth t
        |  JOIN approx2 a ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
        |  GROUP BY 1)
        |SELECT t.query_id,
        |  coalesce(h0.n_hits, 0) AS hits_seeded,
        |  round(coalesce(h0.n_hits, 0) / 10.0, 6) AS recall_seeded,
        |  coalesce(h2.n_hits, 0) AS hits_refined,
        |  round(coalesce(h2.n_hits, 0) / 10.0, 6) AS recall_refined
        |FROM (SELECT query_id FROM truth GROUP BY 1) t
        |LEFT JOIN hits0 h0 ON t.query_id = h0.query_id
        |LEFT JOIN hits2 h2 ON t.query_id = h2.query_id
        |ORDER BY t.query_id""".stripMargin,

    // content-defined chunking: chunk END positions are every i in [8, n-1]
    // whose trailing-8-byte-window GEAR sum's mid bits ≡ 0 mod 64, plus n;
    // chunk j runs (prev end, end]. The gear table is interpolated from the
    // SAME derivation the native kernel uses (GearKernels.gearSqlList), and
    // the sum fits int64 exactly — the oracle computes the window hash
    // closed-form where the kernel rolls it in O(1)/byte
    "media_cdc_dedup" ->
      s"""WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |gear AS (SELECT $GearSqlTable AS g),
        |bounds AS (
        |  SELECT doc_id, text, n,
        |    list_append(
        |      [i for i in range(8, n)
        |       if ((list_sum([g[ord(substr(text, i - t, 1)) + 1] * (1 << t) for t in range(0, 8)]) // 1048576) % 64) = 0],
        |      n) AS ends
        |  FROM b CROSS JOIN gear),
        |chunks AS (
        |  SELECT doc_id, CAST(u.j AS INTEGER) AS chunk_idx,
        |    CAST(u.e - u.s AS BIGINT) AS chunk_bytes,
        |    CAST(concat('0x', substr(md5(hex(encode(substr(text, u.s + 1, u.e - u.s)))),1,15)) AS BIGINT) AS ch
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest([{'j': j,
        |               's': CASE WHEN j = 0 THEN 0 ELSE ends[j] END,
        |               'e': ends[j+1]}
        |              for j in range(0, len(ends))]) AS u
        |    FROM bounds)),
        |own AS (SELECT ch, min(doc_id*16777216 + chunk_idx) AS own_key FROM chunks GROUP BY ch)
        |SELECT chunks.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN chunks.doc_id*16777216 + chunks.chunk_idx <> own.own_key THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  CAST(sum(chunk_bytes) AS BIGINT) AS payload_bytes,
        |  CAST(sum(CASE WHEN chunks.doc_id*16777216 + chunks.chunk_idx <> own.own_key THEN chunk_bytes ELSE 0 END) AS BIGINT) AS bytes_saved
        |FROM chunks JOIN own ON chunks.ch = own.ch
        |GROUP BY chunks.doc_id ORDER BY chunks.doc_id""".stripMargin,

    // perceptual near-dup over the CDC chunk fingerprint: the media_near_dup
    // sig/banding CTEs fed by the media_cdc_dedup chunk CTEs
    "media_near_dup_cdc" ->
      s"""WITH b AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
        |gear AS (SELECT $GearSqlTable AS g),
        |bounds AS (
        |  SELECT doc_id, text, n,
        |    list_append(
        |      [i for i in range(8, n)
        |       if ((list_sum([g[ord(substr(text, i - t, 1)) + 1] * (1 << t) for t in range(0, 8)]) // 1048576) % 32) = 0],
        |      n) AS ends
        |  FROM b CROSS JOIN gear),
        |chunks AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(hex(encode(substr(text, u.s + 1, u.e - u.s)))),1,15)) AS BIGINT) % 281474976710656 AS h
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest([{'s': CASE WHEN j = 0 THEN 0 ELSE ends[j] END,
        |               'e': ends[j+1]}
        |              for j in range(0, len(ends))]) AS u
        |    FROM bounds)),
        |hs AS (SELECT doc_id, list(h) AS hs FROM chunks GROUP BY doc_id),
        |sig AS (
        |  SELECT doc_id, CAST(list_sum(
        |    [ CASE WHEN list_sum([ CASE WHEN CAST(floor(h / 2^j) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END for h in hs ]) > 0
        |      THEN CAST(2^j AS BIGINT) ELSE 0 END for j in range(0,48) ]) AS BIGINT) AS sim
        |  FROM hs
        |)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |  CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) AS hamming
        |FROM sig x JOIN sig y ON x.doc_id < y.doc_id
        |WHERE CAST(bit_count(xor(x.sim, y.sim)) AS INTEGER) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_multimodal_frames" ->
      """WITH m AS (
        |  SELECT doc_id, text,
        |    CAST(ceil(CAST(octet_length(encode(text)) AS DOUBLE) / 64) AS INTEGER) AS n_frames
        |  FROM documents
        |),
        |f AS (
        |  SELECT doc_id, text, CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx FROM m
        |)
        |SELECT doc_id, frame_idx,
        |  CAST(octet_length(encode(substr(text, frame_idx*64 + 1, 64))) AS INTEGER) AS frame_bytes,
        |  CAST(concat('0x', substr(md5(hex(encode(substr(text, frame_idx*64 + 1, 64)))),1,15)) AS BIGINT) AS frame_hash
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "q_sample_systematic" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE CAST(concat('0x', substr(md5(concat(l_orderkey, '#', l_linenumber)),1,15)) AS BIGINT) % 100 < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, rn, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) ASC,
        |               doc_id ASC) AS INTEGER) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,

    "q_edit_distance" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, substr(lower(p_name), 1, 12) AS pfx,
        |         substr(lower(p_name), 1, 1) AS blk
        |  FROM part
        |)
        |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS INTEGER) AS edit_dist
        |FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.blk = b.blk
        |  AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.pfx, b.pfx) <= 8
        |ORDER BY key_a, key_b""".stripMargin,

    "q_props_json" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // identical semantics to the direct GROUP BY — the salt is purely a
    // physical (shuffle-shape) transformation
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // capstone composition: quality floor ∧ confident langid ∧ cluster
    // survivors → per-lang content-hash stratified sample. Every CTE block
    // is the already-verified fragment from its standalone oracle.
    "pipeline_curate" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |qual AS (
        |  SELECT doc_id,
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM t
        |),
        |g AS (
        |  SELECT doc_id, lang, list_distinct([substr(lower(text), i, 3) for i in range(1, len(text)-1)]) AS grams
        |  FROM documents WHERE len(text) >= 3
        |),
        |prof AS (
        |  SELECT lang AS profile_lang, gram FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, gram ASC) AS rn
        |    FROM (SELECT lang, unnest(grams) AS gram FROM g)
        |    GROUP BY lang, gram)
        |  WHERE rn <= 20
        |),
        |sc AS (
        |  SELECT doc_id, lang, profile_lang, count(*) AS score
        |  FROM (SELECT doc_id, lang, unnest(grams) AS gram FROM g) d
        |  JOIN prof USING (gram)
        |  GROUP BY doc_id, lang, profile_lang
        |),
        |pred AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, (profile_lang = lang) AS correct,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang ASC) AS rn
        |    FROM sc)
        |  WHERE rn = 1 AND correct
        |),
        |sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |dups AS (
        |  SELECT src AS doc_id FROM reach GROUP BY src
        |  HAVING least(src, min(dst)) <> src
        |),
        |kept AS (
        |  SELECT d.doc_id, d.lang, q.quality
        |  FROM documents d
        |  JOIN qual q USING (doc_id)
        |  JOIN pred p USING (doc_id)
        |  WHERE q.quality >= CAST(0.45 AS DOUBLE)
        |    AND d.doc_id NOT IN (SELECT doc_id FROM dups)
        |)
        |SELECT lang, rn, doc_id, quality FROM (
        |  SELECT lang, doc_id, quality,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) ASC,
        |               doc_id ASC) AS rn
        |  FROM kept)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,

    // the curate selection expanded to model-context chunks: corpus ->
    // curated docs -> training sequences (same CTE prelude as pipeline_curate;
    // the oracle gate keeps the two copies from drifting)
    "pipeline_prepare" ->
      """WITH RECURSIVE
        |t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |qual AS (
        |  SELECT doc_id,
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM t
        |),
        |g AS (
        |  SELECT doc_id, lang, list_distinct([substr(lower(text), i, 3) for i in range(1, len(text)-1)]) AS grams
        |  FROM documents WHERE len(text) >= 3
        |),
        |prof AS (
        |  SELECT lang AS profile_lang, gram FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, gram ASC) AS rn
        |    FROM (SELECT lang, unnest(grams) AS gram FROM g)
        |    GROUP BY lang, gram)
        |  WHERE rn <= 20
        |),
        |sc AS (
        |  SELECT doc_id, lang, profile_lang, count(*) AS score
        |  FROM (SELECT doc_id, lang, unnest(grams) AS gram FROM g) d
        |  JOIN prof USING (gram)
        |  GROUP BY doc_id, lang, profile_lang
        |),
        |pred AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, (profile_lang = lang) AS correct,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, profile_lang ASC) AS rn
        |    FROM sc)
        |  WHERE rn = 1 AND correct
        |),
        |sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |dups AS (
        |  SELECT src AS doc_id FROM reach GROUP BY src
        |  HAVING least(src, min(dst)) <> src
        |),
        |kept AS (
        |  SELECT d.doc_id, d.lang, q.quality
        |  FROM documents d
        |  JOIN qual q USING (doc_id)
        |  JOIN pred p USING (doc_id)
        |  WHERE q.quality >= CAST(0.45 AS DOUBLE)
        |    AND d.doc_id NOT IN (SELECT doc_id FROM dups)
        |),
        |sel AS (
        |  SELECT lang, doc_id FROM (
        |    SELECT lang, doc_id,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) ASC,
        |                 doc_id ASC) AS rn
        |    FROM kept)
        |  WHERE rn <= 10
        |),
        |tc AS (
        |  SELECT d.doc_id, string_split(d.text, ' ') AS s,
        |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n
        |  FROM documents d JOIN sel USING (doc_id)
        |  WHERE len(string_split(d.text, ' ')) >= 1
        |),
        |ch AS (
        |  SELECT doc_id, s, n, CAST(cid AS INTEGER) AS chunk_id,
        |         CAST(cid * 48 AS BIGINT) AS chunk_start
        |  FROM tc, LATERAL (SELECT unnest(range(0, ((n - 1) // 48) + 1)) AS cid)
        |)
        |SELECT sel.lang, ch.doc_id, ch.chunk_id, ch.chunk_start,
        |  CAST(least(64, n - chunk_start) AS BIGINT) AS n_chunk_tokens,
        |  s[chunk_start + 1] AS first_token,
        |  s[chunk_start + least(64, n - chunk_start)] AS last_token
        |FROM ch JOIN sel USING (doc_id)
        |ORDER BY sel.lang, ch.doc_id, ch.chunk_id""".stripMargin,

    // the distributed prefix-sum packing equals the single-window cumsum
    "text_packing" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) AS h
        |  FROM documents
        |),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (ORDER BY h ASC, doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM t
        |)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(start / 2048) AS BIGINT) AS bin_id,
        |  CAST(start % 2048 AS BIGINT) AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // the salted replication join is result-identical to the plain join
    "q_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // HLL estimates are engine-specific, so the oracled surface is the exact
    // distinct counts plus literal-TRUE bounded-error flags: Spark emits
    // |approx − exact| ≤ 0.15·exact per sketch, and a drifting estimate
    // breaks the hash compare (SketchSpec pins the tighter rsd locally).
    "q_sketch_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  count(*) AS n_items,
        |  TRUE AS parts_within_rsd,
        |  TRUE AS orders_within_rsd
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // fixed 64-token windows advancing by 48; ⌊(n−1)/48⌋+1 chunks per doc
    "text_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS s,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents WHERE len(string_split(text, ' ')) >= 1
        |),
        |c AS (
        |  SELECT doc_id, s, n, CAST(cid AS INTEGER) AS chunk_id,
        |         CAST(cid * 48 AS BIGINT) AS chunk_start
        |  FROM t, LATERAL (SELECT unnest(range(0, ((n - 1) // 48) + 1)) AS cid)
        |)
        |SELECT doc_id, chunk_id, chunk_start,
        |  CAST(least(64, n - chunk_start) AS BIGINT) AS n_chunk_tokens,
        |  s[chunk_start + 1] AS first_token,
        |  s[chunk_start + least(64, n - chunk_start)] AS last_token
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "text_topgrams" ->
      """WITH g AS (
        |  SELECT doc_id, unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents)
        |  WHERE len(s) >= 2
        |)
        |SELECT gram, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY gram
        |ORDER BY n_occurrences DESC, gram ASC LIMIT 50""".stripMargin,

    // per-vector affine int8: scale=(max-min)/255, codes round((x-min)/scale);
    // integer checksums pin every code, 6dp rounding pins the affine params
    "sim_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |),
        |p AS (
        |  SELECT vec_id, v, list_min(v) AS vmin,
        |         (list_max(v) - list_min(v)) / 255.0 AS scale
        |  FROM v
        |),
        |q AS (
        |  SELECT vec_id, vmin, scale,
        |    [CASE WHEN scale > 0 THEN CAST(round((x - vmin) / scale, 0) AS BIGINT) ELSE 0 END for x in v] AS q
        |  FROM p
        |)
        |SELECT vec_id, round(scale, 6) AS scale6, round(vmin, 6) AS zero6,
        |  CAST(list_sum([CAST(x AS BIGINT) for x in q]) AS BIGINT) AS qsum,
        |  CAST(list_sum([CAST(x * x AS BIGINT) for x in q]) AS BIGINT) AS qsumsq
        |FROM q ORDER BY vec_id""".stripMargin,

    // like q_sketch_distinct: exact twin columns + literal-TRUE bounded-error
    // flags make the engine-specific quantile sketch hash-checkable
    "q_sketch_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS exact_med_qty,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS exact_p99_price,
        |  TRUE AS med_within_err,
        |  TRUE AS p99_within_err
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // the bottom-k quantile sample sketch ABOVE capacity (every group ≫
    // 4096 rows): exact percentile twin + flags at 5% of the group's
    // value range — the sampled-regime accuracy the views' quantile
    // measures degrade to, pinned outside the views' exact-regime gate
    "q_sketch_qsample" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS exact_med_qty,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS exact_p90_qty,
        |  TRUE AS med_within_err,
        |  TRUE AS p90_within_err
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // correlation is scale-free, so 6dp rounding is partitioning-stable
    "q21_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // content-hash split: same doc -> same split on any engine or rerun
    "q_sample_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // leakage-safe split: the hash split keyed by the near-dup CLUSTER
    // representative (dedup_clusters' recursive transitive closure), so a
    // connected component can never straddle train and test; unclustered
    // docs are singleton clusters keyed by their own id
    "q_split_cluster_safe" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS rep FROM reach GROUP BY src)
        |SELECT doc_id, cluster_rep,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS cluster_rep,
        |        CAST(concat('0x', substr(md5(CAST(COALESCE(l.rep, d.doc_id) AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |      FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the split assignment a release ships: the same rep-keyed hash split
    // computed over the delete-lifecycle LAKE's visible set — clusters
    // come from the visible TEXTS (updates can move a doc in or out of a
    // near-dup cluster; deleted docs vanish from the assignment)
    "corpus_split_safe" ->
      """WITH RECURSIVE v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM v)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS rep FROM reach GROUP BY src)
        |SELECT doc_id, cluster_rep,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT d.doc_id, COALESCE(l.rep, d.doc_id) AS cluster_rep,
        |        CAST(concat('0x', substr(md5(CAST(COALESCE(l.rep, d.doc_id) AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |      FROM v d LEFT JOIN labels l ON d.doc_id = l.doc_id)
        |ORDER BY doc_id""".stripMargin,

    // train-shard delivery: the run-shard manifest of the TRAIN split
    // only (rep-keyed over the lake's visible set) — the composition a
    // training job consumes; DuckDB recomputes clusters, split, and the
    // per-shard totals + XOR checksums from scratch
    "corpus_train_shards" ->
      """WITH RECURSIVE v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM v)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS rep FROM reach GROUP BY src),
        |train AS (
        |  SELECT d.doc_id, d.text
        |  FROM v d LEFT JOIN labels l ON d.doc_id = l.doc_id
        |  WHERE CAST(concat('0x', substr(md5(CAST(COALESCE(l.rep, d.doc_id) AS VARCHAR)),1,15)) AS BIGINT) % 100 < 80),
        |h AS (SELECT
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS INT) AS shard,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),1,15)) AS BIGINT) AS h
        |  FROM train)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
        |  bit_xor(h) AS checksum
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    // the FULL delivery manifest: per-(split, shard) totals + XOR
    // checksums over the lake head — val and test shards verifiable at
    // the consumer too, not just train
    "corpus_split_shards" ->
      """WITH RECURSIVE v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM v)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        |),
        |pairs AS (
        |  SELECT c.id_a, c.id_b
        |  FROM cand c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |),
        |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS rep FROM reach GROUP BY src),
        |assigned AS (
        |  SELECT doc_id, text,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT d.doc_id, d.text,
        |          CAST(concat('0x', substr(md5(CAST(COALESCE(l.rep, d.doc_id) AS VARCHAR)),1,15)) AS BIGINT) % 100 AS b
        |        FROM v d LEFT JOIN labels l ON d.doc_id = l.doc_id)),
        |h AS (SELECT split,
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS INT) AS shard,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),1,15)) AS BIGINT) AS h
        |  FROM assigned)
        |SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
        |  bit_xor(h) AS checksum
        |FROM h GROUP BY split, shard ORDER BY split, shard""".stripMargin,

    // identical PII construction + the same RE2/Java-common regexes, applied
    // in the same fixed order (email, IP, phone); the digest pins every byte
    // of the scrubbed text. DuckDB needs the explicit 'g' flag (Spark's
    // regexp_replace is global by default).
    "text_pii_scrub" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    concat(text, ' reach ', lang, doc_id, '@example.com',
        |           ' or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |           ' from 10.', doc_id % 256, '.0.', n_chars % 256) AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS INTEGER) AS n_ips,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS INTEGER) AS n_clean_chars,
        |  md5(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        |    '\+?[0-9][0-9()\- ]{6,}[0-9]', '<PHONE>', 'g')) AS digest
        |FROM r ORDER BY doc_id""".stripMargin,

    // vocabulary = top-256 tokens (count desc, token asc — a deterministic
    // cut); OOV counts token OCCURRENCES, hence the left join + count(v.tok)
    "text_vocab_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        |),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |    ORDER BY cnt DESC, tok ASC LIMIT 256)
        |),
        |m AS (
        |  SELECT t.doc_id, count(*) AS n_tokens, count(v.tok) AS n_in_vocab
        |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |  GROUP BY t.doc_id
        |)
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(n_tokens - n_in_vocab AS INTEGER) AS n_oov,
        |  CAST(n_tokens - n_in_vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
        |FROM m ORDER BY doc_id""".stripMargin,

    // integer-exact mixture thresholds: both engines cut the hash space at
    // exactly floor(S*w*N / (W*n_s)), so the selected doc set is identical
    "pipeline_mixture" ->
      """WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY source),
        |w AS (SELECT source, n_s,
        |        (CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS wt FROM c),
        |t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_total, CAST(sum(wt) AS BIGINT) AS w_total FROM w),
        |r AS (SELECT source,
        |        least(1000000, (1000000 * wt * n_total) // (w_total * n_s)) AS threshold
        |      FROM w, t)
        |SELECT doc_id, source, lang
        |FROM documents JOIN r USING (source)
        |WHERE CAST(concat('0x', substr(md5(concat('mix|', doc_id)),1,15)) AS BIGINT) % 1000000 < threshold
        |ORDER BY doc_id""".stripMargin,

    // boilerplate-line removal: 10-token "lines" (deterministic stand-in for
    // newline segmentation over the single-line fixture corpus), any line in
    // >= 2 distinct docs is removed everywhere; md5 pins the kept text.
    // Spark keys the frequency table by hash60(line) — output-identical
    // absent 60-bit collisions (the minhash band-key precedent).
    "text_boilerplate" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |lines AS (
        |  SELECT doc_id, unnest([{'pos': i, 'line': array_to_string(s[(i-1)*10+1:i*10], ' ')}
        |                         for i in range(1, CAST(ceil(len(s)/10.0) AS INT)+1)]) AS u
        |  FROM tok),
        |flat AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM lines),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM flat GROUP BY line),
        |boiler AS (SELECT line FROM freq WHERE df >= 2)
        |SELECT f.doc_id,
        |  CAST(count(*) AS INTEGER) AS n_lines,
        |  CAST(sum(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS n_removed,
        |  md5(coalesce(string_agg(CASE WHEN b.line IS NULL THEN f.line END, ' ' ORDER BY f.pos), '')) AS digest
        |FROM flat f LEFT JOIN boiler b ON f.line = b.line
        |GROUP BY f.doc_id ORDER BY doc_id""".stripMargin,

    // per-doc top-3 terms by (tf desc, df asc, tok asc) — integer-exact
    // ranking, no floating-point idf, so the cut is engine-deterministic
    "text_salient_terms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, tok, tf, df FROM (
        |  SELECT t.doc_id, t.tok, t.tf, d.df,
        |    row_number() OVER (PARTITION BY t.doc_id
        |                       ORDER BY t.tf DESC, d.df ASC, t.tok ASC) AS rank
        |  FROM tf t JOIN df d ON t.tok = d.tok)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // sketch-oracle scheme (round 3): exact top-50 token counts are the
    // oracle-checkable twin; the CMS bounded-error flags are literal TRUE —
    // a false flag (estimate < exact, or over-count > eps*N) fails the gate
    "sketch_heavy_hitters" ->
      """SELECT CAST(row_number() OVER (ORDER BY exact_cnt DESC, tok ASC) AS INTEGER) AS rank,
        |  tok, exact_cnt, TRUE AS est_ge_exact, TRUE AS est_within_bound
        |FROM (SELECT tok, count(*) AS exact_cnt
        |      FROM (SELECT unnest(string_split(text,' ')) AS tok FROM documents)
        |      GROUP BY tok ORDER BY exact_cnt DESC, tok ASC LIMIT 50)
        |ORDER BY rank""".stripMargin,

    // incremental dedup: arriving docs (doc_id % 10 = 0) vs the existing
    // corpus through the SAME minhash banding as dedup_minhash_lsh (recall
    // identical by construction), exact-Jaccard verified at 0.8
    "dedup_incremental" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS arriving_id, y.doc_id AS existing_id
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
        |    AND x.doc_id % 10 = 0 AND y.doc_id % 10 != 0
        |)
        |SELECT c.arriving_id, c.existing_id,
        |  len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |  len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
        |FROM cand c JOIN sh a ON c.arriving_id = a.doc_id JOIN sh b ON c.existing_id = b.doc_id
        |WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |ORDER BY arriving_id, existing_id""".stripMargin,

    // corpus admission: the full ingest gate — dup leg is the
    // dedup_incremental chain with earlier-id arrivals added to the index
    // side (batch deduped as a set, first occurrence wins); contamination
    // is dedup_contamination's per-(doc,bench) >= 8 shared 8-grams with the
    // bench carved at offset 7 (never an arrival); quality is text_quality's
    // linear score; precedence duplicate > contaminated > low_quality.
    "corpus_admission" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS arriving_id, y.doc_id AS existing_id
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
        |    AND x.doc_id % 10 = 0 AND (y.doc_id % 10 != 0 OR y.doc_id < x.doc_id)
        |),
        |dup AS (
        |  SELECT arriving_id AS doc_id, CAST(count(*) AS BIGINT) AS n_dup_matches,
        |         min(existing_id) AS first_dup
        |  FROM cand c JOIN sh a ON c.arriving_id = a.doc_id JOIN sh b ON c.existing_id = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |  GROUP BY 1
        |),
        |g8 AS (
        |  SELECT doc_id,
        |    list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]),1,15)) AS BIGINT) for i in range(1, len(s)-6)]) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 8
        |),
        |bench AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM g8
        |          WHERE doc_id % 50 = 7 AND doc_id % 10 != 0),
        |arr AS (SELECT doc_id, unnest(grams) AS gram FROM g8 WHERE doc_id % 10 = 0),
        |cont AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits FROM (
        |    SELECT a.doc_id, b.bench_id FROM arr a JOIN bench b USING (gram)
        |    GROUP BY a.doc_id, b.bench_id HAVING count(*) >= 8)
        |  GROUP BY 1
        |),
        |q AS (
        |  SELECT doc_id,
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
        |  WHERE doc_id % 10 = 0
        |)
        |SELECT q.doc_id, CASE WHEN d.n_dup_matches IS NOT NULL THEN 'duplicate'
        |       WHEN c.n_bench_hits IS NOT NULL THEN 'contaminated'
        |       WHEN q.quality < 0.45 THEN 'low_quality'
        |       ELSE 'admitted' END AS decision,
        |  coalesce(d.n_dup_matches, 0) AS n_dup_matches, d.first_dup,
        |  coalesce(c.n_bench_hits, 0) AS n_bench_hits, q.quality
        |FROM q LEFT JOIN dup d ON q.doc_id = d.doc_id
        |       LEFT JOIN cont c ON q.doc_id = c.doc_id
        |ORDER BY q.doc_id""".stripMargin,

    // declarative expectations ahead of the content gate (the
    // CHECK-constraint convention): min_tokens (>= 30 whitespace tokens)
    // then max_chars (<= 450 chars) outrank every content verdict, first
    // declared wins; everything downstream is the corpus_admission chain
    // unchanged (an invalid earlier arrival still counts as dup evidence
    // for a later copy, exactly as a low-quality one always has)
    "corpus_expectations" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS arriving_id, y.doc_id AS existing_id
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
        |    AND x.doc_id % 10 = 0 AND (y.doc_id % 10 != 0 OR y.doc_id < x.doc_id)
        |),
        |dup AS (
        |  SELECT arriving_id AS doc_id, CAST(count(*) AS BIGINT) AS n_dup_matches,
        |         min(existing_id) AS first_dup
        |  FROM cand c JOIN sh a ON c.arriving_id = a.doc_id JOIN sh b ON c.existing_id = b.doc_id
        |  WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |        len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |  GROUP BY 1
        |),
        |g8 AS (
        |  SELECT doc_id,
        |    list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]),1,15)) AS BIGINT) for i in range(1, len(s)-6)]) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 8
        |),
        |bench AS (SELECT doc_id AS bench_id, unnest(grams) AS gram FROM g8
        |          WHERE doc_id % 50 = 7 AND doc_id % 10 != 0),
        |arr AS (SELECT doc_id, unnest(grams) AS gram FROM g8 WHERE doc_id % 10 = 0),
        |cont AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bench_hits FROM (
        |    SELECT a.doc_id, b.bench_id FROM arr a JOIN bench b USING (gram)
        |    GROUP BY a.doc_id, b.bench_id HAVING count(*) >= 8)
        |  GROUP BY 1
        |),
        |q AS (
        |  SELECT doc_id,
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality,
        |    len(toks) AS n_toks, length(text) AS n_chars
        |  FROM (SELECT doc_id, text, string_split(text,' ') AS toks FROM documents)
        |  WHERE doc_id % 10 = 0
        |)
        |SELECT q.doc_id, CASE WHEN q.n_toks < 30 THEN 'invalid:min_tokens'
        |       WHEN q.n_chars > 450 THEN 'invalid:max_chars'
        |       WHEN d.n_dup_matches IS NOT NULL THEN 'duplicate'
        |       WHEN c.n_bench_hits IS NOT NULL THEN 'contaminated'
        |       WHEN q.quality < 0.45 THEN 'low_quality'
        |       ELSE 'admitted' END AS decision,
        |  coalesce(d.n_dup_matches, 0) AS n_dup_matches, d.first_dup,
        |  coalesce(c.n_bench_hits, 0) AS n_bench_hits, q.quality
        |FROM q LEFT JOIN dup d ON q.doc_id = d.doc_id
        |       LEFT JOIN cont c ON q.doc_id = c.doc_id
        |ORDER BY q.doc_id""".stripMargin,

    // corpus snapshot diff (the lake's CDC-read operator): two
    // deterministic snapshots carved from documents, full-outer diffed.
    // The engine compares 64-bit content hashes (bodies never shuffle);
    // DuckDB compares full text — agreement IS the collision check.
    "corpus_changes" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 != 5),
        |n AS (SELECT doc_id,
        |        CASE WHEN doc_id % 17 = 3 THEN text || ' v2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 13 != 7)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'insert'
        |       WHEN n.doc_id IS NULL THEN 'delete'
        |       ELSE 'update' END AS change_type,
        |  CAST(length(o.text) AS BIGINT) AS old_len,
        |  CAST(length(n.text) AS BIGINT) AS new_len
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text != n.text
        |ORDER BY doc_id""".stripMargin,

    // materialized-profile maintenance algebra: the engine computes v2's
    // quality-band profile INCREMENTALLY (v1's profile + signed diff
    // contributions: +new for inserts/updates, -old for updates/deletes);
    // DuckDB recomputes v2's profile directly — hash equality pins the
    // retraction algebra the lake's versionDelta maintenance runs
    "corpus_profile" ->
      """WITH n AS (SELECT doc_id,
        |        CASE WHEN doc_id % 17 = 3 THEN text || ' v2' ELSE text END AS text
        |      FROM documents WHERE doc_id % 13 != 7),
        |q AS (
        |  SELECT doc_id, text,
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality,
        |    len(toks) AS n_toks
        |  FROM (SELECT doc_id, text, string_split(text,' ') AS toks FROM n)
        |)
        |SELECT CAST(floor(round(quality, 6) * 10) AS INT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM q GROUP BY 1 ORDER BY band""".stripMargin,

    // quality-distribution drift alarm between the same two snapshot
    // versions: per-band doc-share shift in ppm (integer — hash-exact),
    // v2's profile through the engine's incremental signed algebra while
    // DuckDB recomputes both profiles directly; flag past 2% of corpus
    // mass moving in or out of a band
    "corpus_profile_drift" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 != 5),
        |v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 3 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 != 7),
        |q1 AS (SELECT
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM (SELECT string_split(text,' ') AS toks FROM v1)),
        |q2 AS (SELECT
        |    0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |    0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |    0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM (SELECT string_split(text,' ') AS toks FROM v2)),
        |p1 AS (SELECT CAST(floor(round(quality, 6) * 10) AS INT) AS band,
        |    CAST(count(*) AS BIGINT) AS n_docs_v1 FROM q1 GROUP BY 1),
        |p2 AS (SELECT CAST(floor(round(quality, 6) * 10) AS INT) AS band,
        |    CAST(count(*) AS BIGINT) AS n_docs_v2 FROM q2 GROUP BY 1),
        |j AS (SELECT coalesce(p1.band, p2.band) AS band,
        |    coalesce(n_docs_v1, CAST(0 AS BIGINT)) AS n_docs_v1,
        |    coalesce(n_docs_v2, CAST(0 AS BIGINT)) AS n_docs_v2
        |  FROM p1 FULL OUTER JOIN p2 ON p1.band = p2.band)
        |SELECT band, n_docs_v1, n_docs_v2,
        |  CAST(round(n_docs_v2 * 1000000.0 / (SELECT sum(n_docs_v2) FROM j)
        |     - n_docs_v1 * 1000000.0 / (SELECT sum(n_docs_v1) FROM j)) AS BIGINT) AS shift_ppm,
        |  abs(CAST(round(n_docs_v2 * 1000000.0 / (SELECT sum(n_docs_v2) FROM j)
        |     - n_docs_v1 * 1000000.0 / (SELECT sum(n_docs_v1) FROM j)) AS BIGINT)) > 20000 AS shifted
        |FROM j ORDER BY band""".stripMargin,

    // lake OPTIMIZE: the engine builds a three-epoch lake (full bootstrap,
    // an LWW update of every doc_id ≡ 3 mod 7, a replayed copy of that
    // epoch, and an UNCOMMITTED epoch of doc_id ≡ 5 mod 11), physically
    // rewrites the small per-epoch files into size-targeted ones, then
    // serves the head snapshot; DuckDB computes the head directly — hash
    // equality pins that the rewrite preserved LWW content exactly, the
    // replay collapsed, and the manifest-less epoch stayed invisible
    "corpus_optimize" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 3 THEN text || ' u1' ELSE text END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // lake retraction, snapshot leg: the engine builds a lake (epoch 0 =
    // LWW update of every doc_id ≡ 1 mod 10), commits a REAL deleteDocs
    // of every doc_id ≡ 2 mod 9, re-admits the ≡ 2 mod 27 subset, then
    // serves the head; DuckDB recomputes the visible set directly — hash
    // equality pins tombstone hiding, base-row shadowing, and
    // re-admission-past-tombstone LWW
    "corpus_delete" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |       WHEN doc_id % 10 = 1 THEN text || ' u1'
        |       ELSE text END AS text
        |FROM documents
        |WHERE doc_id % 9 != 2 OR doc_id % 27 = 2
        |ORDER BY doc_id""".stripMargin,

    // lake retraction, change-feed leg: the CDC window (0, head] over the
    // same delete-lifecycle lake — deletes ride as change_type='delete'
    // with null text at the tombstone version, the re-admitted subset as
    // updates; this is exactly what every lake-fed index refresher
    // consumes to retract
    "corpus_delete_feed" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 27 = 2 THEN text || ' re' ELSE NULL END AS text,
        |  CAST(CASE WHEN doc_id % 27 = 2 THEN 2 ELSE 1 END AS BIGINT) AS version,
        |  CASE WHEN doc_id % 27 = 2 THEN 'update' ELSE 'delete' END AS change_type
        |FROM documents
        |WHERE doc_id % 9 = 2
        |ORDER BY doc_id""".stripMargin,

    // zone-map data skipping: the engine serves doc_id ∈ [100, 299] of
    // the delete-lifecycle lake head THROUGH the stats-pruned read
    // (collectFileStats zone maps decide which data files to open);
    // DuckDB recomputes the range directly — hash equality pins that
    // file pruning changes nothing across LWW updates, tombstone hiding,
    // and re-admission inside the range
    "corpus_pruned_read" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |       WHEN doc_id % 10 = 1 THEN text || ' u1'
        |       ELSE text END AS text
        |FROM documents
        |WHERE (doc_id % 9 != 2 OR doc_id % 27 = 2)
        |  AND doc_id BETWEEN 100 AND 299
        |ORDER BY doc_id""".stripMargin,

    // zero-copy branch, branch leg: the engine creates a REAL branch at
    // the parent head, the parent then commits " p2" updates (must stay
    // invisible — snapshot isolation), the branch commits " b1" updates
    // and a real deleteDocs takedown; DuckDB recomputes the branch head
    // directly from the documents table
    "corpus_branch" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 5 THEN text || ' b1'
        |       WHEN doc_id % 10 = 1 THEN text || ' u1'
        |       ELSE text END AS text
        |FROM documents
        |WHERE doc_id % 7 != 4
        |ORDER BY doc_id""".stripMargin,

    // zero-copy branch, merge leg: after mergeBranch folds the branch's
    // net effect into ONE parent epoch, the parent head shows merge-wins
    // LWW — branch-touched docs take the branch state (updates AND
    // tombstones beat the parent's concurrent " p2" epoch), untouched
    // docs keep the parent's own history
    "corpus_branch_merge" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 5 THEN text || ' b1'
        |       WHEN doc_id % 8 = 3 THEN text || ' p2'
        |       WHEN doc_id % 10 = 1 THEN text || ' u1'
        |       ELSE text END AS text
        |FROM documents
        |WHERE doc_id % 7 != 4
        |ORDER BY doc_id""".stripMargin,

    // dataset card — the datasheet a corpus release ships: volume totals,
    // language mix, quality-band histogram, as exact long-form integers;
    // DuckDB recomputes every metric directly from the documents table
    "corpus_card" ->
      """WITH q AS (SELECT doc_id, lang,
        |    CAST(floor(round(
        |      0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |      0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |      0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)), 6) * 10) AS INT) AS band,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM (SELECT doc_id, text, lang, string_split(text,' ') AS toks
        |        FROM documents))
        |SELECT metric, value FROM (
        |  SELECT 'docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM q
        |  UNION ALL SELECT 'tokens', CAST(sum(n_toks) AS BIGINT) FROM q
        |  UNION ALL SELECT 'chars', CAST(sum(n_chars) AS BIGINT) FROM q
        |  UNION ALL SELECT 'langs', CAST(count(DISTINCT lang) AS BIGINT) FROM q
        |  UNION ALL SELECT 'lang:' || lang, CAST(count(*) AS BIGINT)
        |    FROM q GROUP BY lang
        |  UNION ALL SELECT 'quality_band:' || CAST(band AS VARCHAR),
        |    CAST(count(*) AS BIGINT) FROM q GROUP BY band
        |) ORDER BY metric""".stripMargin,

    // approx-distinct view measures (HLL sketch: merge on insert-only
    // windows, recompute on retraction): the sketch-oracle convention —
    // EXACT distinct counts recomputed from the visible set + literal-
    // TRUE accuracy flags (the delete epoch shrinks distinct ids ~8%, so
    // a sketch that failed to retract blows the 5% bound)
    "corpus_view_distinct" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT CAST(doc_id AS VARCHAR)) AS BIGINT) AS d_ids_exact,
        |  CAST(count(DISTINCT string_split(text, ' ')[1]) AS BIGINT) AS d_tok1_exact,
        |  TRUE AS d_ids_ok, TRUE AS d_tok1_ok
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // quantile view measures (deterministic bottom-k sample sketch:
    // union-fold on insert-only windows, re-sketch on retraction): every
    // fixture bucket is under the sketch capacity, so served estimates
    // EQUAL exact interpolated percentiles and the oracle compares VALUES
    // at 6dp (the q19_percentile cross-engine convention) — p90_load's
    // +100000 band dies with the delete epoch, so a sketch that failed
    // to retract is ~100000 high, not approximately wrong
    "corpus_view_quantile" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
        |  round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6)
        |    AS p50_chars,
        |  round(quantile_cont(CAST(length(text) +
        |      CASE WHEN doc_id % 9 = 2 THEN 100000 ELSE 0 END AS DOUBLE),
        |    0.9), 6) AS p90_load
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // top-k values per group as a view COMPOSITION: the value is a second
    // dimension, serve ranks group sizes (ties break by token) — no new
    // measure kind, maintenance stays O(changes) at any value cardinality
    "corpus_view_topk" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |g AS (SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |        string_split(text, ' ')[1] AS tok1,
        |        CAST(count(*) AS BIGINT) AS n_docs
        |      FROM v GROUP BY 1, 2)
        |SELECT bucket, tok1, n_docs, rk FROM (
        |  SELECT bucket, tok1, n_docs,
        |    CAST(row_number() OVER (PARTITION BY bucket
        |      ORDER BY n_docs DESC, tok1 ASC) AS INTEGER) AS rk
        |  FROM g)
        |WHERE rk <= 3 ORDER BY bucket, rk""".stripMargin,

    // schema evolution of a LIVE view: a sums-only view consumes the
    // update epoch, addMeasures grafts a max + avg (fold → cursor
    // backfill → spec swap), the delete + re-admission epochs then
    // maintain the evolved measures (the delete drives the recompute leg
    // for a measure that did not exist at create); DuckDB recomputes
    // from the final visible set — an evolved view must be
    // indistinguishable from one declared up front
    "corpus_view_evolve" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
        |  CAST(max(CAST(length(text) AS BIGINT)) AS BIGINT) AS max_chars,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_chars
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the datasheet of a LAKE HEAD rather than the raw fixture: the same
    // card metrics computed over the delete-lifecycle lake's visible set
    // (LWW updates, takedowns, re-admissions folded), language joined
    // from the base table by id — pins the release path against the
    // store it really describes
    "corpus_card_lake" ->
      """WITH v AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |q AS (SELECT doc_id, lang,
        |    CAST(floor(round(
        |      0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |      0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |      0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)), 6) * 10) AS INT) AS band,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM (SELECT doc_id, text, lang, string_split(text,' ') AS toks
        |        FROM v))
        |SELECT metric, value FROM (
        |  SELECT 'docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM q
        |  UNION ALL SELECT 'tokens', CAST(sum(n_toks) AS BIGINT) FROM q
        |  UNION ALL SELECT 'chars', CAST(sum(n_chars) AS BIGINT) FROM q
        |  UNION ALL SELECT 'langs', CAST(count(DISTINCT lang) AS BIGINT) FROM q
        |  UNION ALL SELECT 'lang:' || lang, CAST(count(*) AS BIGINT)
        |    FROM q GROUP BY lang
        |  UNION ALL SELECT 'quality_band:' || CAST(band AS VARCHAR),
        |    CAST(count(*) AS BIGINT) FROM q GROUP BY band
        |) ORDER BY metric""".stripMargin,

    // the LIVE dataset card: the full datasheet (volume totals, language
    // mix, quality-band histogram) served from a declared incremental
    // view — language is an ENRICHMENT dim (immutable base metadata
    // joined by doc_id), band the quality formula as one SQL dim
    // expression; O(changes) maintenance, long form folded at serve.
    // DuckDB recomputes every metric from the final visible set — the
    // live card must be indistinguishable from the batch recompute
    // (corpus_card_lake's oracle, verbatim: same store, same datasheet)
    "corpus_card_live" ->
      """WITH v AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |q AS (SELECT doc_id, lang,
        |    CAST(floor(round(
        |      0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |      0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |      0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)), 6) * 10) AS INT) AS band,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM (SELECT doc_id, text, lang, string_split(text,' ') AS toks
        |        FROM v))
        |SELECT metric, value FROM (
        |  SELECT 'docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM q
        |  UNION ALL SELECT 'tokens', CAST(sum(n_toks) AS BIGINT) FROM q
        |  UNION ALL SELECT 'chars', CAST(sum(n_chars) AS BIGINT) FROM q
        |  UNION ALL SELECT 'langs', CAST(count(DISTINCT lang) AS BIGINT) FROM q
        |  UNION ALL SELECT 'lang:' || lang, CAST(count(*) AS BIGINT)
        |    FROM q GROUP BY lang
        |  UNION ALL SELECT 'quality_band:' || CAST(band AS VARCHAR),
        |    CAST(count(*) AS BIGINT) FROM q GROUP BY band
        |) ORDER BY metric""".stripMargin,

    // time-travel datasheet: the SAME live-card view served AS OF lake
    // version 0 (the update epoch, before the takedowns — also the
    // card-live lifecycle's fold watermark, so the watermark version
    // itself must keep serving after compaction); DuckDB recomputes the
    // card from the v0 visible set
    "corpus_card_travel" ->
      """WITH v AS (SELECT doc_id, lang,
        |    CASE WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |    CAST(floor(round(
        |      0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |      0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |      0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)), 6) * 10) AS INT) AS band,
        |    CAST(len(toks) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM (SELECT doc_id, text, lang, string_split(text,' ') AS toks
        |        FROM v))
        |SELECT metric, value FROM (
        |  SELECT 'docs' AS metric, CAST(count(*) AS BIGINT) AS value FROM q
        |  UNION ALL SELECT 'tokens', CAST(sum(n_toks) AS BIGINT) FROM q
        |  UNION ALL SELECT 'chars', CAST(sum(n_chars) AS BIGINT) FROM q
        |  UNION ALL SELECT 'langs', CAST(count(DISTINCT lang) AS BIGINT) FROM q
        |  UNION ALL SELECT 'lang:' || lang, CAST(count(*) AS BIGINT)
        |    FROM q GROUP BY lang
        |  UNION ALL SELECT 'quality_band:' || CAST(band AS VARCHAR),
        |    CAST(count(*) AS BIGINT) FROM q GROUP BY band
        |) ORDER BY metric""".stripMargin,

    // continuous lake replication: a follower lake consumes the primary's
    // CDC feed (O(changes) per window, cursor-last crash ordering) and
    // converges to its visible corpus — upserts as LWW rows, takedowns
    // as tombstones; DuckDB recomputes the primary's visible set and the
    // FOLLOWER must hash-match it
    "corpus_replica" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |       WHEN doc_id % 10 = 1 THEN text || ' u1'
        |       ELSE text END AS text
        |FROM documents
        |WHERE doc_id % 9 != 2 OR doc_id % 27 = 2
        |ORDER BY doc_id""".stripMargin,

    // declarative incremental materialized view: the engine declares a
    // grouped aggregate (bucket = doc_id mod 7; summed chars + tokens)
    // over the delete-lifecycle lake and maintains it INCREMENTALLY via
    // signed retractions across the LWW-update, deleteDocs, and
    // re-admission epochs — with a compaction fold mid-stream; DuckDB
    // recomputes the aggregate directly from the final visible set
    "corpus_view" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
        |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS toks
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // the NON-ADDITIVE view: min/max measures maintained incrementally —
    // monotone folds on insert-only windows, per-group re-aggregates for
    // retraction-touched groups (the delete epoch vacates extremes the
    // signed algebra cannot retract) — plus an AVG measure riding the
    // signed algebra as an internal (sum, count) pair, with a mid-stream
    // compaction fold; DuckDB recomputes min/max/avg directly from the
    // final visible set (avg as CAST(sum AS DOUBLE)/CAST(count AS DOUBLE),
    // the exact arithmetic the serve projection runs)
    "corpus_view_minmax" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
        |  CAST(min(CAST(length(text) AS BIGINT)) AS BIGINT) AS min_chars,
        |  CAST(max(CAST(length(text) AS BIGINT)) AS BIGINT) AS max_chars,
        |  CAST(max(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS max_toks,
        |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS avg_toks
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // shared-scan multi-view maintenance: a sums view (warm cursor) and a
    // min/max view (bootstrap cursor) caught up by ONE refreshViews call
    // fanning both windows out of a single materialized history scan —
    // DuckDB recomputes both aggregates from the final visible set, so a
    // fanned-out window that diverged from a solo refresh hash-mismatches
    "corpus_views_shared" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2)
        |SELECT CAST(doc_id % 7 AS INTEGER) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS chars,
        |  CAST(min(CAST(length(text) AS BIGINT)) AS BIGINT) AS min_chars,
        |  CAST(max(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS max_toks
        |FROM v GROUP BY 1 ORDER BY bucket""".stripMargin,

    // live-card percentiles: p50/p95 doc length per language served from a
    // declared quantile view over the delete-lifecycle lake head; every
    // language group is below the 4096-occurrence sample capacity, so the
    // estimates are EXACT interpolated percentiles and the oracle compares
    // values at 6dp (the q19_percentile convention) — a sketch that failed
    // to re-sketch on the delete epoch serves stale percentiles and fails
    "corpus_card_live_q" ->
      """WITH v AS (SELECT doc_id,
        |    CASE WHEN doc_id % 27 = 2 THEN text || ' re'
        |         WHEN doc_id % 10 = 1 THEN text || ' u1'
        |         ELSE text END AS text,
        |    coalesce(lang, 'und') AS card_lang
        |  FROM documents
        |  WHERE doc_id % 9 != 2 OR doc_id % 27 = 2),
        |g AS (SELECT card_lang,
        |    CAST(count(*) AS DOUBLE) AS docs,
        |    round(quantile_cont(CAST(length(text) AS DOUBLE), 0.5), 6) AS p50,
        |    round(quantile_cont(CAST(length(text) AS DOUBLE), 0.95), 6) AS p95
        |  FROM v GROUP BY 1)
        |SELECT metric, value FROM (
        |  SELECT 'docs:' || card_lang AS metric, round(docs, 6) AS value FROM g
        |  UNION ALL SELECT 'p50_chars:' || card_lang, p50 FROM g
        |  UNION ALL SELECT 'p95_chars:' || card_lang, p95 FROM g)
        |ORDER BY metric""".stripMargin,

    // writer-lease protocol outcomes: acquire/refuse/re-entry/queue-
    // timeout/TTL-takeover/recheck-abort as deterministic (step, action,
    // outcome) rows — the single-writer discipline under the hash gate;
    // the twin is a constant table because the protocol's outcomes are
    // specified, not timing-dependent
    "corpus_lease_refusal" ->
      """SELECT * FROM (VALUES
        |  (1, 'acquire', 'granted'),
        |  (2, 'second_writer', 'refused'),
        |  (3, 'same_owner_reentry', 'granted'),
        |  (4, 'await_live_holder', 'timeout'),
        |  (5, 'after_release', 'granted'),
        |  (6, 'ttl_takeover', 'granted'),
        |  (7, 'recheck_after_takeover', 'aborted')
        |) AS t(step, action, outcome) ORDER BY step""".stripMargin,

    // run-delivery shard manifest: hash-balanced shard assignment
    // (hash60(doc_id) mod 8), per-shard totals, and an order-independent
    // XOR content checksum — the integrity contract a pinned run ships
    // with; DuckDB re-derives assignment, totals, and checksums exactly
    "corpus_run_shards" ->
      """WITH h AS (SELECT
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS INT) AS shard,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),1,15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
        |  bit_xor(h) AS checksum
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    // incremental run delivery: the engine advances v1's shard manifest
    // across the v1→v2 diff (signed counters, XOR checksum flip-in/
    // flip-out — O(changes), no corpus rescan) while DuckDB computes
    // v2's manifest from scratch; hash equality pins that the advanced
    // manifest is value-identical to a full rebuild
    "corpus_run_shards_delta" ->
      """WITH v2 AS (SELECT doc_id,
        |    CASE WHEN doc_id % 17 = 3 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 13 != 7),
        |h AS (SELECT
        |    CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 8 AS INT) AS shard,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_toks,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '|' || text),1,15)) AS BIGINT) AS h
        |  FROM v2)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST(sum(nc) AS BIGINT) AS n_chars,
        |  bit_xor(h) AS checksum
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    // lexical statistics-drift advisory: the engine serves the stride
    // workload under PINNED base df/N/avgdl over base ∪ delta postings
    // (every 10th doc re-arrived under a fresh id) and compares recall@10
    // against the FRESH-statistics rebuild (what a reindex would serve);
    // each leg selects its rarest-8 query terms under its OWN statistics.
    // DuckDB re-derives the full doubled chain; the flag is
    // mean_recall < 1 − 0.05 against the exact-1.0 lexical baseline
    "text_index_drift" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |g AS (SELECT doc_id, s FROM t UNION ALL
        |      SELECT doc_id + 1000000, s FROM t WHERE doc_id % 10 = 0),
        |stats_p AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl,
        |            greatest(4096, count(*) // 20) AS dfcap FROM t),
        |stats_f AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl,
        |            greatest(4096, count(*) // 20) AS dfcap FROM g),
        |tf_b AS (SELECT doc_id, dl, tok, count(*) AS tf FROM
        |  (SELECT doc_id, len(s) AS dl, unnest(s) AS tok FROM t)
        |  GROUP BY doc_id, dl, tok),
        |tf_g AS (SELECT doc_id, dl, tok, count(*) AS tf FROM
        |  (SELECT doc_id, len(s) AS dl, unnest(s) AS tok FROM g)
        |  GROUP BY doc_id, dl, tok),
        |df_p AS (SELECT tok, count(*) AS df FROM tf_b GROUP BY tok),
        |df_f AS (SELECT tok, count(*) AS df FROM tf_g GROUP BY tok),
        |qt AS (SELECT DISTINCT doc_id AS query_id, tok FROM tf_b
        |       WHERE doc_id % 100 = 0),
        |q_p AS (SELECT query_id, tok, df FROM (
        |    SELECT qt.query_id, qt.tok, df_p.df, dfcap,
        |      row_number() OVER (PARTITION BY qt.query_id
        |                         ORDER BY df_p.df ASC, qt.tok ASC) AS qrn
        |    FROM qt JOIN df_p USING (tok) CROSS JOIN stats_p)
        |  WHERE qrn <= 8 AND df <= dfcap),
        |q_f AS (SELECT query_id, tok, df FROM (
        |    SELECT qt.query_id, qt.tok, df_f.df, dfcap,
        |      row_number() OVER (PARTITION BY qt.query_id
        |                         ORDER BY df_f.df ASC, qt.tok ASC) AS qrn
        |    FROM qt JOIN df_f USING (tok) CROSS JOIN stats_f)
        |  WHERE qrn <= 8 AND df <= dfcap),
        |sc_p AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(ln(1.0 + (n - q.df + 0.5) / (q.df + 0.5)) *
        |      (tf.tf * (1.2 + 1)) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl))), 6) AS score
        |  FROM tf_g tf JOIN q_p q USING (tok) CROSS JOIN stats_p
        |  WHERE tf.doc_id <> q.query_id
        |  GROUP BY q.query_id, tf.doc_id),
        |sc_f AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(ln(1.0 + (n - q.df + 0.5) / (q.df + 0.5)) *
        |      (tf.tf * (1.2 + 1)) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl))), 6) AS score
        |  FROM tf_g tf JOIN q_f q USING (tok) CROSS JOIN stats_f
        |  WHERE tf.doc_id <> q.query_id
        |  GROUP BY q.query_id, tf.doc_id),
        |served AS (SELECT query_id, doc_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id ASC) AS rank FROM sc_p)
        |  WHERE rank <= 10),
        |truth AS (SELECT query_id, doc_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id ASC) AS rank FROM sc_f)
        |  WHERE rank <= 10),
        |r AS (SELECT t.query_id, CAST(count(s.doc_id) AS BIGINT) AS n_hits
        |  FROM truth t LEFT JOIN served s
        |    ON t.query_id = s.query_id AND t.doc_id = s.doc_id
        |  GROUP BY t.query_id)
        |SELECT query_id, n_hits, round(n_hits / 10.0, 6) AS recall,
        |  round(avg(round(n_hits / 10.0, 6)) OVER (), 6) < 0.95 AS retrain_advised
        |FROM r ORDER BY query_id""".stripMargin,

    // index-serving dedup: the dedup_incremental chain with the index side
    // UNFILTERED (a persisted bucket index holds every corpus doc, so
    // arriving-vs-arriving pairs surface; only self-pairs are excluded)
    "dedup_index_serve" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct([s[i]||' '||s[i+1]||' '||s[i+2] for i in range(1, len(s)-1)]) AS shingles
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 3
        |),
        |sig AS (
        |  SELECT doc_id, shingles,
        |    [ list_min([ (CAST(concat('0x', substr(md5(sh2),1,8)) AS BIGINT)
        |                  + i * CAST(concat('0x', substr(md5(sh2),9,8)) AS BIGINT)) % 4294967311
        |                 for sh2 in shingles ]) for i in range(0,16) ] AS sig
        |  FROM sh
        |),
        |buckets AS (
        |  SELECT doc_id, b AS band,
        |    array_to_string([CAST(x AS VARCHAR) for x in list_slice(sig, b*4+1, b*4+4)], ',') AS key
        |  FROM sig, (SELECT unnest(range(0,4)) AS b)
        |),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS arriving_id, y.doc_id AS existing_id
        |  FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key
        |    AND x.doc_id % 10 = 0 AND x.doc_id != y.doc_id
        |)
        |SELECT c.arriving_id, c.existing_id,
        |  len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |  len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
        |FROM cand c JOIN sh a ON c.arriving_id = a.doc_id JOIN sh b ON c.existing_id = b.doc_id
        |WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
        |      len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.8
        |ORDER BY arriving_id, existing_id""".stripMargin,

    // CCNet-style span dedup: aligned 8-token spans, first occurrence
    // (min doc_id, span_id) kept, all other occurrences dropped; per doc the
    // kept spans are rejoined in order and digested. sum() is cast back to
    // BIGINT (DuckDB widens integer sums to HUGEINT).
    "dedup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS s,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents WHERE len(string_split(text, ' ')) >= 1
        |),
        |sp AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS span_id,
        |         array_to_string(s[CAST(i*8+1 AS BIGINT):CAST(least((i+1)*8, n) AS BIGINT)], ' ') AS span_text
        |  FROM t, LATERAL (SELECT unnest(range(0, ((n - 1) // 8) + 1)) AS i)
        |),
        |f AS (
        |  SELECT doc_id, span_id, span_text,
        |         row_number() OVER (
        |           PARTITION BY CAST(concat('0x', substr(md5(span_text),1,15)) AS BIGINT)
        |           ORDER BY doc_id, span_id) AS rn
        |  FROM sp
        |)
        |SELECT doc_id,
        |  count(*) AS n_spans,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(concat('0x', substr(md5(coalesce(
        |    string_agg(CASE WHEN rn = 1 THEN span_text END, ' ' ORDER BY span_id),
        |    '')),1,15)) AS BIGINT) AS clean_digest
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // SemDeDup: nearest-IVF-centroid cells (identical derivation to
    // sim_topk_ivf's assigned CTE), within-cell pairs at cosine >= 0.4,
    // dropped = higher id, keeper = min qualifying lower id
    "dedup_semantic" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, v, nrm, cent_id FROM (
        |    SELECT vec_id, v, nrm, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, n.nrm, cents.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN cents))
        |  WHERE arn = 1
        |),
        |pairs AS (
        |  SELECT a.cent_id AS cell_id, a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_sum([a.v[i]*b.v[i] for i in range(1,65)]) / (a.nrm*b.nrm), 6) AS cosine
        |  FROM assigned a JOIN assigned b
        |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        |)
        |SELECT id_b AS vec_id, min(id_a) AS keeper_id,
        |  min(cell_id) AS cell_id, arg_min(cosine, id_a) AS cosine
        |FROM pairs WHERE cosine >= 0.4
        |GROUP BY id_b ORDER BY vec_id""".stripMargin,

    // Bloom decontamination: the m=2^16-bit filter is DETERMINISTIC
    // (k=4 double-hashed positions over the gram's hash60), so the oracle
    // rebuilds the identical bitset and even the false-positive gap
    // n_bloom_hits - n_exact_hits is hash-exact, not bounded-error
    "dedup_bloom" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct([CAST(concat('0x',substr(md5(s[i]||' '||s[i+1]||' '||s[i+2]||' '||s[i+3]||' '||s[i+4]||' '||s[i+5]||' '||s[i+6]||' '||s[i+7]),1,15)) AS BIGINT) for i in range(1, len(s)-6)]) AS grams
        |  FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents)
        |  WHERE len(s) >= 8
        |),
        |bp AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
        |bits AS (
        |  SELECT DISTINCT (gram % 65536 + j * ((gram // 1073741824) % 65536)) % 65536 AS pos
        |  FROM bp, (SELECT unnest(range(0,4)) AS j)
        |),
        |c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 50 <> 0),
        |pr AS (
        |  SELECT doc_id, gram,
        |    bool_and((gram % 65536 + j * ((gram // 1073741824) % 65536)) % 65536 IN
        |             (SELECT pos FROM bits)) AS bloom_hit,
        |    bool_or(gram IN (SELECT gram FROM bp)) AS exact_hit
        |  FROM c, (SELECT unnest(range(0,4)) AS j)
        |  GROUP BY doc_id, gram
        |)
        |SELECT d.doc_id, CAST(len(d.grams) AS INTEGER) AS n_grams,
        |  CAST(count(*) FILTER (WHERE pr.bloom_hit) AS BIGINT) AS n_bloom_hits,
        |  CAST(count(*) FILTER (WHERE pr.exact_hit) AS BIGINT) AS n_exact_hits,
        |  count(*) FILTER (WHERE pr.exact_hit) >= 1 AS contaminated
        |FROM (SELECT doc_id, grams FROM g WHERE doc_id % 50 <> 0) d
        |JOIN pr ON d.doc_id = pr.doc_id
        |GROUP BY d.doc_id, len(d.grams)
        |ORDER BY d.doc_id""".stripMargin,

    // BM25 top-10 retrieval: every 100th doc queries with its 8 rarest
    // distinct tokens (df asc, tok asc); terms over the df cap
    // greatest(4096, N//20) are refused and counted per query as
    // n_terms_dropped (the cap floor 4096 exceeds every selected-term df at
    // the shipped fixture scales — max 3 885 at sf0.1 — so the fixture
    // regime drops nothing; the knee is N ≈ 82k docs, above which the
    // 5 %-of-corpus rule binds on both engines identically). Robertson idf,
    // k1=1.2, b=0.75; scores rounded 6dp BEFORE ranking so the tie-break is
    // engine-stable. Expression shapes mirror the Spark side exactly (same
    // association order, (1.2 + 1) folded in double on both engines)
    "text_bm25_topk" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl,
        |          greatest(4096, count(*) // 20) AS dfcap FROM t),
        |d AS (SELECT doc_id, len(s) AS dl, unnest(s) AS tok FROM t),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d GROUP BY doc_id, dl, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |q AS (
        |  SELECT query_id, tok, df, nd FROM (
        |    SELECT query_id, tok, df, dfcap,
        |      CAST(sum(CASE WHEN df > dfcap THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY query_id) AS INTEGER) AS nd
        |    FROM (
        |      SELECT tf.doc_id AS query_id, tf.tok, dfq.df,
        |        row_number() OVER (PARTITION BY tf.doc_id ORDER BY dfq.df ASC, tf.tok ASC) AS qrn
        |      FROM tf JOIN dfq USING (tok) WHERE tf.doc_id % 100 = 0)
        |    CROSS JOIN stats WHERE qrn <= 8)
        |  WHERE df <= dfcap
        |),
        |sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(ln(1.0 + (n - q.df + 0.5) / (q.df + 0.5)) *
        |      (tf.tf * (1.2 + 1)) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl))), 6) AS score,
        |    min(q.nd) AS n_terms_dropped
        |  FROM tf JOIN q USING (tok) CROSS JOIN stats
        |  WHERE tf.doc_id <> q.query_id
        |  GROUP BY q.query_id, tf.doc_id
        |)
        |SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank, score, n_terms_dropped FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM sc)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // k-means, 2 unrolled Lloyd rounds (the Spark side is convergence-
    // driven with max-iters pinned at 2 for this oracle; the fixture's
    // round-2 centroid shift is far above the 1e-4 eps, so the stop
    // condition cannot fire inside the oracle regime): seeds =
    // vec_id % 200, cosine assignment (6dp, tie → lower cent_id), dim-wise
    // means ROUNDED 6dp before reuse (re-pins both engines to identical
    // centroids each round); output = final-round membership + checksums
    // of the means + per-cluster assignment inertia sum(1 − csim)
    "sim_kmeans" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |c0 AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |a1 AS (
        |  SELECT vec_id, v, cent_id FROM (
        |    SELECT vec_id, v, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, c0.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN c0))
        |  WHERE arn = 1
        |),
        |m1 AS (
        |  SELECT cent_id, dim, round(avg(x), 6) AS m
        |  FROM (SELECT cent_id, i - 1 AS dim, v[i] AS x
        |        FROM a1, (SELECT unnest(range(1,65)) AS i))
        |  GROUP BY cent_id, dim
        |),
        |c1 AS (
        |  SELECT cent_id, cv, sqrt(list_sum([y*y for y in cv])) AS cn
        |  FROM (SELECT cent_id, list(m ORDER BY dim) AS cv FROM m1 GROUP BY cent_id)
        |),
        |a2 AS (
        |  SELECT vec_id, v, cent_id, csim FROM (
        |    SELECT vec_id, v, cent_id, csim,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, c1.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN c1))
        |  WHERE arn = 1
        |),
        |m2 AS (
        |  SELECT cent_id, dim, round(avg(x), 6) AS m
        |  FROM (SELECT cent_id, i - 1 AS dim, v[i] AS x
        |        FROM a2, (SELECT unnest(range(1,65)) AS i))
        |  GROUP BY cent_id, dim
        |),
        |c2 AS (SELECT cent_id, list(m ORDER BY dim) AS cv FROM m2 GROUP BY cent_id),
        |counts AS (SELECT cent_id, count(*) AS n_members,
        |           round(sum(1.0 - csim), 6) AS inertia FROM a2 GROUP BY cent_id)
        |SELECT c2.cent_id AS cluster_id, counts.n_members,
        |  round(list_sum([y for y in cv]), 6) AS csum,
        |  round(list_sum([y*y for y in cv]), 6) AS csumsq,
        |  counts.inertia
        |FROM c2 JOIN counts ON c2.cent_id = counts.cent_id
        |ORDER BY cluster_id""".stripMargin,

    // ANALYZE-style stats: one row per profiled lineitem column; min/max
    // as doubles (dates as epoch days), exact ndv, string column reports
    // NULL bounds
    "q_profile_stats" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    count(l_orderkey) AS nn_ok, count(DISTINCT l_orderkey) AS nd_ok,
        |    CAST(min(l_orderkey) AS DOUBLE) AS mn_ok, CAST(max(l_orderkey) AS DOUBLE) AS mx_ok,
        |    count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |    CAST(min(l_quantity) AS DOUBLE) AS mn_q, CAST(max(l_quantity) AS DOUBLE) AS mx_q,
        |    count(l_extendedprice) AS nn_ep, count(DISTINCT l_extendedprice) AS nd_ep,
        |    CAST(min(l_extendedprice) AS DOUBLE) AS mn_ep, CAST(max(l_extendedprice) AS DOUBLE) AS mx_ep,
        |    count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
        |    CAST(min(l_discount) AS DOUBLE) AS mn_d, CAST(max(l_discount) AS DOUBLE) AS mx_d,
        |    count(l_shipdate) AS nn_sd,
        |    count(DISTINCT CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS nd_sd,
        |    CAST(min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS mn_sd,
        |    CAST(max(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS mx_sd,
        |    count(l_returnflag) AS nn_rf, count(DISTINCT l_returnflag) AS nd_rf
        |  FROM lineitem
        |)
        |SELECT col_name, n AS n_rows, n_nonnull, n_distinct, min_val, max_val FROM s, LATERAL (
        |  VALUES
        |    ('l_orderkey', nn_ok, nd_ok, mn_ok, mx_ok),
        |    ('l_quantity', nn_q, nd_q, mn_q, mx_q),
        |    ('l_extendedprice', nn_ep, nd_ep, mn_ep, mx_ep),
        |    ('l_discount', nn_d, nd_d, mn_d, mx_d),
        |    ('l_shipdate', nn_sd, nd_sd, mn_sd, mx_sd),
        |    ('l_returnflag', nn_rf, nd_rf, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        |  ) AS t(col_name, n_nonnull, n_distinct, min_val, max_val)
        |ORDER BY col_name""".stripMargin,

    // HLL twin of q_profile_stats (round-3 sketch-oracle scheme): exact
    // ndv is the checkable twin; ndv_within_rsd is literal TRUE — a sketch
    // estimate drifting past 15% of exact fails the hash gate
    "q_profile_hll" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    count(l_orderkey) AS nn_ok, count(DISTINCT l_orderkey) AS nd_ok,
        |    CAST(min(l_orderkey) AS DOUBLE) AS mn_ok, CAST(max(l_orderkey) AS DOUBLE) AS mx_ok,
        |    count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |    CAST(min(l_quantity) AS DOUBLE) AS mn_q, CAST(max(l_quantity) AS DOUBLE) AS mx_q,
        |    count(l_extendedprice) AS nn_ep, count(DISTINCT l_extendedprice) AS nd_ep,
        |    CAST(min(l_extendedprice) AS DOUBLE) AS mn_ep, CAST(max(l_extendedprice) AS DOUBLE) AS mx_ep,
        |    count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
        |    CAST(min(l_discount) AS DOUBLE) AS mn_d, CAST(max(l_discount) AS DOUBLE) AS mx_d,
        |    count(l_shipdate) AS nn_sd,
        |    count(DISTINCT CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS nd_sd,
        |    CAST(min(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS mn_sd,
        |    CAST(max(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS DOUBLE) AS mx_sd,
        |    count(l_returnflag) AS nn_rf, count(DISTINCT l_returnflag) AS nd_rf
        |  FROM lineitem
        |)
        |SELECT col_name, n AS n_rows, n_nonnull, n_distinct,
        |  TRUE AS ndv_within_rsd, min_val, max_val FROM s, LATERAL (
        |  VALUES
        |    ('l_orderkey', nn_ok, nd_ok, mn_ok, mx_ok),
        |    ('l_quantity', nn_q, nd_q, mn_q, mx_q),
        |    ('l_extendedprice', nn_ep, nd_ep, mn_ep, mx_ep),
        |    ('l_discount', nn_d, nd_d, mn_d, mx_d),
        |    ('l_shipdate', nn_sd, nd_sd, mn_sd, mx_sd),
        |    ('l_returnflag', nn_rf, nd_rf, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        |  ) AS t(col_name, n_nonnull, n_distinct, min_val, max_val)
        |ORDER BY col_name""".stripMargin,

    // The bucketed tables hold byte-identical rows to the parquet fixtures
    // (bucketing only changes LAYOUT), so the oracle is the plain join —
    // what q_bucketed_join verifies is that the co-located plan computes
    // exactly what the shuffled plan would.
    "q_bucketed_join" ->
      """SELECT o_orderkey, o_orderpriority,
        |  count(*) AS n_items,
        |  round(sum(l_quantity), 2) AS total_qty,
        |  max(l_extendedprice) AS max_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |HAVING count(*) >= 4
        |ORDER BY o_orderkey""".stripMargin,

    "q_shuffle_seeded" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5('ep1|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT CAST(h % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h ASC, doc_id ASC) AS INTEGER) AS pos,
        |  doc_id
        |FROM h
        |ORDER BY shard, pos""".stripMargin,

    // quality formula = the text_quality oracle's; thresholds = the
    // q19_percentile quantile_cont convention (6dp); hash/shard/pos = the
    // q_shuffle_seeded scheme with the 'cur1|' salt
    "pipeline_curriculum" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |q AS (SELECT doc_id,
        |  0.25 * (CAST(len([x for x in toks if x IN ('the','a')]) AS DOUBLE) / len(toks)) +
        |  0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) +
        |  0.05 * (CAST(list_sum([length(x) for x in toks]) AS DOUBLE) / len(toks)) AS quality
        |  FROM t),
        |th AS (SELECT round(quantile_cont(quality, 0.75), 6) AS t1,
        |              round(quantile_cont(quality, 0.5), 6) AS t2,
        |              round(quantile_cont(quality, 0.25), 6) AS t3 FROM q),
        |b AS (SELECT doc_id,
        |  CASE WHEN quality >= t1 THEN 1 WHEN quality >= t2 THEN 2
        |       WHEN quality >= t3 THEN 3 ELSE 4 END AS band,
        |  CAST(concat('0x', substr(md5('cur1|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM q CROSS JOIN th)
        |SELECT doc_id, band, CAST(h % 8 AS INTEGER) AS shard,
        |  CAST(row_number() OVER (PARTITION BY band, h % 8 ORDER BY h ASC, doc_id ASC) AS INTEGER) AS pos
        |FROM b ORDER BY band, shard, pos""".stripMargin,

    "text_lm_ppl" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
        |uni AS (
        |  SELECT tok, count(*) AS c1
        |  FROM (SELECT unnest(s) AS tok FROM toks) GROUP BY tok),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |bg AS (
        |  SELECT doc_id, p.w1 AS w1, p.bgram AS bgram FROM (
        |    SELECT doc_id,
        |      unnest([{'w1': s[i], 'bgram': s[i] || ' ' || s[i+1]} for i in range(1, len(s))]) AS p
        |    FROM toks WHERE len(s) >= 2)),
        |bgc AS (SELECT bgram AS bgk, count(*) AS c2 FROM bg GROUP BY bgram),
        |scored AS (
        |  SELECT doc_id, -ln((c2 + 0.5) / (c1 + 0.5 * v)) AS nll
        |  FROM bg JOIN bgc ON bgram = bgk JOIN uni ON w1 = tok, vocab)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(avg(nll), 6) AS avg_nll,
        |  round(exp(round(avg(nll), 6)), 2) AS ppl
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // ingest-append encode (incremental index maintenance): every 10th
    // base vector re-arrives under id+10^6; assignment = argmax round-6
    // cosine vs the BASE stride centroids (ties to lower cell), codes =
    // per-subspace argmin round-6 L2 vs the BASE stride codebook (ties to
    // lower cid) — the pinned-quantizer contract, re-derived in SQL
    "sim_index_append" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |delta AS (
        |  SELECT vec_id + 1000000 AS vec_id, v, nrm FROM n WHERE vec_id % 10 = 0),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, nrm, cent_id FROM (
        |    SELECT d.vec_id, d.nrm, cents.cent_id,
        |      row_number() OVER (PARTITION BY d.vec_id ORDER BY
        |        round(list_sum([d.v[i]*cv[i] for i in range(1,65)]) / (d.nrm*cn), 6) DESC,
        |        cents.cent_id ASC) AS arn
        |    FROM delta d CROSS JOIN cents)
        |  WHERE arn = 1),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code FROM (
        |    SELECT d.vec_id, mm.m, cb.cid,
        |      row_number() OVER (PARTITION BY d.vec_id, mm.m ORDER BY
        |        round(list_sum([(d.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (d.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM delta d CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1)
        |SELECT a.vec_id, round(a.nrm, 6) AS nrm, a.cent_id,
        |  CAST(c.m AS INTEGER) AS m, c.code
        |FROM assigned a JOIN codes c ON c.vec_id = a.vec_id
        |ORDER BY a.vec_id, c.m""".stripMargin,

    "sim_topk_pq" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cid, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM n CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT q.vec_id AS query_id, q.nrm AS qn, mm.m, cb.cid,
        |    round(list_sum([q.v[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q CROSS JOIN cb CROSS JOIN mm),
        |adc AS (
        |  SELECT dt.query_id, codes.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes.nrm)), 6) AS adc_cosine
        |  FROM codes JOIN dt ON dt.m = codes.m AND dt.cid = codes.code
        |  WHERE codes.vec_id != dt.query_id
        |  GROUP BY dt.query_id, codes.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc) WHERE rr <= 50),
        |ex AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // IVF × PQ: the sim_topk_ivf probe CTEs bound WHICH vectors are scanned,
    // the sim_topk_pq code/distance-table CTEs bound WHAT the scan reads —
    // the adc aggregate is the PQ one restricted through the probes join
    "sim_topk_ivfpq" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT n.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM n CROSS JOIN cents)
        |  WHERE arn = 1),
        |probes AS (
        |  SELECT query_id, cent_id FROM (
        |    SELECT q.vec_id AS query_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_sum([q.v[i]*cv[i] for i in range(1,65)]) / (q.nrm*cn), 6) DESC,
        |        cent_id ASC) AS prn
        |    FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q CROSS JOIN cents)
        |  WHERE prn <= 2),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT n.vec_id, mm.m, cb.cid, n.nrm,
        |      row_number() OVER (PARTITION BY n.vec_id, mm.m ORDER BY
        |        round(list_sum([(n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (n.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM n CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT q.vec_id AS query_id, q.nrm AS qn, mm.m, cb.cid,
        |    round(list_sum([q.v[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q CROSS JOIN cb CROSS JOIN mm),
        |adc AS (
        |  SELECT p.query_id, codes.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes.nrm)), 6) AS adc_cosine
        |  FROM probes p
        |  JOIN assigned a ON a.cent_id = p.cent_id
        |  JOIN codes ON codes.vec_id = a.vec_id
        |  JOIN dt ON dt.query_id = p.query_id AND dt.m = codes.m AND dt.cid = codes.code
        |  WHERE codes.vec_id != p.query_id
        |  GROUP BY p.query_id, codes.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc) WHERE rr <= 50),
        |ex AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short s JOIN n qn ON qn.vec_id = s.query_id JOIN n nn ON nn.vec_id = s.neighbor_id)
        |SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM ex) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // IVF cell-blocked hard negatives: the sim_topk_ivf assignment/probe
    // CTEs (labels riding along) + the sim_hard_negatives label-mismatch
    // scoring restricted to probed cells
    "sim_hard_negatives_ivf" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings
        |),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, v, nrm, label, cent_id FROM (
        |    SELECT vec_id, v, nrm, label, cent_id,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS arn
        |    FROM (
        |      SELECT n.vec_id, n.v, n.nrm, n.label, cents.cent_id,
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) AS csim
        |      FROM n CROSS JOIN cents))
        |  WHERE arn = 1
        |),
        |probes AS (
        |  SELECT query_id, qv, qn, anchor_label, cent_id FROM (
        |    SELECT query_id, qv, qn, anchor_label, cent_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cent_id ASC) AS prn
        |    FROM (
        |      SELECT q.vec_id AS query_id, q.v AS qv, q.nrm AS qn,
        |        q.label AS anchor_label, cents.cent_id,
        |        round(list_sum([q.v[i]*cv[i] for i in range(1,65)]) / (q.nrm*cn), 6) AS csim
        |      FROM (SELECT * FROM n WHERE vec_id % 100 = 0) q CROSS JOIN cents))
        |  WHERE prn <= 2
        |),
        |scored AS (
        |  SELECT query_id, anchor_label, a.vec_id AS neighbor_id, a.label AS neg_label,
        |    round(list_sum([qv[i]*a.v[i] for i in range(1,65)]) / (qn*a.nrm), 6) AS cosine
        |  FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
        |  WHERE a.vec_id != p.query_id AND a.label != p.anchor_label
        |)
        |SELECT query_id, anchor_label, neighbor_id, neg_label, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // hybrid RRF with the IVFADC dense leg: sim_hybrid_rrf's lexical CTE
    // chain fused with sim_topk_ivfpq's chain (CTE names disjoint by
    // construction) — same fusion arithmetic, ANN-leg ranks
    "sim_hybrid_rrf_ann" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len(s)) AS avgdl,
        |          greatest(4096, count(*) // 20) AS dfcap FROM t),
        |d AS (SELECT doc_id, len(s) AS dl, unnest(s) AS tok FROM t),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM d GROUP BY doc_id, dl, tok),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |q AS (
        |  SELECT query_id, tok, df FROM (
        |    SELECT query_id, tok, df, dfcap FROM (
        |      SELECT tf.doc_id AS query_id, tf.tok, dfq.df,
        |        row_number() OVER (PARTITION BY tf.doc_id ORDER BY dfq.df ASC, tf.tok ASC) AS qrn
        |      FROM tf JOIN dfq USING (tok) WHERE tf.doc_id % 100 = 0)
        |    CROSS JOIN stats WHERE qrn <= 8)
        |  WHERE df <= dfcap
        |),
        |sc AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(sum(ln(1.0 + (n - q.df + 0.5) / (q.df + 0.5)) *
        |      (tf.tf * (1.2 + 1)) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl))), 6) AS score
        |  FROM tf JOIN q USING (tok) CROSS JOIN stats
        |  WHERE tf.doc_id <> q.query_id
        |  GROUP BY q.query_id, tf.doc_id
        |),
        |lex AS (
        |  SELECT query_id, doc_id, CAST(rank AS INTEGER) AS lex_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |    FROM sc) WHERE rank <= 10),
        |nv AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM nv WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT nv.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY nv.vec_id ORDER BY
        |        round(list_sum([nv.v[i]*cv[i] for i in range(1,65)]) / (nv.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM nv CROSS JOIN cents)
        |  WHERE arn = 1),
        |probes AS (
        |  SELECT query_id, cent_id FROM (
        |    SELECT qq.vec_id AS query_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY qq.vec_id ORDER BY
        |        round(list_sum([qq.v[i]*cv[i] for i in range(1,65)]) / (qq.nrm*cn), 6) DESC,
        |        cent_id ASC) AS prn
        |    FROM (SELECT * FROM nv WHERE vec_id % 100 = 0) qq CROSS JOIN cents)
        |  WHERE prn <= 2),
        |cb AS (SELECT vec_id AS cid, v AS cv FROM nv WHERE vec_id % 8 = 0),
        |mm AS (SELECT unnest(range(0, 8)) AS m),
        |codes AS (
        |  SELECT vec_id, m, cid AS code, nrm FROM (
        |    SELECT nv.vec_id, mm.m, cb.cid, nv.nrm,
        |      row_number() OVER (PARTITION BY nv.vec_id, mm.m ORDER BY
        |        round(list_sum([(nv.v[mm.m*8+i] - cb.cv[mm.m*8+i]) * (nv.v[mm.m*8+i] - cb.cv[mm.m*8+i]) for i in range(1, 9)]), 6) ASC,
        |        cb.cid ASC) AS rn
        |    FROM nv CROSS JOIN cb CROSS JOIN mm)
        |  WHERE rn = 1),
        |dt AS (
        |  SELECT qq.vec_id AS query_id, qq.nrm AS qn, mm.m, cb.cid,
        |    round(list_sum([qq.v[mm.m*8+i] * cb.cv[mm.m*8+i] for i in range(1, 9)]), 6) AS d
        |  FROM (SELECT * FROM nv WHERE vec_id % 100 = 0) qq CROSS JOIN cb CROSS JOIN mm),
        |adc AS (
        |  SELECT p.query_id, codes.vec_id AS neighbor_id,
        |    round(sum(dt.d) / (min(dt.qn) * min(codes.nrm)), 6) AS adc_cosine
        |  FROM probes p
        |  JOIN assigned a ON a.cent_id = p.cent_id
        |  JOIN codes ON codes.vec_id = a.vec_id
        |  JOIN dt ON dt.query_id = p.query_id AND dt.m = codes.m AND dt.cid = codes.code
        |  WHERE codes.vec_id != p.query_id
        |  GROUP BY p.query_id, codes.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_cosine DESC, neighbor_id ASC) AS rr
        |    FROM adc) WHERE rr <= 50),
        |ex AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    round(list_sum([qn.v[i]*nn.v[i] for i in range(1,65)]) / (qn.nrm*nn.nrm), 6) AS cosine
        |  FROM short s JOIN nv qn ON qn.vec_id = s.query_id JOIN nv nn ON nn.vec_id = s.neighbor_id),
        |sem AS (
        |  SELECT query_id, neighbor_id AS doc_id, CAST(rank AS INTEGER) AS sem_rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |    FROM ex) WHERE rank <= 10),
        |f AS (
        |  SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
        |    coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        |    coalesce(lex.lex_rank, 0) AS lex_rank,
        |    coalesce(sem.sem_rank, 0) AS sem_rank,
        |    round(coalesce(1.0/(60 + lex.lex_rank), 0) +
        |          coalesce(1.0/(60 + sem.sem_rank), 0), 6) AS rrf_score
        |  FROM lex FULL OUTER JOIN sem
        |    ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id)
        |SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
        |  CAST(rank AS INTEGER) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rank
        |  FROM f)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // substring-level exact dedup: duplicated 8-gram anchors (all but the
    // global first occurrence of each gram) merged into maximal duplicated
    // spans per doc via gaps-and-islands. The oracle groups by the gram
    // STRING where Spark groups by its hash60 — output-identical absent
    // 60-bit collisions (the text_boilerplate precedent)
    "dedup_substrings" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS s FROM documents),
        |g AS (SELECT doc_id, len(s) AS n_toks,
        |        [{'pos': i, 'gram': array_to_string(s[i:i+7], ' ')}
        |         for i in range(1, greatest(len(s)-6, 1))] AS gs
        |      FROM tok),
        |anchors AS (SELECT doc_id, u.pos AS pos, u.gram AS gram
        |            FROM (SELECT doc_id, unnest(gs) AS u FROM g)),
        |dup AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |    FROM anchors) WHERE rn > 1),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev IS NULL OR pos - prev > 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
        |  FROM (SELECT doc_id, pos,
        |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM dup)),
        |spans AS (SELECT doc_id, isl, min(pos) AS f, max(pos) AS l, count(*) AS ns
        |          FROM isl GROUP BY doc_id, isl),
        |perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |                  CAST(sum(ns) AS BIGINT) AS n_dup_starts,
        |                  CAST(sum(l - f + 8) AS BIGINT) AS n_dup_tokens
        |           FROM spans GROUP BY doc_id)
        |SELECT g.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
        |  coalesce(n_dup_starts, 0) AS n_dup_starts,
        |  coalesce(n_dup_spans, 0) AS n_dup_spans,
        |  coalesce(n_dup_tokens, 0) AS n_dup_tokens,
        |  round(coalesce(n_dup_tokens, 0) * 1.0 / greatest(n_toks, 1), 6) AS dup_frac
        |FROM g LEFT JOIN perdoc ON g.doc_id = perdoc.doc_id
        |ORDER BY g.doc_id""".stripMargin,

    // cell-balanced diversity subsample: the sim_topk_ivf assignment CTE +
    // a per-cell quota over the content-hash order (mixture hash idiom)
    "sim_balanced_sample" ->
      """WITH n AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |         sqrt(list_sum([x*x for x in CAST(embedding AS DOUBLE[])])) AS nrm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 200 = 0),
        |assigned AS (
        |  SELECT vec_id, cent_id FROM (
        |    SELECT n.vec_id, cents.cent_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        round(list_sum([n.v[i]*cv[i] for i in range(1,65)]) / (n.nrm*cn), 6) DESC,
        |        cent_id ASC) AS arn
        |    FROM n CROSS JOIN cents)
        |  WHERE arn = 1),
        |q AS (SELECT ((count(*) // 4) + (SELECT count(*) FROM cents) - 1)
        |             // (SELECT count(*) FROM cents) AS quota FROM n),
        |pos AS (
        |  SELECT vec_id, cent_id AS cell_id,
        |    CAST(row_number() OVER (PARTITION BY cent_id ORDER BY
        |      CAST(concat('0x', substr(md5(concat('div|', vec_id)),1,15)) AS BIGINT) % 1000000 ASC,
        |      vec_id ASC) AS INTEGER) AS pos
        |  FROM assigned)
        |SELECT vec_id, cell_id, pos, pos <= quota AS selected
        |FROM pos, q ORDER BY vec_id""".stripMargin,

    // temperature mixture: τ = 1/2 via sqrt (IEEE-correctly-rounded in both
    // engines — bit-portable policy doubles); decision is the integer-hash
    // test in the same 10^6 space as pipeline_mixture
    "pipeline_temperature" ->
      """WITH d AS (SELECT doc_id, lang, len(string_split(text,' ')) AS nt FROM documents),
        |l AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS tok_l FROM d GROUP BY lang),
        |t AS (SELECT CAST(sum(tok_l) AS BIGINT) AS tok_total, CAST(sum(sqrt(tok_l)) AS DOUBLE) AS z FROM l),
        |r AS (SELECT lang, least(1000000,
        |        CAST(round(1000000 * tok_total * sqrt(tok_l) / (2 * z * tok_l)) AS BIGINT)) AS threshold
        |      FROM l, t)
        |SELECT d.doc_id, d.lang, CAST(d.nt AS BIGINT) AS n_ws_tokens, r.threshold,
        |  CAST(concat('0x', substr(md5(concat('tmix|', doc_id)),1,15)) AS BIGINT) % 1000000 < threshold AS selected
        |FROM d JOIN r USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "pipeline_dsir" ->
      """WITH toks AS (SELECT doc_id, lang, string_split(text,' ') AS s FROM documents),
        |grams AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5('dsir|' || g), 1, 15)) AS BIGINT) % 1024 AS b
        |  FROM (
        |    SELECT doc_id, lang, unnest(s || CASE WHEN len(s) >= 2
        |      THEN [s[i] || ' ' || s[i+1] for i in range(1, len(s))]
        |      ELSE CAST([] AS VARCHAR[]) END) AS g
        |    FROM toks)),
        |tgt AS (SELECT b, count(*) AS ct FROM grams WHERE lang = 'en' GROUP BY b),
        |raw AS (SELECT b, count(*) AS cr FROM grams GROUP BY b),
        |totals AS (SELECT CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS t, count(*) AS r FROM grams),
        |scored AS (
        |  SELECT doc_id,
        |    ln((coalesce(ct, 0) + 0.5) / (t + 0.5 * 1024)) - ln((cr + 0.5) / (r + 0.5 * 1024)) AS lw
        |  FROM grams JOIN raw USING (b) LEFT JOIN tgt USING (b), totals)
        |SELECT doc_id, count(*) AS n_grams, round(sum(lw), 6) AS logw,
        |  round(sum(lw), 6) >= 0 AS selected
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_zorder" ->
      """WITH z AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(list_sum([ (((l_partkey >> i) & 1) << (2*i)) + (((l_suppkey >> i) & 1) << (2*i+1)) for i in range(0, 16) ]) AS BIGINT) AS z
        |  FROM lineitem)
        |SELECT z >> 16 AS zbucket, count(*) AS n,
        |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
        |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,

    "text_bpe" ->
      """WITH r0 AS (
        |  SELECT count(*) AS freq,
        |    [w[i] for i in range(1, len(w)+1)] || ['</w>'] AS s
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w != '' GROUP BY w),
        |p1 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r0))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |r1 AS (
        |  SELECT freq, list_filter([CASE
        |      WHEN s[i] = p1.l AND i < len(s) AND s[i+1] = p1.r THEN p1.l || p1.r
        |      WHEN i > 1 AND s[i-1] = p1.l AND s[i] = p1.r THEN NULL
        |      ELSE s[i] END for i in range(1, len(s)+1)], x -> x IS NOT NULL) AS s
        |  FROM r0, p1),
        |p2 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r1))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |r2 AS (
        |  SELECT freq, list_filter([CASE
        |      WHEN s[i] = p2.l AND i < len(s) AND s[i+1] = p2.r THEN p2.l || p2.r
        |      WHEN i > 1 AND s[i-1] = p2.l AND s[i] = p2.r THEN NULL
        |      ELSE s[i] END for i in range(1, len(s)+1)], x -> x IS NOT NULL) AS s
        |  FROM r1, p2),
        |p3 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r2))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |r3 AS (
        |  SELECT freq, list_filter([CASE
        |      WHEN s[i] = p3.l AND i < len(s) AND s[i+1] = p3.r THEN p3.l || p3.r
        |      WHEN i > 1 AND s[i-1] = p3.l AND s[i] = p3.r THEN NULL
        |      ELSE s[i] END for i in range(1, len(s)+1)], x -> x IS NOT NULL) AS s
        |  FROM r2, p3),
        |p4 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r3))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |r4 AS (
        |  SELECT freq, list_filter([CASE
        |      WHEN s[i] = p4.l AND i < len(s) AND s[i+1] = p4.r THEN p4.l || p4.r
        |      WHEN i > 1 AND s[i-1] = p4.l AND s[i] = p4.r THEN NULL
        |      ELSE s[i] END for i in range(1, len(s)+1)], x -> x IS NOT NULL) AS s
        |  FROM r3, p4),
        |p5 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r4))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
        |r5 AS (
        |  SELECT freq, list_filter([CASE
        |      WHEN s[i] = p5.l AND i < len(s) AND s[i+1] = p5.r THEN p5.l || p5.r
        |      WHEN i > 1 AND s[i-1] = p5.l AND s[i] = p5.r THEN NULL
        |      ELSE s[i] END for i in range(1, len(s)+1)], x -> x IS NOT NULL) AS s
        |  FROM r4, p5),
        |p6 AS (
        |  SELECT l, r, cnt FROM (
        |    SELECT l, r, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |      SELECT freq, p.l AS l, p.r AS r FROM (
        |        SELECT freq, unnest([{'l': s[i], 'r': s[i+1]} for i in range(1, len(s))]) AS p FROM r5))
        |    WHERE l != r GROUP BY l, r)
        |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
        |SELECT CAST(rank AS INTEGER) AS rank, left_sym, right_sym, merged, CAST(weight AS BIGINT) AS weight FROM (
        |SELECT 1 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p1
        |UNION ALL SELECT 2 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p2
        |UNION ALL SELECT 3 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p3
        |UNION ALL SELECT 4 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p4
        |UNION ALL SELECT 5 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p5
        |UNION ALL SELECT 6 AS rank, l AS left_sym, r AS right_sym, l || r AS merged, cnt AS weight FROM p6)
        |ORDER BY rank""".stripMargin,
  )
}
