package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{ExtractOps, Ops}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query aliases columns identically on both sides and
  * imposes a total ORDER BY; hash-based ops use the portable polyhash fold so
  * DuckDB can recompute them exactly. Queries without an oracleSql entry are
  * engine-native semantics (HTML extraction, audit, glyph repair, multimodal
  * plumbing) covered by the golden tests; the driver records rows-only.
  */
object SparkEntry {
  /** Flagship: full extraction pipeline (HTML parse -> transform battery ->
    * markdown) over the synthetic Common-Crawl-style corpus. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pages = spark.createDataset((0L until 64L)
      .map(i => graft.sources.SyntheticPages.page(42L, i))).toDF()
    graft.extract.Pipeline.extract(spark, pages, numBuckets = 8).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q01_pricing_summary" -> (Ops.q01PricingSummary(_, _)),
    "q02_revenue_by_nation" -> (Ops.q02RevenueByNation(_, _)),
    "q03_top_orders_per_customer" -> (Ops.q03TopOrdersPerCustomer(_, _)),
    "q04_customers_without_orders" -> (Ops.q04CustomersWithoutOrders(_, _)),
    "q05_events_hourly" -> (Ops.q05EventsHourly(_, _)),
    "q06_part_brand_stats" -> (Ops.q06PartBrandStats(_, _)),
    "q07_event_props" -> (Ops.q07EventProps(_, _)),
    // text analysis
    "q10_token_stats" -> (Ops.q10TokenStats(_, _)),
    "q11_quality_score" -> (Ops.q11QualityScore(_, _)),
    "q12_langid" -> (Ops.q12LangId(_, _)),
    // dedup family
    "q13_exact_hash" -> (Ops.q13ExactHash(_, _)),
    "q14_exact_dedup_groups" -> (Ops.q14ExactDedupGroups(_, _)),
    "q15_ngram_jaccard_pairs" -> ((s, d) => Ops.q15NgramJaccardPairs(s, d)),
    "q16_fingerprint" -> (Ops.q16Fingerprint(_, _)),
    "q17_minhash_signatures" -> (Ops.q17MinhashSignatures(_, _)),
    "q18_minhash_lsh_pairs" -> (Ops.q18MinhashLshPairs(_, _)),
    "q19_simhash" -> (Ops.q19Simhash(_, _)),
    "q20_simhash_pairs" -> ((s, d) => Ops.q20SimhashPairs(s, d)),
    // similarity search
    "q21_cosine_topk" -> ((s, d) => Ops.q21CosineTopK(s, d)),
    "q22_cosine_neardup" -> ((s, d) => Ops.q22CosineNearDup(s, d)),
    "q23_cosine_lsh_topk" -> ((s, d) => Ops.q23CosineLshTopK(s, d)),
    "q24_label_centroids" -> (Ops.q24LabelCentroids(_, _)),
    "q25_ngram_jaccard_pruned" -> ((s, d) => Ops.q25NgramJaccardPruned(s, d)),
    "q27_cosine_ivf_topk" -> ((s, d) => Ops.q27CosineIvfTopK(s, d)),
    "q28_simhash64" -> (Ops.q28Simhash64(_, _)),
    "q29_simhash64_pairs" -> ((s, d) => Ops.q29Simhash64Pairs(s, d)),
    "q26_salted_user_stats" -> ((s, d) => Ops.q26SaltedUserStats(s, d)),
    // extraction-domain (engine-native semantics; every output column is
    // either a closed-form the oracle recomputes from the parquet or an
    // engine-verified invariant with an exact expected constant)
    "q30_extract_documents" -> (ExtractOps.extractDocuments(_, _)),
    "q31_audit_synthetic" -> (ExtractOps.auditDriverDocs(_, _)),
    "q32_spacing_flags" -> (ExtractOps.spacingFlags(_, _)),
    "q33_glyph_repair" -> (ExtractOps.glyphRepair(_, _)),
    "q34_multimodal_features" -> (ExtractOps.multimodalFeatures(_, _)),
    "q35_clean_cells" -> (ExtractOps.cleanCells(_, _)),
    "q36_worst_pages" -> ((s, d) => ExtractOps.worstPages(s, d)),
    "q37_ocr_merge" -> ((s, d) => ExtractOps.ocrMerge(s, d)),
    "q38_spacing_fix_flow" -> (ExtractOps.spacingFixFlow(_, _)),
    "q39_backend_probe" -> (ExtractOps.backendProbe(_, _)),
    "q40_doc_json" -> (ExtractOps.docJson(_, _)),
    "q41_events_window_batch" -> ((s, d) => graft.streaming.EventStream.batch(s, d)),
    "q42_pdf_extract" -> (ExtractOps.pdfExtract(_, _)),
    "q43_pdf_pipeline" -> (ExtractOps.pdfPipeline(_, _)),
    "q44_reference_golden" -> (ExtractOps.referenceGolden(_, _)),
    "q45_docling_pipeline" -> (ExtractOps.doclingPipeline(_, _)),
    "q46_kpi_captions" -> (ExtractOps.kpiCaptions(_, _)),
    "q47_neardup_components" -> ((s, d) => Ops.q47NeardupComponents(s, d)),
    "q48_two_channel_repair" -> (ExtractOps.twoChannelRepair(_, _)),
    "q49_ivf_trained" -> ((s, d) => Ops.q49IvfTrainedTopK(s, d)),
    "q50_paragraph_dedup" -> (Ops.q50ParagraphDedup(_, _)),
    "q51_repetition_stats" -> (Ops.q51RepetitionStats(_, _)),
    "q52_docling_roundtrip" -> (ExtractOps.doclingRoundTrip(_, _)),
    "q53_lineage_resume" -> (ExtractOps.lineageResume(_, _)),
    "q54_page_range_image_modes" -> (ExtractOps.pageRangeImageModes(_, _)),
    "q55_pdf15_pipeline" -> (ExtractOps.pdfPipeline15(_, _)),
    "q56_quality_filter" -> ((s, d) => Ops.q56QualityFilter(s, d)),
    "q57_streaming_parity" -> (ExtractOps.streamingParity(_, _)),
    "q58_audit_aggregator" -> (ExtractOps.auditAggregatorParity(_, _)),
    "q59_encrypted_pipeline" -> (ExtractOps.encryptedPdfPipeline(_, _)),
    "q60_boilerpipe_classifier" -> (ExtractOps.boilerpipePipeline(_, _)),
    "q61_url_canonical_dedup" -> ((s, d) => Ops.q61UrlCanonicalDedup(s, d)),
    "q62_warc_ingest" -> (ExtractOps.warcIngest(_, _)),
    "q63_head_meta" -> (ExtractOps.headMetaPipeline(_, _)),
    "q64_bpe_token_stats" -> ((s, d) => Ops.q64BpeTokenStats(s, d)),
    "q65_ngram_langid" -> ((s, d) => Ops.q65NgramLangId(s, d)),
    "q66_streaming_sessions" -> (ExtractOps.streamingSessions(_, _)),
    "q67_dedup_chain" -> ((s, d) => Ops.q67DedupChainOracle(s, d)),
    "q68_streaming_lsh" -> (ExtractOps.streamingLshPairs(_, _)),
  )

  /** Correctness baselines with deliberately quadratic shapes, kept ONLY to
    * oracle-pin their scale-safe siblings (q15 unpruned trigram join -> q25;
    * q21 brute-force top-k -> q23/q27; q22 inequality-only self-join -> q23).
    * Bench/scale harnesses must exclude these mechanically — none of them is
    * a plan you would run at 100 TB. */
  val baselineOnly: Set[String] =
    Set("q15_ngram_jaccard_pairs", "q21_cosine_topk", "q22_cosine_neardup")

  /** DuckDB fold equal to graft.functions.PolyHash over ASCII text. */
  private def phSql(col: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($col, ''), c -> CAST(ord(c) AS BIGINT))), " +
      s"(a, x) -> (a * 31 + x) % 1000000007)"

  private val dotSql =
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64), i -> x.v[i] * y.v[i])), (s, e) -> s + e)"
  private val normSql =
    "sqrt(list_reduce(list_prepend(0.0, list_transform(v, a -> a * a)), (s, e) -> s + e))"

  private def langIdSql: String = {
    val profiles = Ops.LangProfiles
    val scoreCols = profiles.map { case (c, ws) =>
      s"CAST(len(list_filter(w, t -> ${ws.map(w => s"t = '$w'").mkString(" OR ")})) AS INTEGER) AS s_$c"
    }.mkString(", ")
    val codes = profiles.map(_._1)
    val cases = codes.dropRight(1).map { c =>
      val conds = codes.filter(_ != c).map(o => s"s_$c >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$c'"
    }.mkString(" ")
    s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |scored AS (SELECT doc_id, lang, $scoreCols FROM toks)
       |SELECT doc_id, lang, CASE $cases ELSE '${codes.last}' END AS predicted,
       | ${codes.map(c => s"s_$c").mkString(", ")}
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain ending in `sig(doc_id, sig_0..sig_k)`. */
  private def minhashCtes: String = {
    val sigs = (0 until Ops.MinhashK).map { j =>
      s"min((${Ops.minhashA(j)} * h + ${Ops.minhashB(j)}) % ${Ops.MinhashP}) AS sig_$j"
    }.mkString(", ")
    s"""ng AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |        WHERE len(string_split(text, ' ')) >= 3) tk,
       |  UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
       |h AS (SELECT doc_id, ${phSql("ng")} AS h FROM ng),
       |sig AS (SELECT doc_id, $sigs FROM h GROUP BY doc_id)""".stripMargin
  }

  private def simhashSql: String = {
    val votes = (0 until Ops.SimhashBits).map { j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v_$j"
    }.mkString(", ")
    val assemble = (0 until Ops.SimhashBits).map { j =>
      s"(CASE WHEN v_$j > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH ng AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |        WHERE len(string_split(text, ' ')) >= 3) tk,
       |  UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
       |h AS (SELECT doc_id, ${phSql("ng")} AS h FROM ng),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM v""".stripMargin
  }

  /** 64-bit simhash CTE chain ending in `sh(doc_id, simhash)` — mirrors
    * Ops.simhash64Core (4 derived views x 16 low bits). Bit 63's addend is
    * ordered last so DuckDB's checked BIGINT addition never overflows
    * (partial sum of bits 0..62 <= 2^63-1, then + Long.MIN stays in range). */
  private def simhash64Ctes: String = {
    val views = (0 until 4).map { k =>
      s"(CAST(${2 * k + 3} AS BIGINT) * h + ${7 * k + 11}) % ${Ops.MinhashP}"
    }
    val votes = (for (k <- 0 until 4; j <- 0 until 16) yield
      s"sum(CASE WHEN ((${views(k)}) >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS v_${k * 16 + j}")
      .mkString(", ")
    val assemble = (0 until 64).map { b =>
      val bit = if (b == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << b} AS BIGINT)"
      s"(CASE WHEN v_$b > 0 THEN $bit ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    s"""ng AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |        WHERE len(string_split(text, ' ')) >= 3) tk,
       |  UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
       |h AS (SELECT doc_id, ${phSql("ng")} AS h FROM ng),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id),
       |sh AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM v)""".stripMargin
  }

  /** Integer LCG hyperplane component for q23, portable to any engine:
    * dim index i is 1-based here (DuckDB lists), matching Spark's 0-based
    * (p*64 + i + 1). */
  private def q23PlaneSql(p: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64), i -> " +
      s"v[i] * CAST((CAST(1103515245 AS BIGINT) * ($p * 64 + i) + 12345) % 1024 - 512 AS DOUBLE))), " +
      "(s, e) -> s + e)"

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 6) AS avg_disc,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q04_customers_without_orders" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 4) AS sum_value,
        | round(avg(value), 6) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q06_part_brand_stats" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        | round(avg(p_retailprice), 4) AS avg_price,
        | round(min(p_retailprice), 2) AS min_price,
        | round(max(p_retailprice), 2) AS max_price
        |FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_event_props" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q10_token_stats" ->
      """SELECT doc_id, n_tokens, n_chars,
        | round((n_chars - (n_tokens - 1)) * 1.0 / n_tokens, 6) AS avg_token_len
        |FROM (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q11_quality_score" ->
      """SELECT doc_id, n_tokens, n_distinct, n_stop, n_chars,
        | round(n_stop * 1.0 / n_tokens, 6) AS stop_ratio,
        | round(n_distinct * 1.0 / n_tokens, 6) AS ttr,
        | CAST(floor(n_chars / 100.0) AS BIGINT) AS len_bucket
        |FROM (SELECT doc_id,
        |  CAST(len(w) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS INTEGER) AS n_distinct,
        |  CAST(len(list_filter(w, t -> t = 'the' OR t = 'a')) AS INTEGER) AS n_stop,
        |  CAST(length(text) AS INTEGER) AS n_chars
        | FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) x) t
        |ORDER BY doc_id""".stripMargin,

    "q12_langid" -> langIdSql,

    "q13_exact_hash" ->
      s"SELECT doc_id, ${phSql("text")} AS text_hash FROM documents ORDER BY doc_id",

    "q14_exact_dedup_groups" ->
      s"""SELECT text_hash, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies
         |FROM (SELECT doc_id, ${phSql("text")} AS text_hash FROM documents) t
         |GROUP BY text_hash ORDER BY text_hash""".stripMargin,

    "q15_ngram_jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |ng AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
        |  FROM toks, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY 1),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_inter
        |  FROM ng x JOIN ng y ON x.ng = y.ng AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b,
        | round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) >= 0.08
        |ORDER BY id_a, id_b""".stripMargin,

    "q16_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |  WHERE len(string_split(text, ' ')) >= 4),
         |sh AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
         |  FROM toks, UNNEST(generate_series(1, len(w) - 3)) AS t(i))
         |SELECT doc_id, min(${phSql("sh")}) AS fingerprint
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q17_minhash_signatures" ->
      s"WITH $minhashCtes SELECT * FROM sig ORDER BY doc_id",

    "q18_minhash_lsh_pairs" -> {
      val bandSelects = (0 until Ops.MinhashK by 2).map { j =>
        s"SELECT doc_id, ${j / 2} AS band, CAST(sig_$j AS VARCHAR) || ':' || " +
          s"CAST(sig_${j + 1} AS VARCHAR) AS bkey FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $minhashCtes,
         |bands AS ($bandSelects)
         |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q19_simhash" -> (simhashSql + " ORDER BY doc_id"),

    "q20_simhash_pairs" ->
      (s"""WITH sh AS (${simhashSql.replace("ORDER BY doc_id", "")})
          |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
          | CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
          |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
          |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
          |ORDER BY id_a, id_b""".stripMargin),

    "q21_cosine_topk" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, $normSql AS nrm FROM v),
         |p AS (SELECT x.vec_id AS vec_id, y.vec_id AS neighbor_id,
         |  round($dotSql / (x.nrm * y.nrm), 4) AS sim
         |  FROM n x JOIN n y ON x.vec_id <> y.vec_id WHERE x.vec_id < 200),
         |r AS (SELECT vec_id, neighbor_id, sim,
         |  CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC)
         |    AS INTEGER) AS rank FROM p)
         |SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY vec_id, rank""".stripMargin,

    "q22_cosine_neardup" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, $normSql AS nrm FROM v)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         | round($dotSql / (x.nrm * y.nrm), 4) AS sim
         |FROM n x JOIN n y ON x.vec_id < y.vec_id
         |WHERE round($dotSql / (x.nrm * y.nrm), 4) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q25_ngram_jaccard_pruned" ->
      """WITH ngall AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |        WHERE len(string_split(text, ' ')) >= 3) tk,
        |  UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
        |rare AS (SELECT ng FROM (SELECT ng, count(*) AS df FROM ngall GROUP BY 1) d
        |  WHERE df <= 50),
        |ng AS (SELECT ngall.doc_id, ngall.ng FROM ngall JOIN rare ON ngall.ng = rare.ng),
        |sizes AS (SELECT doc_id, count(*) AS n FROM ng GROUP BY 1),
        |inter AS (SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS n_inter
        |  FROM ng x JOIN ng y ON x.ng = y.ng AND x.doc_id < y.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b,
        | round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 6) >= 0.08
        |ORDER BY id_a, id_b""".stripMargin,

    "q26_salted_user_stats" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q41_events_window_batch" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q24_label_centroids" ->
      """SELECT label, CAST(count(*) AS BIGINT) AS n,
        | round(avg(list_reduce(list_prepend(0.0,
        |   list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), (s, e) -> s + e)), 4)
        |   AS avg_sq_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q23_cosine_lsh_topk" -> {
      val bucket = (0 until 6).map { p =>
        s"(CASE WHEN ${q23PlaneSql(p)} >= 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }.mkString(" + ")
      s"""WITH vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, $normSql AS nrm, $bucket AS bucket FROM vv),
         |p AS (SELECT x.vec_id AS vec_id, y.vec_id AS neighbor_id,
         |  round($dotSql / (x.nrm * y.nrm), 4) AS sim
         |  FROM n x JOIN n y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (SELECT vec_id, neighbor_id, sim,
         |  CAST(row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC)
         |    AS INTEGER) AS rank FROM p)
         |SELECT vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY vec_id, rank""".stripMargin
    },

    "q27_cosine_ivf_topk" ->
      s"""WITH vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, $normSql AS nrm FROM vv),
         |cent AS (SELECT c, list_transform(generate_series(1, 64), d ->
         |   CAST((CAST(2654435761 AS BIGINT) * (c * 64 + d - 1) + 40503) % 257 - 128 AS DOUBLE) / 256.0) AS cv
         |  FROM (SELECT unnest(generate_series(0, 15)) AS c)),
         |dist AS (SELECT n.vec_id, n.v, n.nrm, cent.c AS cell,
         |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
         |    i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))), (s, e) -> s + e) AS dist
         |  FROM n, cent),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC)
         |  AS INTEGER) AS crank FROM dist),
         |assigned AS (SELECT vec_id, cell, v, nrm FROM rk WHERE crank = 1),
         |probes AS (SELECT vec_id AS q_id, cell FROM rk WHERE crank <= 2),
         |pairs AS (SELECT p.q_id, a.vec_id AS neighbor_id,
         |  round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
         |    i -> q.v[i] * a.v[i])), (s, e) -> s + e) / (q.nrm * a.nrm), 4) AS sim
         |  FROM probes p
         |  JOIN assigned a ON p.cell = a.cell AND p.q_id <> a.vec_id
         |  JOIN assigned q ON q.vec_id = p.q_id),
         |r AS (SELECT q_id, neighbor_id, sim, CAST(row_number() OVER (
         |  PARTITION BY q_id ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank FROM pairs)
         |SELECT q_id AS vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY vec_id, rank""".stripMargin,

    "q28_simhash64" ->
      s"WITH $simhash64Ctes SELECT doc_id, simhash AS simhash64 FROM sh ORDER BY doc_id",

    "q29_simhash64_pairs" ->
      s"""WITH $simhash64Ctes
         |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
         | CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    // ---- extraction-domain closed-form oracles -----------------------------
    // The HTML wrappers in ExtractOps are built so the parsed item tree has
    // exact closed forms: W words -> P=ceil(W/12) paragraphs, H=P//3 section
    // headings, plus nav + h1 + footer (3 items). Invariant columns (covered,
    // roundtrip_ok, recall == 1.0) are the reference's own acceptance bars —
    // the engine must actually achieve them for the hash to match.

    "q30_extract_documents" ->
      """WITH s AS (SELECT doc_id, text,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | 1 AS page_count,
        | CAST(3 + p + p // 3 AS INTEGER) AS item_count,
        | 0 AS table_count,
        | CAST(length(text) AS INTEGER) AS src_chars,
        | TRUE AS covered
        |FROM s ORDER BY url""".stripMargin,

    "q31_audit_synthetic" ->
      """WITH w2 AS (SELECT doc_id, lang,
        |  array_to_string(list_filter(string_split(text, ' '), t -> length(t) >= 2), ' ')
        |    AS text FROM documents),
        |s AS (SELECT doc_id, text, lang,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p,
        |  (doc_id % 5 = 0) AS tbl FROM w2),
        |s2 AS (SELECT *, CAST(p // 3 AS INTEGER) AS h,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(generate_series(1, p // 3),
        |    k -> CAST(9 + length(CAST(k AS VARCHAR)) + length(lang) AS BIGINT))),
        |    (a, b) -> a + b) AS headchars
        |  FROM s)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(1.0 AS DOUBLE) AS "tokenCoverage",
        | CAST(1.0 AS DOUBLE) AS "numericRecall",
        | CAST(1.0 AS DOUBLE) AS "dateRecall",
        | CAST(CASE WHEN tbl THEN 1 ELSE 0 END AS BIGINT) AS "tableCountPdf",
        | CAST(CASE WHEN tbl THEN 1 ELSE 0 END AS BIGINT) AS "tableCountMd",
        | CAST(CASE WHEN tbl THEN 9 ELSE 0 END AS BIGINT) AS "tableCellsPdf",
        | CAST(1 + h AS BIGINT) AS "headingCountPdf",
        | CAST(1 + h AS BIGINT) AS "headingCountMd",
        | CAST((9 + length(CAST(doc_id AS VARCHAR)))
        |   + (CASE WHEN tbl THEN 31 ELSE 0 END)
        |   + (length(text) - (p - 1)) + headchars
        |   + (1 + (CASE WHEN tbl THEN 9 ELSE 0 END) + p + h - 1) AS BIGINT) AS "pdfTextLength",
        | CAST((11 + length(CAST(doc_id AS VARCHAR)))
        |   + (CASE WHEN tbl THEN 95 ELSE 0 END)
        |   + (length(text) - (p - 1)) + headchars + 3 * h
        |   + 2 * (1 + (CASE WHEN tbl THEN 1 ELSE 0 END) + p + h - 1) AS BIGINT) AS "mdTextLength",
        | CAST(0 AS BIGINT) AS "spacedTableCells",
        | CAST(CASE WHEN tbl THEN 9 ELSE 0 END AS BIGINT) AS "totalTableCells",
        | CAST(0 AS BIGINT) AS "spacedTextItems",
        | CAST(0 AS BIGINT) AS "multiSpaceTextItems",
        | CAST(3 + p + h AS BIGINT) AS "totalTextItems"
        |FROM s2 ORDER BY url""".stripMargin,

    "q32_spacing_flags" ->
      """SELECT doc_id, CAST(doc_id % 7 AS INTEGER) AS cls,
        | (doc_id % 7 = 0) AS is_spaced,
        | (doc_id % 7 = 2) AS is_multi_space,
        | (doc_id % 7 = 1) AS is_collapsed,
        | (doc_id % 7 = 0 OR doc_id % 7 = 1) AS needs_fix,
        | CAST(100 - 5 * (doc_id % 3) - CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 0 END AS INTEGER)
        |   AS quality_score,
        | CAST(doc_id % 3 AS INTEGER) AS short_lines,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS INTEGER) AS repeated_lines
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q33_glyph_repair" ->
      """SELECT doc_id,
        | CAST(least(length(text), 80) AS INTEGER) AS phrase_len,
        | CAST(length(rtrim(substr(text, 1, 80))) AS INTEGER) AS rebuilt_len,
        | TRUE AS roundtrip_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q34_multimodal_features" ->
      """WITH b AS (SELECT doc_id, length(text) AS n,
        |  list_transform(string_split(text, ''), c -> ascii(c)) AS codes FROM documents),
        |h AS (SELECT doc_id, n, codes,
        |  CAST(len(list_filter(codes, x -> x // 32 = 0)) AS BIGINT) AS h0,
        |  CAST(len(list_filter(codes, x -> x // 32 = 1)) AS BIGINT) AS h1,
        |  CAST(len(list_filter(codes, x -> x // 32 = 2)) AS BIGINT) AS h2,
        |  CAST(len(list_filter(codes, x -> x // 32 = 3)) AS BIGINT) AS h3,
        |  CAST(len(list_filter(codes, x -> x // 32 = 4)) AS BIGINT) AS h4,
        |  CAST(len(list_filter(codes, x -> x // 32 = 5)) AS BIGINT) AS h5,
        |  CAST(len(list_filter(codes, x -> x // 32 = 6)) AS BIGINT) AS h6,
        |  CAST(len(list_filter(codes, x -> x // 32 = 7)) AS BIGINT) AS h7
        | FROM b)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_bytes,
        | CAST(1 + (codes[1] % 128) AS INTEGER) AS width,
        | CAST(1 + (codes[CAST(n // 2 AS INTEGER) + 1] % 128) AS INTEGER) AS height,
        | h0, h1, h2, h3, h4, h5, h6, h7,
        | CAST(h0*h0 + h1*h1 + h2*h2 + h3*h3 + h4*h4 + h5*h5 + h6*h6 + h7*h7 AS BIGINT) AS sumsq
        |FROM h ORDER BY doc_id""".stripMargin,

    "q35_clean_cells" -> {
      def lit(s: String) = "'" + s.replace("'", "''") + "'"
      val rows = graft.ops.ExtractOps.CleanCellFixtures.zipWithIndex.map {
        case ((dirty, clean, suspect), i) =>
          s"(CAST($i AS BIGINT), ${lit(dirty)}, ${lit(clean)}, $suspect)"
      }.mkString(",\n ")
      s"""SELECT * FROM (VALUES
         | $rows) AS t(cell_id, dirty, clean, still_suspect)
         |ORDER BY cell_id""".stripMargin
    },

    "q36_worst_pages" ->
      """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS w FROM documents),
        |pg AS (SELECT doc_id, w, CAST(p AS INTEGER) AS p, least(12, w - 12 * (p - 1)) AS wp
        |  FROM d, UNNEST(generate_series(1, CAST(ceil(w / 12.0) AS BIGINT))) AS t(p)),
        |cov AS (SELECT doc_id, p,
        |  round(CAST(wp + CASE WHEN (doc_id + p) % 3 = 0 THEN 1 ELSE 3 END AS DOUBLE)
        |    / CAST(wp + 3 AS DOUBLE), 6) AS token_coverage FROM pg),
        |r AS (SELECT 'doc://' || doc_id AS url, p AS page_no, token_coverage,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY token_coverage ASC, p ASC)
        |    AS INTEGER) AS rank FROM cov)
        |SELECT url, page_no, token_coverage, rank FROM r WHERE rank <= 5
        |ORDER BY url, rank""".stripMargin,

    "q37_ocr_merge" ->
      """SELECT doc_id AS pair_id, CAST(doc_id % 3 AS INTEGER) AS cls,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS suspect_replaced,
        | 1 AS spaced_replaced,
        | 0 AS suspect_after
        |FROM documents ORDER BY pair_id""".stripMargin,

    "q38_spacing_fix_flow" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, 1 AS damaged_pages, 1 AS cells_repaired, TRUE AS recovered,
        | CAST(length(array_to_string(w[1:6], ' ')) AS INTEGER) AS phrase_chars
        |FROM d ORDER BY doc_id""".stripMargin,

    "q39_backend_probe" ->
      """SELECT 'doc://' || doc_id AS url,
        | CASE WHEN doc_id % 4 = 0 THEN 'aggressive' ELSE 'standard' END AS chosen,
        | CAST(CASE WHEN doc_id % 4 = 0 THEN 98 ELSE 100 END AS INTEGER) AS score_standard,
        | 100 AS score_aggressive
        |FROM documents ORDER BY url""".stripMargin,

    "q40_doc_json" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(3 + p + p // 3 AS INTEGER) AS item_count,
        | CAST(3 + p + p // 3 AS INTEGER) AS json_items,
        | TRUE AS json_url_ok
        |FROM s ORDER BY url""".stripMargin,

    "q42_pdf_extract" ->
      """WITH s AS (SELECT doc_id, text,
        |  CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INTEGER) AS nl FROM documents)
        |SELECT doc_id, nl AS n_lines, CAST(ceil(nl / 12.0) AS INTEGER) AS n_pages,
        | CAST(length(text) AS INTEGER) AS extracted_chars, TRUE AS roundtrip_ok
        |FROM s ORDER BY doc_id""".stripMargin,

    // parity metrics against the reference's own pinned artifacts
    // (examples/long_report.docling.json transformed by our battery vs the
    // committed examples/long_report.md) — expected values are ground truth
    // measured from those artifacts, like the q35 fixture battery
    // q44 runs the REAL two-channel repair (committed docling tree + the
    // committed PDF's glyph channel through repairDocWithTextLayer): 228
    // glyph reconstructions + 4 text-layer cell fills lift byte-identical
    // parity from 411 to 502 of 555 reference lines; the remaining 53 are
    // classified line-by-line in GOLDEN_RESIDUE.md (OCR-raster-only)
    "q44_reference_golden" ->
      """SELECT * FROM (VALUES ('long_report', 19, 16, 16, 6, 16, TRUE,
        |  228, 4, 502, 555, 5811, 5815))
        | AS t(name, n_pages, n_tables, collapsed, flagship_cols, md_tables,
        |      headings_present, glyph_repaired, cells_filled,
        |      equal_lines, want_lines, tokens_covered, tokens_total)
        |ORDER BY name""".stripMargin,

    // docling-JSON payloads through the distributed pipeline: items = title
    // + P paragraphs (+ 1 table for doc_id%3=0 whose split RON|number pair
    // MUST collapse); coverage is the lossless-extraction invariant
    "q45_docling_pipeline" ->
      """WITH s AS (SELECT doc_id, text,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p FROM documents)
        |SELECT 'doc://' || doc_id AS url, 'docling-json' AS backend,
        | 1 AS page_count,
        | CAST(1 + p + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS item_count,
        | CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS INTEGER) AS table_count,
        | (doc_id % 3 = 0) AS collapsed_pair,
        | TRUE AS covered
        |FROM s ORDER BY url""".stripMargin,

    // KPI caption channel: docs in the doc_id%4 class carry picture region
    // text that the caption pass must attach (items = nav+h1+P+H+footer
    // + picture + caption for that class)
    "q46_kpi_captions" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p FROM documents),
        |s2 AS (SELECT doc_id, p, CAST(p // 3 AS INTEGER) AS h FROM s)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(3 + p + h + CASE WHEN doc_id % 4 = 0 THEN 2 ELSE 0 END AS INTEGER) AS item_count,
        | (doc_id % 4 = 0) AS caption_added
        |FROM s2 ORDER BY url""".stripMargin,

    // connected components over the LSH candidate pairs (dedup keeper
    // assignment): recursive transitive closure in DuckDB mirrors the
    // iterative min-label propagation
    "q47_neardup_components" -> {
      val bandSelects = (0 until Ops.MinhashK by 2).map { j =>
        s"SELECT doc_id, ${j / 2} AS band, CAST(sig_$j AS VARCHAR) || ':' || " +
          s"CAST(sig_${j + 1} AS VARCHAR) AS bkey FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE $minhashCtes,
         |bands AS ($bandSelects),
         |pairs AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |e2 AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |       UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM e2
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e2 e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, min(dst) AS mindst FROM reach GROUP BY src)
         |SELECT d.doc_id,
         |  CAST(coalesce(least(c.doc_id, c.mindst), d.doc_id) AS BIGINT) AS component
         |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // trained-IVF ANN (the production path end-to-end): DuckDB reruns the
    // deterministic k-means bit-exactly — init = first 16 sample vectors by
    // vec_id, 5 Lloyd iterations as a recursive CTE whose folds add in the
    // same IEEE order as the Scala loops — then the same cell equi-join
    // search as q27 against the trained centroids
    "q49_ivf_trained" ->
      s"""WITH RECURSIVE
         |vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |samp AS (SELECT vec_id, v FROM vv ORDER BY vec_id LIMIT 4096),
         |init AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS c, v AS cv
         |         FROM (SELECT vec_id, v FROM samp ORDER BY vec_id LIMIT 16)),
         |km AS (
         |  SELECT 0 AS it, c, cv FROM init
         |  UNION ALL
         |  SELECT it + 1 AS it, c,
         |    CASE WHEN coalesce(len(vs), 0) = 0 THEN oldcv
         |         ELSE list_transform(generate_series(1, 64), i ->
         |           list_reduce(list_prepend(0.0, list_transform(vs, q -> q[i])),
         |             (a, e) -> a + e) / len(vs))
         |    END AS cv
         |  FROM (
         |    SELECT it, c, any_value(cv) AS oldcv,
         |           list(v ORDER BY svid) FILTER (WHERE crank = 1) AS vs
         |    FROM (
         |      SELECT km.it, km.c, km.cv, s.v, s.vec_id AS svid,
         |        row_number() OVER (PARTITION BY s.vec_id ORDER BY
         |          list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
         |            i -> (s.v[i] - km.cv[i]) * (s.v[i] - km.cv[i]))),
         |            (a, e) -> a + e) ASC, km.c ASC) AS crank
         |      FROM km, samp s
         |    ) GROUP BY it, c
         |  ) WHERE it < 5
         |),
         |cent AS (SELECT c, cv FROM km WHERE it = 5),
         |n AS (SELECT vec_id, v, $normSql AS nrm FROM vv),
         |dist AS (SELECT n.vec_id, n.v, n.nrm, cent.c AS cell,
         |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
         |    i -> (n.v[i] - cent.cv[i]) * (n.v[i] - cent.cv[i]))), (s, e) -> s + e) AS dist
         |  FROM n, cent),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC)
         |  AS INTEGER) AS crank FROM dist),
         |assigned AS (SELECT vec_id, cell, v, nrm FROM rk WHERE crank = 1),
         |probes AS (SELECT vec_id AS q_id, cell FROM rk WHERE crank <= 2),
         |pairs AS (SELECT p.q_id, a.vec_id AS neighbor_id,
         |  round(list_reduce(list_prepend(0.0, list_transform(generate_series(1, 64),
         |    i -> q.v[i] * a.v[i])), (s, e) -> s + e) / (q.nrm * a.nrm), 4) AS sim
         |  FROM probes p
         |  JOIN assigned a ON p.cell = a.cell AND p.q_id <> a.vec_id
         |  JOIN assigned q ON q.vec_id = p.q_id),
         |r AS (SELECT q_id, neighbor_id, sim, CAST(row_number() OVER (
         |  PARTITION BY q_id ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank FROM pairs)
         |SELECT q_id AS vec_id, neighbor_id, sim, rank FROM r WHERE rank <= 5
         |ORDER BY vec_id, rank""".stripMargin,

    // docling-schema round trip: export in the reference's --export-json
    // format and re-ingest; item counts follow the q30 closed form and the
    // reparse must be structurally identical
    "q52_docling_roundtrip" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 12.0) AS INTEGER) AS p FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(3 + p + p // 3 AS INTEGER) AS item_count,
        | CAST(3 + p + p // 3 AS INTEGER) AS reparsed_items,
        | TRUE AS roundtrip_ok
        |FROM s ORDER BY url""".stripMargin,

    // corpus-wide paragraph dedup: 12-word paragraph units, polyhash,
    // occurrence counts joined back (C4/RefinedWeb unit-dedup shape)
    "q50_paragraph_dedup" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |paras AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(0, CAST(ceil(len(w)/12.0) AS INTEGER) - 1),
         |    i -> array_to_string(w[i*12+1 : i*12+12], ' '))) AS para FROM d),
         |hashed AS (SELECT doc_id, ${phSql("para")} AS h FROM paras),
         |freq AS (SELECT h, count(*) AS n_occ FROM hashed GROUP BY h),
         |per AS (SELECT doc_id, count(*) AS n_paras,
         |  CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras
         |  FROM hashed JOIN freq USING (h) GROUP BY doc_id)
         |SELECT doc_id, n_paras, n_dup_paras,
         | round(CAST(n_dup_paras AS DOUBLE) / n_paras, 6) AS dup_ratio
         |FROM per ORDER BY doc_id""".stripMargin,

    // within-doc repetition quality signals (duplicate-word fraction,
    // most-common-trigram share)
    "q51_repetition_stats" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |words AS (SELECT doc_id, len(w) AS n_words,
        |  len(list_distinct(w)) AS distinct_words FROM d),
        |tri AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS ng
        |  FROM d, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
        |tc AS (SELECT doc_id, ng, count(*) AS c FROM tri GROUP BY doc_id, ng),
        |ts AS (SELECT doc_id, max(c) AS top_trigram_n,
        |  CAST(sum(c) AS BIGINT) AS trigram_total FROM tc GROUP BY doc_id)
        |SELECT w.doc_id, CAST(w.n_words AS INTEGER) AS n_words,
        | CAST(w.distinct_words AS INTEGER) AS distinct_words,
        | round(1.0 - CAST(w.distinct_words AS DOUBLE) / w.n_words, 6) AS dup_word_ratio,
        | ts.top_trigram_n, ts.trigram_total,
        | round(CAST(ts.top_trigram_n AS DOUBLE) / ts.trigram_total, 6) AS top_trigram_ratio
        |FROM words w JOIN ts ON w.doc_id = ts.doc_id
        |ORDER BY w.doc_id""".stripMargin,

    // two-channel repair: every row's letter-spaced text item must be
    // reconstructed exactly from the PDF glyph channel (the reference's
    // pymupdf repair invariant: needs_spacing_fix == false after repair)
    "q48_two_channel_repair" ->
      """SELECT doc_id, 1 AS text_items_repaired, TRUE AS recovered,
        | TRUE AS damage_cleared, TRUE AS md_has_phrase
        |FROM documents ORDER BY doc_id""".stripMargin,

    // PdfLayout clusters a page's evenly-spaced line grid into ONE text
    // block, so item_count == page_count on this synthetic corpus
    "q43_pdf_pipeline" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INTEGER) AS nl FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS page_count,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS item_count,
        | TRUE AS covered
        |FROM s ORDER BY url""".stripMargin,

    // Gopher/C4-class keep/drop quality gate: token bounds, mean-word-length
    // band, TTR floor; deterministic first-failing-rule reason. Signals are
    // exact integer ratios so the doubles match bit-for-bit.
    "q56_quality_filter" ->
      """WITH s AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  len(text) AS nc
        | FROM documents),
        |t AS (SELECT doc_id, n_tokens,
        |  CAST(nc - (n_tokens - 1) AS DOUBLE) / n_tokens AS mwl,
        |  CAST(n_distinct AS DOUBLE) / n_tokens AS ttr_raw
        | FROM s),
        |r AS (SELECT doc_id, n_tokens, mwl, ttr_raw,
        |  CASE WHEN n_tokens < 30 THEN 'too_short'
        |       WHEN n_tokens > 5000 THEN 'too_long'
        |       WHEN mwl < 3.0 OR mwl > 10.0 THEN 'word_len'
        |       WHEN ttr_raw < 0.35 THEN 'repetitive'
        |       ELSE '' END AS drop_reason
        | FROM t)
        |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        | round(mwl, 6) AS mean_word_len,
        | round(ttr_raw, 6) AS ttr,
        | (drop_reason = '') AS keep, drop_reason
        |FROM r ORDER BY doc_id""".stripMargin,

    // q43's geometry through MODERN PDF 1.5 files (ObjStm dict objects,
    // Flate content, PNG-predictor xref stream, no classic xref/trailer) —
    // identical closed forms, different reader path under test
    "q55_pdf15_pipeline" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INTEGER) AS nl FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS page_count,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS item_count,
        | TRUE AS covered
        |FROM s ORDER BY url""".stripMargin,

    // kill-and-resume lineage invariant: after a partial commit, an orphaned
    // uncommitted bucket write, a resume, and a no-op rerun, the committed
    // output must hold each input doc exactly once across exactly 3
    // snapshots — every closed form below breaks if resume loses, duplicates
    // or re-extracts work
    "q53_lineage_resume" ->
      """SELECT CAST(count(*) AS BIGINT) AS committed_docs,
        | CAST(count(*) AS BIGINT) AS distinct_urls,
        | CAST(count(*) AS BIGINT) AS docs_run12,
        | CAST(0 AS BIGINT) AS docs_run3,
        | CAST(3 AS BIGINT) AS snapshots
        |FROM documents""".stripMargin,

    // page_range=(2,3) / max_num_pages=2 scan pruning over the q42 PDF
    // geometry (8-word lines, 12 lines/page) + the three picture render
    // modes (placeholder | referenced | embedded-with-fallback)
    "q54_page_range_image_modes" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(ceil(len(string_split(text, ' ')) / 8.0) / 12.0) AS INTEGER) AS n
        |  FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CAST(CASE WHEN n >= 2 THEN least(3, n) - 1 ELSE 0 END AS INTEGER) AS pr_pages,
        | CAST(least(n, 2) AS INTEGER) AS mp_pages,
        | n AS full_pages,
        | CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER) AS img_placeholder,
        | CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END AS INTEGER) AS img_referenced,
        | CAST(CASE WHEN doc_id % 8 = 0 THEN 1 ELSE 0 END AS INTEGER) AS img_embedded
        |FROM s ORDER BY url""".stripMargin,

    // streaming extraction parity: the foreachBatch sink must hold every url
    // exactly once (idempotent batch dirs + checkpointed offsets) with
    // markdown byte-identical to the batch pipeline's
    "q57_streaming_parity" ->
      """SELECT 'doc://' || doc_id AS url, TRUE AS streamed_once,
        | TRUE AS md_match
        |FROM documents ORDER BY url""".stripMargin,

    // typed-UDAF fold == doc-local audit loop, counter for counter, through
    // a real shuffle (associativity/commutativity of the damage counters)
    "q58_audit_aggregator" ->
      """SELECT 'doc://' || doc_id AS url, TRUE AS agg_matches_doc
        |FROM documents ORDER BY url""".stripMargin,

    // encrypted corpus (q55 geometry; doc_id % 3 selects RC4-128 / AES-128 /
    // AES-256-R6): a failing handler zeroes coverage and breaks the forms
    "q59_encrypted_pipeline" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INTEGER) AS nl FROM documents)
        |SELECT 'doc://' || doc_id AS url,
        | CASE doc_id % 3 WHEN 0 THEN 'rc4' WHEN 1 THEN 'aesv2' ELSE 'aesv3' END AS cipher,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS page_count,
        | CAST(ceil(nl / 12.0) AS INTEGER) AS item_count,
        | TRUE AS covered
        |FROM s ORDER BY url""".stripMargin,

    // Boilerpipe NumWordsRulesClassifier: kept = fixed lead + ceil(w/20)
    // paragraphs; both link lists and the neighbor-stranded teaser dropped
    "q60_boilerpipe_classifier" ->
      """SELECT 'doc://' || doc_id AS url,
        | CAST(1 + ceil(len(list_filter(string_split(text, ' '), w -> len(w) > 0)) / 20.0) AS BIGINT) AS kept_blocks,
        | TRUE AS link_lists_dropped, TRUE AS teaser_dropped, TRUE AS lead_kept
        |FROM documents ORDER BY url""".stripMargin,

    // canonical-url dedup: five cosmetic variants per page (case, fragment,
    // default port, tracking params + order, trailing slash) must collapse
    // to the closed-form canonical; group stats by underlying page id
    "q61_url_canonical_dedup" ->
      """SELECT 'https://example-' || (doc_id // 5) || '.ro/articol/' || (doc_id // 5)
        |   || '?a=1&b=2' AS canonical_url,
        | CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS min_doc_id
        |FROM documents GROUP BY doc_id // 5 ORDER BY canonical_url""".stripMargin,

    // WARC container round trip (plain + per-file gzip segments, full HTTP
    // payloads): byte-exact html, exact WARC-Date, successful extraction
    "q62_warc_ingest" ->
      """SELECT 'https://crawl.example/doc/' || doc_id AS url,
        | TRUE AS html_roundtrip, TRUE AS ts_roundtrip, TRUE AS extracted_ok
        |FROM documents ORDER BY url""".stripMargin,

    // head metadata: canonical link collapsed through UrlCanonical; robots
    // noindex/nofollow on the doc_id % 7 class; declared lang matches; the
    // post-<body> decoy canonical must be ignored
    "q63_head_meta" ->
      """SELECT 'doc://' || doc_id AS url,
        | 'https://example-' || (doc_id // 5) || '.ro/articol/' || (doc_id // 5)
        |   || '?a=1&b=2' AS canonical_url,
        | doc_id % 7 = 0 AS noindex, doc_id % 7 = 0 AS nofollow,
        | TRUE AS lang_match
        |FROM documents ORDER BY url""".stripMargin,

    // BPE-ish token counting: the SAME lookahead-free GPT-2-style regex in
    // RE2 -- leftmost-first alternation matches Java's, so counts are exact
    "q64_bpe_token_stats" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        | CAST(len(regexp_extract_all(text,
        |   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS INTEGER) AS bpe_tokens,
        | CAST(len(text) AS INTEGER) AS n_chars,
        | round(len(regexp_extract_all(text,
        |   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) * 1.0
        |   / len(string_split(text, ' ')), 6) AS bpe_per_ws
        |FROM documents ORDER BY doc_id""".stripMargin,

    // char-trigram LID generalization: held-out test sentences (disjoint
    // from the profile seeds) must classify back to their language
    "q65_ngram_langid" ->
      """WITH c AS (SELECT doc_id,
        |  ['de','en','es','fr','ro'][CAST(doc_id % 5 AS INTEGER) + 1] AS expected
        |  FROM documents)
        |SELECT doc_id, expected, expected AS predicted, TRUE AS correct
        |FROM c ORDER BY doc_id""".stripMargin,

    // gap-based sessionization (30-min gap): the flatMapGroupsWithState
    // streaming fold must equal this relational definition exactly
    "q66_streaming_sessions" ->
      """WITH x AS (SELECT user_id, ts, value, event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 4) AS sum_value, TRUE AS stream_match
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    // full dedup chain closed form: exact classes {4g,4g+1} and {4g+2,4g+3}
    // share a trigram SET (identical minhash) -> LSH bridges the reps ->
    // every member's canonical is the group's min id
    "q67_dedup_chain" ->
      """SELECT doc_id, (doc_id // 4) * 4 AS canonical_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // streaming LSH pair set == the q18 relation, recomputed from scratch
    "q68_streaming_lsh" -> {
      val bandSelects = (0 until Ops.MinhashK by 2).map { j =>
        s"SELECT doc_id, ${j / 2} AS band, CAST(sig_$j AS VARCHAR) || ':' || " +
          s"CAST(sig_${j + 1} AS VARCHAR) AS bkey FROM sig"
      }.mkString(" UNION ALL ")
      s"""WITH $minhashCtes,
         |bands AS ($bandSelects)
         |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b, TRUE AS stream_match
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
         |ORDER BY id_a, id_b""".stripMargin
    },
  )
}
