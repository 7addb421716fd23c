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
    "q26_salted_user_stats" -> ((s, d) => Ops.q26SaltedUserStats(s, d)),
    // extraction-domain (rows-only: engine-native semantics)
    "q30_extract_documents" -> (ExtractOps.extractDocuments(_, _)),
    "q31_audit_synthetic" -> ((s, _) => ExtractOps.auditSynthetic(s)),
    "q32_spacing_flags" -> (ExtractOps.spacingFlags(_, _)),
    "q33_glyph_repair" -> (ExtractOps.glyphRepair(_, _)),
    "q34_multimodal_features" -> (ExtractOps.multimodalFeatures(_, _)),
    "q35_clean_cells" -> (ExtractOps.cleanCells(_, _)),
    "q36_worst_pages" -> ((s, _) => ExtractOps.worstPages(s)),
    "q37_ocr_merge" -> ((s, _) => ExtractOps.ocrMerge(s)),
    "q38_spacing_fix_flow" -> (ExtractOps.spacingFixFlow(_, _)),
    "q39_backend_probe" -> ((s, _) => ExtractOps.backendProbe(s)),
    "q40_doc_json" -> ((s, _) => ExtractOps.docJson(s)),
    "q41_events_window_batch" -> ((s, d) => graft.streaming.EventStream.batch(s, d)),
    "q42_pdf_extract" -> (ExtractOps.pdfExtract(_, _)),
    "q43_pdf_pipeline" -> ((s, _) => ExtractOps.pdfPipeline(s)),
  )

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
  )
}
