package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PolyHash.polyhash

/** Relational + training-data operator battery over the driver testdata
  * tables. Every oracle-checked query here has a DuckDB-equivalent SQL in
  * SparkEntry.oracleSql with identical column names, rounding, and total
  * ordering.
  *
  * Scale notes (the 100 TB plan, per query):
  *  - aggregations: partial (map-side) aggregation is automatic; group keys
  *    are low-cardinality -> tiny shuffles.
  *  - joins: dimension tables (region/nation/customer at ratio scale) are
  *    broadcast; fact-fact joins shuffle on the join key once.
  *  - dedup/minhash/simhash: explode-then-aggregate shapes with map-side
  *    combine; candidate pairs come from LSH band buckets, never a cross
  *    join.
  *  - ANN: brute-force top-k is the small-side baseline; the LSH-bucketed
  *    variant is the scale path (bucket join instead of cross join).
  */
object Ops {
  private def lineitem(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def orders(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def customer(s: SparkSession, dir: String) = s.read.parquet(s"$dir/customer.parquet")
  private def nation(s: SparkSession, dir: String) = s.read.parquet(s"$dir/nation.parquet")
  private def region(s: SparkSession, dir: String) = s.read.parquet(s"$dir/region.parquet")
  private def part(s: SparkSession, dir: String) = s.read.parquet(s"$dir/part.parquet")
  private def supplier(s: SparkSession, dir: String) = s.read.parquet(s"$dir/supplier.parquet")
  private def events(s: SparkSession, dir: String) = s.read.parquet(s"$dir/events.parquet")
  private def documents(s: SparkSession, dir: String) = s.read.parquet(s"$dir/documents.parquet")
  private def embeddings(s: SparkSession, dir: String) = s.read.parquet(s"$dir/embeddings.parquet")

  // ---- relational core ----------------------------------------------------

  /** TPC-H Q1-shaped pricing summary. Map-side partial agg; 6-group output. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** Star join: orders -> customer -> nation -> region, dims broadcast. */
  def q02RevenueByNation(s: SparkSession, dir: String): DataFrame =
    orders(s, dir)
      .join(customer(s, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy($"r_name", $"n_name")

  /** Top-3 orders per customer: single hash-partition window, deterministic
    * tiebreak on orderkey. */
  def q03TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 2).as("totalprice"), $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Anti join: customers with no orders, by segment. */
  def q04CustomersWithoutOrders(s: SparkSession, dir: String): DataFrame =
    customer(s, dir)
      .join(orders(s, dir), $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")

  /** Tumbling 1h event aggregation (batch form of the streaming query). */
  def q05EventsHourly(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"),
        round(avg($"value"), 6).as("avg_value"))
      .orderBy($"hour_start", $"event_type")

  /** Semi-join + agg: parts that ship (exist in lineitem), stats by brand. */
  def q06PartBrandStats(s: SparkSession, dir: String): DataFrame =
    part(s, dir)
      .join(lineitem(s, dir).select($"l_partkey").distinct(), $"p_partkey" === $"l_partkey", "left_semi")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"),
        round(avg($"p_retailprice"), 4).as("avg_price"),
        round(min($"p_retailprice"), 2).as("min_price"),
        round(max($"p_retailprice"), 2).as("max_price"))
      .orderBy($"p_brand")

  /** Grouped JSON extraction over events.props. */
  def q07EventProps(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        round(avg($"k"), 6).as("avg_k"))
      .orderBy($"event_type")

  // ---- text analysis over documents ----------------------------------------

  /** Token counting (whitespace tokenizer) + length stats. */
  def q10TokenStats(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).as("n_tokens"),
        length($"text").as("n_chars"))
      .withColumn("avg_token_len",
        round((($"n_chars" - ($"n_tokens" - lit(1))).cast("double")) / $"n_tokens", 6))
      .orderBy($"doc_id")

  /** Quality scoring: stopword ratio + type-token ratio + length bucket. */
  def q11QualityScore(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"), length($"text").as("n_chars"))
      .select($"doc_id",
        size($"w").as("n_tokens"),
        size(array_distinct($"w")).as("n_distinct"),
        size(filter($"w", t => t === "the" || t === "a")).as("n_stop"),
        $"n_chars")
      .withColumn("stop_ratio", round($"n_stop".cast("double") / $"n_tokens", 6))
      .withColumn("ttr", round($"n_distinct".cast("double") / $"n_tokens", 6))
      .withColumn("len_bucket", floor($"n_chars" / 100))
      .orderBy($"doc_id")

  /** Language ID by stopword-profile argmax (deterministic lexicographic
    * tiebreak). Profiles are real function-word sets per language. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "ro" -> Seq("si", "de", "la", "cu", "este"))

  def q12LangId(s: SparkSession, dir: String): DataFrame = {
    val base = documents(s, dir).select($"doc_id", $"lang", split($"text", " ").as("w"))
    val scored = LangProfiles.foldLeft(base) { case (df, (code, words)) =>
      df.withColumn(s"s_$code",
        size(filter($"w", t => words.map(lit(_) === t).reduce(_ || _))))
    }
    // argmax with lexicographic tiebreak: first profile whose score >= all others
    val predicted = LangProfiles.map(_._1).foldRight(lit("zz")) { case (code, rest) =>
      val ge = LangProfiles.map(_._1).filter(_ != code)
        .map(o => col(s"s_$code") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(code)).otherwise(rest)
    }
    val outCols = Seq(col("doc_id"), col("lang"), col("predicted")) ++
      LangProfiles.map { case (c, _) => col(s"s_$c") }
    scored.withColumn("predicted", predicted)
      .select(outCols: _*)
      .orderBy($"doc_id")
  }

  // ---- deduplication -------------------------------------------------------

  /** Exact dedup via the portable polyhash (also a per-row check of the
    * custom codegen'd Expression against the oracle's SQL fold). */
  def q13ExactHash(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select($"doc_id", polyhash($"text").as("text_hash"))
      .orderBy($"doc_id")

  def q14ExactDedupGroups(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .groupBy(polyhash($"text").as("text_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy($"text_hash")

  /** Distinct word-3-gram sets per doc (shared by jaccard + fingerprint). */
  private def ngrams3(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3) // sequence(0, negative) would DESCEND in Spark
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("ng"))
      .distinct()

  /** N-gram Jaccard near-dup pairs (relational set-overlap formulation:
    * shuffle on ngram, never a cross join). */
  def q15NgramJaccardPairs(s: SparkSession, dir: String, threshold: Double = 0.08): DataFrame = {
    val ng = ngrams3(s, dir).cache()
    val sizes = ng.groupBy($"doc_id").agg(count(lit(1)).as("n_ng"))
    val inter = ng.as("x").join(ng.as("y"), col("x.ng") === col("y.ng") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_ng", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_ng", "n_b"), "id_b")
      .withColumn("jaccard", round($"n_inter".cast("double") /
        ($"n_a" + $"n_b" - $"n_inter"), 6))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  /** Winnowing-style document fingerprint: min 4-token-shingle hash. */
  def q16Fingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 4) // mirror the oracle's guard; see ngrams3
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w)-4), i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3]))")).as("sh"))
      .groupBy($"doc_id")
      .agg(min(polyhash($"sh")).as("fingerprint"))
      .orderBy($"doc_id")

  // minhash parameters (fixed, mirrored in the oracle SQL)
  val MinhashK = 8
  val MinhashP = 2147483647L // 2^31-1
  def minhashA(j: Int): Long = 2L * j + 3
  def minhashB(j: Int): Long = 5L * j + 7

  /** MinHash signatures over distinct word-3-gram shingles. */
  def q17MinhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val toks = ngrams3(s, dir)
      .select($"doc_id", polyhash($"ng").as("h"))
    val aggs = (0 until MinhashK).map { j =>
      min(pmod(lit(minhashA(j)) * $"h" + lit(minhashB(j)), lit(MinhashP))).as(s"sig_$j")
    }
    toks.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*).orderBy($"doc_id")
  }

  /** LSH candidate pairs: 4 bands x 2 rows — bucket join, not cross join. */
  def q18MinhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = q17MinhashSignatures(s, dir)
    val bands = (0 until MinhashK by 2).map { j =>
      sig.select($"doc_id", lit(j / 2).as("band"),
        concat_ws(":", col(s"sig_$j"), col(s"sig_${j + 1}")).as("bkey"))
    }.reduce(_ unionAll _)
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .orderBy($"id_a", $"id_b")
  }

  val SimhashBits = 16

  /** SimHash over distinct word-3-gram shingle hashes (16-bit for oracle
    * portability; the same shape extends to 64-bit). */
  def q19Simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = ngrams3(s, dir)
      .select($"doc_id", polyhash($"ng").as("h"))
    val votes = (0 until SimhashBits).map { j =>
      sum(when(shiftright($"h", j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v_$j")
    }
    val voted = toks.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until SimhashBits).map { j =>
      when(col(s"v_$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select($"doc_id", sim.as("simhash")).orderBy($"doc_id")
  }

  /** SimHash near-dup pairs by Hamming distance <= 3. */
  def q20SimhashPairs(s: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val sh = q19Simhash(s, dir)
    sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .filter($"hamming" <= maxDist)
      .orderBy($"id_a", $"id_b")
  }

  // ---- similarity search over embeddings ------------------------------------

  private def vecsD(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir).select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("v"))

  private val dotExpr = "aggregate(zip_with(x.v, y.v, (a, b) -> a * b), 0D, (s, e) -> s + e)"
  private val normExpr = "sqrt(aggregate(transform(v, a -> a * a), 0D, (s, e) -> s + e))"

  /** Brute-force cosine top-k (the correctness baseline for ANN). */
  def q21CosineTopK(s: SparkSession, dir: String, k: Int = 5, limitIds: Int = 200): DataFrame = {
    val v = vecsD(s, dir).withColumn("nrm", expr(normExpr))
    val queries = v.filter($"vec_id" < limitIds)
    val pairs = queries.as("x").join(v.as("y"), col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"),
        round(expr(dotExpr) / (col("x.nrm") * col("y.nrm")), 4).as("sim"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"neighbor_id".asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .orderBy($"vec_id", $"rank")
  }

  /** Near-duplicate embedding pairs above a cosine threshold. */
  def q22CosineNearDup(s: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val v = vecsD(s, dir).withColumn("nrm", expr(normExpr))
    v.as("x").join(v.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round(expr(dotExpr) / (col("x.nrm") * col("y.nrm")), 4).as("sim"))
      .filter($"sim" >= threshold)
      .orderBy($"id_a", $"id_b")
  }

  /** Scale-path ANN: sign-LSH bucketing on deterministic pseudo-random
    * hyperplanes (seeded per (plane, dim) — no RNG state), then top-k within
    * bucket only. Trades recall for a bucket join instead of a cross join. */
  def q23CosineLshTopK(s: SparkSession, dir: String, planes: Int = 6, k: Int = 5): DataFrame = {
    val v = vecsD(s, dir).withColumn("nrm", expr(normExpr))
    // hyperplane component (p, i) = sin(p * 64 + i) — deterministic, portable
    val sigCols = (0 until planes).map { p =>
      val dot = expr(s"aggregate(zip_with(v, sequence(0, 63), (a, i) -> a * sin($p * 64 + i)), 0D, (s, e) -> s + e)")
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bucketed = v.withColumn("bucket", sigCols)
    val pairs = bucketed.as("x").join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"),
        round(expr(dotExpr) / (col("x.nrm") * col("y.nrm")), 4).as("sim"))
    val w = Window.partitionBy($"vec_id").orderBy($"sim".desc, $"neighbor_id".asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .orderBy($"vec_id", $"rank")
  }

  /** Embedding label stats (centroid norms per label). */
  def q24LabelCentroids(s: SparkSession, dir: String): DataFrame =
    embeddings(s, dir)
      .select($"label", $"embedding")
      .groupBy($"label")
      .agg(count(lit(1)).as("n"),
        round(avg(expr("aggregate(transform(embedding, x -> cast(x as double) * x), 0D, (s, e) -> s + e)")), 4)
          .as("avg_sq_norm"))
      .orderBy($"label")


  /** Scale-path near-dup: drop non-discriminative shingles (doc-freq > cap)
    * before the pair join — the standard bound on join blowup for shared-
    * vocabulary corpora. Same relational shape as q15, skew-pruned. */
  def q25NgramJaccardPruned(s: SparkSession, dir: String, threshold: Double = 0.08,
                            maxDocFreq: Int = 50): DataFrame = {
    val ng = documents(s, dir)
      .select($"doc_id", split($"text", " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("ng"))
      .distinct()
    val rare = ng.groupBy($"ng").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDocFreq)
      .select($"ng")
    val pruned = ng.join(rare, "ng")
    val sizes = pruned.groupBy($"doc_id").agg(count(lit(1)).as("n_ng"))
    val inter = pruned.as("x").join(pruned.as("y"), col("x.ng") === col("y.ng") &&
        col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_ng", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_ng", "n_b"), "id_b")
      .withColumn("jaccard", round($"n_inter".cast("double") /
        ($"n_a" + $"n_b" - $"n_inter"), 6))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
      .orderBy($"id_a", $"id_b")
  }

  /** Skew pattern: two-phase salted aggregation over a hot grouping key.
    * Phase 1 aggregates (key, salt) partials; phase 2 merges per key —
    * identical result to a direct groupBy, bounded per-task state. */
  def q26SaltedUserStats(s: SparkSession, dir: String, salts: Int = 16): DataFrame =
    events(s, dir)
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(salts)))
      .groupBy($"user_id", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"value").as("psum"))
      .groupBy($"user_id")
      .agg(sum($"pn").as("n_events"), round(sum($"psum"), 4).as("sum_value"))
      .orderBy($"user_id")


  /** IVF ANN scale path: deterministic k-means coarse quantizer (seeded init
    * from the first k vectors, fixed 5 Lloyd iterations — no RNG), vectors
    * assigned to their nearest centroid cell, top-k search probes only the
    * nprobe nearest cells. Centroids are tiny -> broadcast; the probe join is
    * a cell-key equi-join, never a cross join. */
  def q27CosineIvfTopK(s: SparkSession, dir: String, k: Int = 5,
                       cells: Int = 16, nprobe: Int = 2): DataFrame = {
    import s.implicits._
    val vecs = embeddings(s, dir).select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, e) => (id, e.map(_.toDouble).toArray) }
      .collect() // small at test SF; at scale: sample for training, then broadcast centroids
    if (vecs.isEmpty)
      return s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("neighbor_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sim", org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("rank", org.apache.spark.sql.types.IntegerType))))
    val dim = vecs.head._2.length
    val nCells = math.min(cells, vecs.length)
    // deterministic k-means
    var centroids = vecs.sortBy(_._1).take(nCells).map(_._2.clone())
    for (_ <- 0 until 5) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      for ((_, v) <- vecs) {
        val c = nearestCell(v, centroids, 1).head
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    val bc = s.sparkContext.broadcast(centroids)

    val assigned = embeddings(s, dir).select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, e) =>
        val v = e.map(_.toDouble).toArray
        val cell = nearestCell(v, bc.value, 1).head
        val nrm = math.sqrt(v.map(x => x * x).sum)
        (id, cell, v, nrm)
      }.toDF("vec_id", "cell", "v", "nrm")

    val probes = embeddings(s, dir).select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .flatMap { case (id, e) =>
        val v = e.map(_.toDouble).toArray
        nearestCell(v, bc.value, nprobe).map(c => (id, c))
      }.toDF("q_id", "cell")

    val qside = assigned.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = probes.join(assigned, "cell")
      .filter(col("q_id") =!= col("vec_id"))
      .join(qside, "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, e) -> s + e)") /
          (col("qnrm") * col("nrm")), 4).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
  }


  /** 64-bit SimHash (the production width; q19's 16-bit variant exists for
    * oracle portability). Four derived hash views contribute 16 genuinely
    * varying bits each — polyhash < 2^30 means its high bits are constant,
    * so bits must come from the LOW 16 of each derived value. */
  def q28Simhash64(s: SparkSession, dir: String): DataFrame = {
    val toks = ngrams3(s, dir).select($"doc_id", polyhash($"ng").as("h"))
    val views = (0 until 4).map { k =>
      pmod(lit(2L * k + 3) * $"h" + lit(7L * k + 11), lit(MinhashP))
    }
    val votes = for (k <- 0 until 4; j <- 0 until 16) yield
      sum(when(shiftright(views(k), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"v_${k * 16 + j}")
    val voted = toks.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map(b => when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select($"doc_id", sim.as("simhash64")).orderBy($"doc_id")
  }

  /** nearest `n` centroid indices by L2 (deterministic tiebreak on index). */
  private def nearestCell(v: Array[Double], centroids: Array[Array[Double]], n: Int): Seq[Int] = {
    centroids.indices
      .map { c =>
        var dist = 0.0
        val cv = centroids(c)
        var d = 0
        while (d < v.length) { val diff = v(d) - cv(d); dist += diff * diff; d += 1 }
        (dist, c)
      }
      .sortBy(identity)
      .take(n).map(_._2)
  }

  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.parts.mkString)
  }
}
