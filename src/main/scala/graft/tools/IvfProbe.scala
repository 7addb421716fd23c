package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolate the cost of the row-local IVF cell ranking vs the
  * crossJoin+window formulation. Usage: runMain graft.tools.IvfProbe [sfDir] */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    val cb = typedLit(codebook.map(_.toIndexedSeq).toIndexedSeq)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      val t1 = System.nanoTime(); val n2 = f
      println(f"$label rows=$n/$n2 pass1=${(t1 - t0) / 1e9}%.3f pass2=${(System.nanoTime() - t1) / 1e9}%.3f")
    }

    time("scan-only") { vecs.count() }
    time("rowlocal-sorted") {
      vecs.withColumn("cbk", cb)
        .withColumn("sorted", expr(
          "array_sort(transform(sequence(0, 15), c -> named_struct(" +
            "'dist', aggregate(zip_with(v, cbk[c], (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e), " +
            "'cell', c)))"))
        .select(col("vec_id"), col("sorted")(0)("cell").as("cell"))
        .count()
    }
    time("rowlocal-nocbkcol") {
      // codebook inlined per-cell (16 independent folds, no array-of-array col)
      val dists = (0 until 16).map { c =>
        val lit64 = typedLit(codebook(c).toIndexedSeq)
        struct(aggregate(zip_with(col("v"), lit64, (a, b) => (a - b) * (a - b)),
          lit(0d), (s, e) => s + e).as("dist"), lit(c).as("cell"))
      }
      vecs.withColumn("sorted", array_sort(array(dists: _*)))
        .select(col("vec_id"), col("sorted")(0)("cell").as("cell"))
        .count()
    }
    import spark.implicits._
    time("crossjoin-window") {
      val cent = broadcast(codebook.zipWithIndex.map { case (cv, c) => (c, cv) }.toDF("cell", "cv"))
      val wDist = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("dist").asc, col("cell").asc)
      vecs.crossJoin(cent)
        .withColumn("dist", expr(
          "aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e)"))
        .withColumn("crank", row_number().over(wDist))
        .filter(col("crank") <= 2)
        .count()
    }
    spark.stop()
  }
}

/** Stage-by-stage timing of the new ivfTopK. */
object IvfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    // warm
    graft.ops.Ops.ivfTopK(spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v")),
      codebook, 5, 2).count()
    for (i <- 1 to 3) {
      val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      t(s"full-ivfTopK-$i") { graft.ops.Ops.ivfTopK(vecs, codebook, 5, 2).count() }
    }
    spark.stop()
  }
}

/** Per-stage decomposition of the new ivfTopK body. */
object IvfProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val normExpr = "sqrt(aggregate(transform(v, a -> a * a), 0D, (s, e) -> s + e))"
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val v = vecs.withColumn("nrm", expr(normExpr))
    val cb = typedLit(codebook.map(_.toIndexedSeq).toIndexedSeq)
    val ranked = v.withColumn("cbk", cb)
      .withColumn("sorted", expr(
        "array_sort(transform(sequence(0, 15), c -> named_struct(" +
          "'dist', aggregate(zip_with(v, cbk[c], (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e), " +
          "'cell', c)))"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("sorted")(0)("cell").as("cell"),
        expr("transform(slice(sorted, 1, 2), x -> x.cell)").as("probe_cells"))
      .cache()
    t("materialize-ranked") { ranked.count() }
    val assigned = ranked.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
    val probes = ranked.select(col("vec_id").as("q_id"), explode(col("probe_cells")).as("cell"))
    val qside = ranked.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    t("probes-count") { probes.count() }
    val joined = probes.join(assigned, "cell").filter(col("q_id") =!= col("vec_id"))
    t("join1-count") { joined.count() }
    val pairs = joined.join(qside, "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, e) -> s + e)") /
          (col("qnrm") * col("nrm")), 4).as("sim"))
    t("pairs-count") { pairs.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id").as("vec_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
    t("out-count") { out.count() }
    t("out-localCheckpoint") { out.localCheckpoint().count() }
    ranked.unpersist()
    spark.stop()
  }
}

/** Counts + plan for the expensive window stage. */
object IvfProbe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    val normExpr = "sqrt(aggregate(transform(v, a -> a * a), 0D, (s, e) -> s + e))"
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val v = vecs.withColumn("nrm", expr(normExpr))
    val cb = typedLit(codebook.map(_.toIndexedSeq).toIndexedSeq)
    val ranked = v.withColumn("cbk", cb)
      .withColumn("sorted", expr(
        "array_sort(transform(sequence(0, 15), c -> named_struct(" +
          "'dist', aggregate(zip_with(v, cbk[c], (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e), " +
          "'cell', c)))"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("sorted")(0)("cell").as("cell"),
        expr("transform(slice(sorted, 1, 2), x -> x.cell)").as("probe_cells"))
      .cache()
    ranked.count()
    val assigned = ranked.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
    val probes = ranked.select(col("vec_id").as("q_id"), explode(col("probe_cells")).as("cell"))
    val qside = ranked.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val joined = probes.join(assigned, "cell").filter(col("q_id") =!= col("vec_id"))
    println("join1 rows = " + joined.count())
    val pairs = joined.join(qside, "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, e) -> s + e)") /
          (col("qnrm") * col("nrm")), 4).as("sim"))
    println("pairs rows = " + pairs.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id").as("vec_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
    out.explain("formatted")
    spark.stop()
  }
}

/** Bisect the window/orderBy cost. */
object IvfProbe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val normExpr = "sqrt(aggregate(transform(v, a -> a * a), 0D, (s, e) -> s + e))"
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val v = vecs.withColumn("nrm", expr(normExpr))
    val cb = typedLit(codebook.map(_.toIndexedSeq).toIndexedSeq)
    val rankedPlan = v.withColumn("cbk", cb)
      .withColumn("sorted", expr(
        "array_sort(transform(sequence(0, 15), c -> named_struct(" +
          "'dist', aggregate(zip_with(v, cbk[c], (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e), " +
          "'cell', c)))"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("sorted")(0)("cell").as("cell"),
        expr("transform(slice(sorted, 1, 2), x -> x.cell)").as("probe_cells"))
    t("ranked-nocache-count") { rankedPlan.count() }
    t("ranked-nocache-count2") { rankedPlan.count() }
    val ranked = rankedPlan.cache()
    t("ranked-cache-materialize") { ranked.count() }
    t("ranked-cache-reread") { ranked.count() }
    val assigned = ranked.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
    val probes = ranked.select(col("vec_id").as("q_id"), explode(col("probe_cells")).as("cell"))
    val qside = ranked.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = probes.join(assigned, "cell").filter(col("q_id") =!= col("vec_id"))
      .join(qside, "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, e) -> s + e)") /
          (col("qnrm") * col("nrm")), 4).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val ranked5 = pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    t("window-nosort-count") { ranked5.count() }
    t("window-nosort-count2") { ranked5.count() }
    t("window-sort-count") { ranked5.orderBy(col("q_id"), col("rank")).count() }
    t("window-sort-count2") { ranked5.orderBy(col("q_id"), col("rank")).count() }
    spark.stop()
  }
}

/** Warm per-stage timing of the CURRENT ivfTopK shape (with repartition). */
object IvfProbe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val codebook = graft.ops.Ops.ivfCodebook(16)
    def t[A](label: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    val normExpr = "sqrt(aggregate(transform(v, a -> a * a), 0D, (s, e) -> s + e))"
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val v = vecs.withColumn("nrm", expr(normExpr))
    val cb = typedLit(codebook.map(_.toIndexedSeq).toIndexedSeq)
    val rankedPlan = v.withColumn("cbk", cb)
      .withColumn("sorted", expr(
        "array_sort(transform(sequence(0, 15), c -> named_struct(" +
          "'dist', aggregate(zip_with(v, cbk[c], (a, b) -> (a - b) * (a - b)), 0D, (s, e) -> s + e), " +
          "'cell', c)))"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("sorted")(0)("cell").as("cell"),
        expr("transform(slice(sorted, 1, 2), x -> x.cell)").as("probe_cells"))
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    val ranked = rankedPlan.cache()
    t("A-materialize+reread") { ranked.count() }
    val assigned = ranked.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
    val probes = ranked.select(col("vec_id").as("q_id"), explode(col("probe_cells")).as("cell"))
    val qside = ranked.select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = probes.join(assigned, "cell").filter(col("q_id") =!= col("vec_id"))
      .join(qside, "q_id")
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, e) -> s + e)") /
          (col("qnrm") * col("nrm")), 4).as("sim"))
    t("B-pairs-count") { pairs.count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    val out = pairs.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id").as("vec_id"), col("neighbor_id"), col("sim"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
    t("C-out-count") { out.count() }
    t("D-out-localCheckpoint") { out.localCheckpoint().count() }
    spark.stop()
  }
}

/** q25 prune A/B standalone (mirrors the Bench block). */
object Q25Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val boiler = "subscribe to our newsletter for the latest updates and special offers every single day"
    val abDir = java.nio.file.Files.createTempDirectory("graft-q25ab").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text", when(pmod($"doc_id", lit(2)) === 0,
        concat($"text", lit(" " + boiler))).otherwise($"text"))
      .write.mode("overwrite").parquet(s"$abDir/documents.parquet")
    def t(label: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val n = f
      println(f"$label rows=$n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    t("pruned") { graft.ops.Ops.q25NgramJaccardPruned(spark, abDir).count() }
    t("unpruned") { graft.ops.Ops.q15NgramJaccardPairs(spark, abDir).count() }
    spark.stop()
  }
}
