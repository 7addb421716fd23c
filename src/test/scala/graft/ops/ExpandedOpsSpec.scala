package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.SparkTestSession

/** Round-2 additions: docling payload routing, the KPI caption channel, and
  * near-dup connected components (all also oracle-gated: q45/q46/q47). */
class ExpandedOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("docling-JSON payloads route through the distributed pipeline and collapse tables") {
    import spark.implicits._
    val out = ExtractOps.doclingPipeline(spark, sf).cache()
    assert(out.count() == 500)
    assert(out.filter($"backend" =!= "docling-json").count() == 0)
    assert(out.filter(!$"covered").count() == 0)
    // every doc_id % 3 == 0 row must have collapsed the split RON pair
    val bad = out.filter($"table_count" === 1 && !$"collapsed_pair").count()
    assert(bad == 0)
    out.unpersist()
  }

  test("KPI picture captions land in the markdown for exactly the seeded class") {
    import spark.implicits._
    val out = ExtractOps.kpiCaptions(spark, sf).cache()
    val urls = out.filter($"caption_added").select($"url").as[String].collect().toSet
    assert(urls.nonEmpty)
    assert(urls.forall(u => u.stripPrefix("doc://").toLong % 4 == 0))
    out.unpersist()
  }

  test("near-dup components: labels are fixpoint-stable and respect candidate pairs") {
    import spark.implicits._
    val comp = Ops.q47NeardupComponents(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 500)
    // every pair's endpoints share a component; components are min-ids
    val pairs = Ops.q18MinhashLshPairs(spark, sf).as[(Long, Long)].collect()
    for ((a, b) <- pairs) assert(comp(a) == comp(b), s"pair ($a,$b) split across components")
    for ((id, c) <- comp) assert(c <= id)
    // component representative is a member of its own component
    for ((_, c) <- comp) assert(comp(c) == c, s"representative $c not self-rooted")
  }
}

/** Streaming extraction: the batch conversion flow over a streaming source
  * must produce exactly the batch result (same rows, same markdown). */
class StreamingExtractSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streamed extraction equals batch extraction row-for-row") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft-stream-pages").toString
    val out = java.nio.file.Files.createTempDirectory("graft-stream-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val pages = spark.createDataset((0L until 64L)
      .map(i => graft.sources.SyntheticPages.page(42L, i))).toDF()
    pages.repartition(4).write.mode("overwrite").parquet(src)

    val q = graft.streaming.StreamingExtract.stream(spark, src, out, ckpt, numBuckets = 8)
    q.awaitTermination(120000)

    // raw row count FIRST: a replayed/duplicated micro-batch must fail here
    val raw = spark.read.parquet(s"$out/data")
    assert(raw.count() == 64, s"expected 64 rows, got ${raw.count()}")
    val streamed = raw
      .select($"url", $"markdown").as[(String, String)].collect().toMap
    val batch = graft.extract.Pipeline.extract(spark, spark.read.parquet(src), numBuckets = 8)
      .toDF().select($"url", $"markdown").as[(String, String)].collect().toMap
    assert(streamed.size == 64 && batch.size == 64)
    assert(streamed == batch, "streamed and batch markdown must be byte-identical per url")
  }
}
