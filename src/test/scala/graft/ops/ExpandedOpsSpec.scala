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
