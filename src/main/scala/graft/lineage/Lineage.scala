package graft.lineage

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Commit-level checkpointing with per-partition lineage rows — the
  * north_rule resume contract (snapshot id, partition id, doc count, bytes,
  * elapsed), emulated over hash-bucketed parquet since no Iceberg runtime
  * jar ships in this environment (SURVEY.md §7).
  *
  * Layout under `outDir`:
  *   data/bucket=N/...parquet        bucketed output partitions
  *   _lineage/snapshot-<id>.json     manifest per commit (monotonic ids)
  *
  * A killed job resumes by reading the latest manifest's committed bucket
  * set and pruning those buckets from the input scan — partition-granular
  * resume, no recomputation of committed work.
  */
object Lineage {
  case class PartitionStat(bucket: Int, docCount: Long, bytes: Long, elapsedMs: Long)

  private def lineageDir(outDir: String) = Paths.get(outDir, "_lineage")

  /** Names of manifest files, with the directory stream closed promptly. */
  private def manifestNames(outDir: String): List[String] = {
    val dir = lineageDir(outDir)
    if (!Files.exists(dir)) return Nil
    val stream = Files.list(dir)
    try stream.iterator().asScala.map(_.getFileName.toString)
      .filter(s => s.startsWith("snapshot-") && s.endsWith(".json")).toList
    finally stream.close()
  }

  private def idOf(name: String): Long =
    name.stripPrefix("snapshot-").stripSuffix(".json").toLong

  /** Monotonic snapshot id = max existing + 1 (no wall clock: determinism). */
  private def nextSnapshotId(outDir: String): Long = {
    val ids = manifestNames(outDir).map(idOf)
    if (ids.isEmpty) 1L else ids.max + 1L
  }

  def commit(outDir: String, numBuckets: Int, stats: Seq[PartitionStat],
             inputDesc: String): String = {
    val dir = lineageDir(outDir)
    Files.createDirectories(dir)
    val id = nextSnapshotId(outDir)
    val rows = stats.map { s =>
      s"""    {"partition_id": ${s.bucket}, "doc_count": ${s.docCount}, "bytes": ${s.bytes}, "elapsed_ms": ${s.elapsedMs}}"""
    }.mkString(",\n")
    val json =
      s"""{
         |  "snapshot_id": $id,
         |  "num_buckets": $numBuckets,
         |  "input": "${inputDesc.replace("\"", "'")}",
         |  "partitions": [
         |$rows
         |  ]
         |}""".stripMargin
    val tmp = dir.resolve(s".snapshot-$id.json.tmp")
    Files.writeString(tmp, json)
    // atomic publish: a crash mid-commit leaves no partial manifest
    Files.move(tmp, dir.resolve(s"snapshot-$id.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    id.toString
  }

  /** Buckets already committed by the latest snapshot (empty if none). */
  def committedBuckets(outDir: String): Set[Int] = {
    val dir = lineageDir(outDir)
    val manifests = manifestNames(outDir)
    if (manifests.isEmpty) return Set.empty
    val latest = manifests.maxBy(idOf)
    val json = Files.readString(dir.resolve(latest))
    // minimal parse: partition_id values
    val m = java.util.regex.Pattern.compile("\"partition_id\":\\s*(\\d+)").matcher(json)
    val out = Set.newBuilder[Int]
    while (m.find()) out += m.group(1).toInt
    out.result()
  }

  /** All snapshots with their partition rows, in snapshot-id order. */
  def snapshots(outDir: String): Seq[(Long, Seq[PartitionStat])] = {
    val dir = lineageDir(outDir)
    manifestNames(outDir).sortBy(idOf)
      .map { name =>
        val id = idOf(name)
        val json = Files.readString(dir.resolve(name))
        val m = java.util.regex.Pattern.compile(
          "\\{\"partition_id\":\\s*(\\d+),\\s*\"doc_count\":\\s*(\\d+),\\s*\"bytes\":\\s*(\\d+),\\s*\"elapsed_ms\":\\s*(\\d+)\\}").matcher(json)
        val stats = Seq.newBuilder[PartitionStat]
        while (m.find()) stats += PartitionStat(m.group(1).toInt, m.group(2).toLong,
          m.group(3).toLong, m.group(4).toLong)
        (id, stats.result())
      }
  }
}
