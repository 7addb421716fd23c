package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over the UTF-8 bytes of a string:
  *
  *   h = fold(bytes, 0) { (acc, b) => (acc * 31 + b) % 1000000007 }
  *
  * Deliberately oracle-portable: the same fold is expressible in ANSI SQL
  * (DuckDB `list_reduce` over `ord` of chars for ASCII input), so hash-based
  * operators (minhash, simhash, fingerprints, LSH buckets) can be verified
  * against an external engine bit-for-bit — unlike xxhash64/murmur which are
  * engine-private. Codegen'd; stays inside whole-stage codegen in the hot
  * dedup paths.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  def hashString(s: String): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API. */
  def polyhash(c: Column): Column =
    org.apache.spark.sql.GraftShim.column(PolyHash(org.apache.spark.sql.GraftShim.expression(c)))

  /** Register for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftShim.registerFunction(spark, "polyhash",
      exprs => PolyHash(exprs.head))
}
