package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting: 61-bit polynomial rolling hash over UTF-8
  * bytes (base 1000003, modulus 2^61−1) as a native codegen'd Catalyst
  * expression — the custom-Expression path for scalar functions Spark
  * lacks (preferred over a Scala UDF: stays inside whole-stage codegen,
  * operates on UTF8String bytes without a String allocation).
  */
object RollingHash {
  final val Mod: Long = (1L << 61) - 1
  final val Base: Long = 1000003L

  /** mulmod via 128-bit product (Math.multiplyHigh, JDK9+). */
  private def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit (hi,lo) modulo 2^61-1: (lo & M) + (lo>>>61 | hi<<3)
    var r = (lo & Mod) + ((lo >>> 61) | (hi << 3))
    if (r >= Mod) r -= Mod
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xff) + 1
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  def hashUtf8(s: UTF8String): Long = hashBytes(s.getBytes)
}

case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object fingerprintfns {
  def rolling_fingerprint(c: Column): Column =
    graftshim.toColumn(RollingFingerprint(graftshim.toExpression(c)))
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_fingerprint", (es: Seq[Expression]) => RollingFingerprint(es.head), "built-in")
}
