package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Embedding-vector kernels as native codegen'd Catalyst expressions — the
  * X3 path for the similarity family's hot loop. The higher-order-function
  * formulation (`aggregate(zip_with(...))`) is CodegenFallback in Spark:
  * every cosine in the ANN re-rank and near-dup verify stages was an
  * interpreted per-row tree walk plus a materialized product array. This
  * expression runs one fused primitive loop (no allocation) inside
  * whole-stage codegen.
  *
  * Bit-compatibility contract (the DuckDB oracle depends on it): the fold
  * is the SAME sequential element-order sum the column version produced —
  * dot = Σ aᵢ·bᵢ, norms = Σ aᵢ², Σ bᵢ² each left-folded from 0.0 in index
  * order; result = dot / (sqrt(na) · sqrt(nb)).
  */
object VectorOps {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null SLOT would silently read as 0.0 (ArrayData.getDouble) and
      // yield a plausible-but-wrong cosine; NaN is detectable and the
      // similarity operators' degenerate-row guards already exclude rows
      // whose aggregate norm is null/NaN
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** cosine_sim(array<double>, array<double>) → double. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  // explicit type check: without it, array<float> input (the stored
  // embedding type) would reach ArrayData.getDouble and read garbage
  // silently — require the caller's explicit cast instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object vectorfns {
  def cosine_sim(a: Column, b: Column): Column =
    graftshim.toColumn(CosineSim(
      graftshim.toExpression(a), graftshim.toExpression(b)))

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", (es: Seq[Expression]) => {
        require(es.length == 2, s"cosine_sim expects 2 arguments, got ${es.length}")
        CosineSim(es.head, es(1))
      }, "built-in")
}
