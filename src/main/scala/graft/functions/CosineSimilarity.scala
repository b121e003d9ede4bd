package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` embedding
  * columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.4 preference order (b)):
  * the built-in composition `aggregate(zip_with(a, b, ...), ...)` is a
  * higher-order function — Spark evaluates HOF lambdas interpreted
  * (CodegenFallback), allocates a zipped intermediate array per row, and
  * breaks the surrounding WholeStageCodegen span. For 64-dim embeddings that
  * is ~8x the work of this tight fused loop, which stays inside codegen and
  * allocates nothing. Arithmetic is identical (float -> double promotion,
  * sequential sum), so results are bit-equal with the HOF formulation and
  * hash-match the same DuckDB oracle.
  *
  * Null handling: BinaryExpression's null-intolerant contract (null in ->
  * null out). Mismatched lengths use the shorter prefix; zero-norm inputs
  * yield NaN — same as the SQL formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val ident: FunctionIdentifier = FunctionIdentifier("cosine_sim")
  val info: ExpressionInfo = new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim")
  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSimilarity(a, b)
    case other => throw new IllegalArgumentException(s"cosine_sim expects 2 arguments, got ${other.size}")
  }

  /** Session-local registration (also done globally by [[GraftExtensions]]). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}

/** `SparkSessionExtensions` entry point: ship the engine's native functions
  * to any session via `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((CosineSimilarity.ident, CosineSimilarity.info, CosineSimilarity.builder))
    ext.injectFunction((Shingle3.ident, Shingle3.info, Shingle3.builder))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
