package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 3-gram word shingling: `array<string>` tokens ->
  * `array<string>` of space-joined consecutive triples (empty below 3
  * tokens).
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(' ', ...))`
  * higher-order composition in the dedup/fingerprint pipelines — Spark
  * evaluates HOF lambdas interpreted (CodegenFallback) and materializes the
  * index sequence per row; this loop builds the UTF8String triples directly
  * inside whole-stage codegen. Output strings are byte-identical to the
  * HOF form, so the DuckDB oracles (which keep the portable HOF rendering)
  * still hash-match.
  */
case class Shingle3(child: Expression) extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle3 expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle3"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val m = math.max(n - 2, 0)
    val out = new Array[AnyRef](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(space,
        a.getUTF8String(i), a.getUTF8String(i + 1), a.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val sp = ctx.addReferenceObj("space", space, classOf[UTF8String].getName)
      s"""
         |int $n = $a.numElements();
         |int $m = java.lang.Math.max($n - 2, 0);
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sp,
         |    $a.getUTF8String($i), $a.getUTF8String($i + 1), $a.getUTF8String($i + 2));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingle3 {
  val ident: FunctionIdentifier = FunctionIdentifier("shingle3")
  val info: ExpressionInfo = new ExpressionInfo(classOf[Shingle3].getName, "shingle3")
  val builder: Seq[Expression] => Expression = {
    case Seq(a) => Shingle3(a)
    case other => throw new IllegalArgumentException(s"shingle3 expects 1 argument, got ${other.size}")
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
