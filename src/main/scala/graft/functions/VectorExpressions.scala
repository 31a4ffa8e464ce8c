package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The `zip_with`/`aggregate` higher-order-function formulation is
  * CodegenFallback (interpreted, per-element closure dispatch); these
  * expressions generate a tight primitive loop inside whole-stage codegen
  * instead — SURVEY §2's preference (b): "a native Catalyst Expression
  * (with doGenCode) beats a Scala UDF".
  *
  * Semantics are EXACTLY the sequential left fold in double precision that
  * the DuckDB oracles compute (list_dot_product / list_distance over
  * DOUBLE[]): accumulation order is element order, each float widened to
  * double before multiply/subtract.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> or two array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** scala accumulation step for the interpreted path */
  protected def step(acc: Double, x: Double, y: Double): Double

  /** java source for one accumulation step (x, y already double) */
  protected def stepJava(acc: String, x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    elementType match {
      case FloatType =>
        while (i < n) { acc = step(acc, a.getFloat(i), b.getFloat(i)); i += 1 }
      case _ =>
        while (i < n) { acc = step(acc, a.getDouble(i), b.getDouble(i)); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elementType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$getter($i);
         |  double y = (double) $b.$getter($i);
         |  ${stepJava(acc, "x", "y")}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }
}

/** Sequential-fold dot product: sum_i a_i * b_i (in double). */
case class VecDot(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"
  override protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** Sequential-fold squared euclidean distance: sum_i (a_i - b_i)^2. */
case class VecSqDist(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_sqdist"
  override protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def stepJava(acc: String, x: String, y: String): String =
    s"double d = $x - $y; $acc += d * d;"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSqDist =
    copy(left = l, right = r)
}

/** Fixed-point vector quantization: floor(v_i * scale) per element, held
  * as doubles (exactly representable integers — the BUFF bounded-float
  * domain applied to vectors). The transform() HOF form is CodegenFallback
  * and re-dispatches a closure per element; this generates one primitive
  * loop. `right` must be a foldable double (the scale).
  */
case class VecQuantize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_quantize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, double), " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val scale = r.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    elementType match {
      case FloatType =>
        while (i < n) { out(i) = math.floor(a.getFloat(i) * scale); i += 1 }
      case _ =>
        while (i < n) { out(i) = math.floor(a.getDouble(i) * scale); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elementType match {
      case FloatType => "getFloat"
      case _ => "getDouble"
    }
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = java.lang.Math.floor(((double) $a.$getter($i)) * $s);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecQuantize =
    copy(left = l, right = r)
}

/** Registration: programmatic (idempotent, per-session) and via
  * `spark.sql.extensions=graft.GraftExtensions` (see graft.GraftExtensions).
  */
object VectorFunctions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      new ExpressionInfo(classOf[VecDot].getName, "graft_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    ("graft_sqdist",
      new ExpressionInfo(classOf[VecSqDist].getName, "graft_sqdist"),
      (args: Seq[Expression]) => VecSqDist(args(0), args(1))),
    ("graft_quantize",
      new ExpressionInfo(classOf[VecQuantize].getName, "graft_quantize"),
      (args: Seq[Expression]) => VecQuantize(args(0), args(1))))

  /** Register into a session's function registry (safe to call repeatedly). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, info, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
