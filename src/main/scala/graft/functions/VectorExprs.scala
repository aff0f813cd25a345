package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The declarative form `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  * (acc, v) -> acc + v)` is semantically right but higher-order lambdas are
  * interpreted per element — at 12.5M candidate pairs × 64 dims that is
  * billions of interpreted steps. This BinaryExpression evaluates the same
  * left-assoc fold (0.0 + a₀b₀ + a₁b₁ + …, bit-identical results) in a
  * tight codegen'd loop, keeping the whole stage inside WholeStageCodegen.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Both inputs must be array<double> (either nullability — Spark's
    * transform() conservatively marks containsNull). Element-level nulls
    * are NOT supported: inputs are built with CAST-to-double transforms
    * over non-null embeddings; a null element would read as undefined. */
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isDoubleArray(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!isDoubleArray(left.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"left side must be array<double>, got ${left.dataType}")
    } else if (!isDoubleArray(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right side must be array<double>, got ${right.dataType}")
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      throw new IllegalArgumentException(
        s"graft_dot: array length mismatch ($n vs ${y.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object VectorExprs {
  /** Registers `graft_dot(array<double>, array<double>) -> double` on the
    * session (idempotent), making it usable from expr()/SQL. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("graft_dot")
    registry.registerFunction(
      ident,
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        // arity surfaces as an analysis error, not IndexOutOfBounds
        if (exprs.length != 2) {
          throw new IllegalArgumentException(
            s"graft_dot expects exactly 2 arguments, got ${exprs.length}")
        }
        ArrayDotProduct(exprs(0), exprs(1))
      })
  }
}
