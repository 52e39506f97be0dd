package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector math over ArrayType(FloatType)
  * embedding columns.
  *
  * WHY: Spark's higher-order functions (`zip_with` + `aggregate`) are
  * correct but run interpreted (LambdaFunction bodies don't participate in
  * whole-stage codegen) and allocate an intermediate 64-element array per
  * row-pair. On the all-pairs similarity search (q32: 2M pairs at sf0.1)
  * that cost 62 s. These expressions generate a tight scalar loop over the
  * two ArrayData buffers — no allocation, stays inside WholeStageCodegen —
  * and produce BIT-IDENTICAL results to the higher-order formulation
  * (same sequential left-to-right double accumulation), so oracle parity
  * is unaffected.
  *
  * At 100 TB this is the building block for both brute-force scoring and
  * the LSH-bucketed variant (bucket-local pair scoring).
  */
object VectorFunctions {

  /** Fold over two float arrays: Σ CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE). */
  case class FloatVectorDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType.isInstanceOf[ArrayType]) &&
          children.forall(_.dataType.asInstanceOf[ArrayType].elementType == FloatType))
        TypeCheckResult.TypeCheckSuccess
      else
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
            children.map(_.dataType.catalogString).mkString(", "))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    // NULL semantics match the zip_with/aggregate formulation exactly:
    // mismatched lengths (zip_with pads with null) or a null element
    // poison the sum → NULL, same as the DuckDB manual-DOUBLE oracle.
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ CAST(a[i] AS DOUBLE)² — squared L2 norm (sqrt on top where needed). */
  case class FloatVectorNormSq(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
      }
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm_sq"

    // a null element poisons the sum → NULL (matches the HOF formulation)
    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $v = (double) $a.getFloat($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The registration triples, shared by [[register]] and GraftExtensions
    * so the two paths cannot drift. Builders validate arity up front — the
    * registry hands them whatever argument list the user wrote.
    */
  val builtins: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot requires exactly 2 arguments, got ${children.size}")
        FloatVectorDot(children(0), children(1))
      }),
    (FunctionIdentifier("vec_norm_sq"),
      new ExpressionInfo(classOf[FloatVectorNormSq].getName, "vec_norm_sq"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"vec_norm_sq requires exactly 1 argument, got ${children.size}")
        FloatVectorNormSq(children.head)
      }))

  /** Idempotent per-session registration so `expr("vec_dot(a, b)")` and SQL
    * both resolve. Called from the query builders (the driver harness
    * constructs the SparkSession itself, so there is no extensions hook).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builtins.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
