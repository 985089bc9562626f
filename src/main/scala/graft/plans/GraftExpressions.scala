package graft.plans

import graft.functions.Coerce
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the ingest hot path (SURVEY.md §7.3):
  * the coercion battery as codegen'd expressions instead of Scala UDFs —
  * no serialization boundary, null handling in generated code, and the
  * expression stays inside whole-stage codegen. The string work delegates
  * to the shared [[Coerce]] implementations via a static call (the
  * regex cascade itself doesn't benefit from inlining; eliminating the
  * UDF wrapper does).
  */
object GraftExpressions {

  /** Codegen helpers invoked from generated code — must be public static
    * (object methods compile to static under the hood via MODULE$). */
  def normalizeNumerics(s: UTF8String, t: UTF8String, d: UTF8String): UTF8String =
    UTF8String.fromString(Coerce.normalizeNumerics(s.toString, t.toString, d.toString))

  def coerceNumericBoxed(s: UTF8String): java.lang.Double =
    Coerce.coerceNumeric(s.toString) match {
      case Some(v) => java.lang.Double.valueOf(v)
      case None => null
    }

  def coerceDateTimeBoxed(s: UTF8String): UTF8String =
    Coerce.coerceDateTime(s.toString) match {
      case Some(v) => UTF8String.fromString(v)
      case None => null
    }

  def coerceBoolBoxed(s: UTF8String): java.lang.Boolean =
    Coerce.coerceBool(s.toString) match {
      case Some(v) => java.lang.Boolean.valueOf(v)
      case None => null
    }
}

/** `normalizeNumerics` (T2) as a ternary codegen'd expression:
  * normalize_numerics(str, thousandSep, decimalSep). */
case class NormalizeNumeric(child: Expression, thousand: Expression, decimal: Expression)
    extends TernaryExpression {
  override def first: Expression = child
  override def second: Expression = thousand
  override def third: Expression = decimal
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(s: Any, t: Any, d: Any): Any =
    GraftExpressions.normalizeNumerics(
      s.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, t, d) =>
      s"graft.plans.GraftExpressions.normalizeNumerics($s, $t, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** Numeric coercion battery (T8) as a codegen'd unary expression; returns
  * NULL for non-numeric shapes like the reference's `undef`. */
case class CoerceNumeric(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftExpressions.coerceNumericBoxed(v.asInstanceOf[UTF8String]) match {
      case null => null
      case d => d.doubleValue()
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${childGen.isNull}) {
          java.lang.Double $boxed =
            graft.plans.GraftExpressions.coerceNumericBoxed(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Date/time coercion cascade (T8) to the canonical ODBC string. */
case class CoerceDateTime(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else GraftExpressions.coerceDateTimeBoxed(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.plans.GraftExpressions.coerceDateTimeBoxed(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Element-wise minimum over fixed-length `array<long>` rows — the MinHash
  * signature fold as ONE aggregate column instead of `numHashes` separate
  * `min` aggregates (which widen the plan and the aggregation buffer
  * schema 32-fold). Declarative: update/merge are Catalyst expressions
  * (`zip_with(buf, row, least)`), so map-side partial aggregation and
  * buffer merging come for free, exactly like the built-in `min`.
  */
case class ArrayMinAgg(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  import org.apache.spark.sql.types.{ArrayType, LongType}

  private val arrTpe = ArrayType(LongType, containsNull = true)
  override def dataType: DataType = arrTpe
  override def nullable: Boolean = false

  private lazy val buf = AttributeReference("minbuf", arrTpe, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(Seq.fill(n)(Long.MaxValue), arrTpe))

  private def ewMin(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", LongType, nullable = true)
    val y = NamedLambdaVariable("y", LongType, nullable = true)
    ZipWith(a, b, LambdaFunction(Least(Seq(x, y)), Seq(x, y)))
  }
  override lazy val updateExpressions: Seq[Expression] = Seq(ewMin(buf, child))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(ewMin(buf.left, buf.right))
  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
