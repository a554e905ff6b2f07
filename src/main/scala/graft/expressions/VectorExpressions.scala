package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * The higher-order-function form (`aggregate(zip_with(...))`) evaluates a
  * lambda interpreter per element; this expression compiles to a tight Java
  * loop inside whole-stage codegen. Accumulation is left-to-right from 0.0
  * — the exact IEEE sequence of the HOF fold and of the DuckDB oracle's
  * explicit chain, so swapping implementations cannot change results.
  *
  * Null handling: inherits BinaryExpression's null-propagating eval (null
  * array → null). Null *elements* are treated as 0 contribution.
  *
  * Preference order per the engine's design rules: built-in ops first, a
  * custom `Expression` only where measurably better — this is the §7.4
  * "codegen Expression for cosine similarity" case from SURVEY.md.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred as Seq[ArrayType] — AbstractDataType is private[sql]
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  if (!$a.isNullAt(i) && !$b.isNullAt(i)) {
         |    acc += $a.getDouble(i) * $b.getDouble(i);
         |  }
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Function registration, both as a `SparkSessionExtensions` hook
  * (`.withExtensions(new GraftExtensions)`) and as an idempotent imperative
  * call for sessions the library does not construct. */
object GraftFunctions {
  private val dotIdent = FunctionIdentifier("graft_dot")
  private val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dot takes exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  def registerAll(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((dotIdent, dotInfo, dotBuilder))

  /** Idempotent: safe to call from every query builder. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(dotIdent, dotInfo, dotBuilder)
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.registerAll(ext)
}
