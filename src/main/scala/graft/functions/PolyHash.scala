package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive polynomial hash of a string's code points:
  * acc = (acc * 131 + codePoint) mod 1e9+7.
  *
  * Semantically identical to the higher-order-function form
  * `aggregate(split(s, ""), 0L, (acc, ch) -> (acc*131 + ascii(ch)) % p)`
  * and to the DuckDB oracle's
  * `list_reduce(list_prepend(0, list_transform(string_split(s, ''), ascii)), …)`
  * — but implemented as a native codegen'd Catalyst expression. The HOF
  * form is interpreted per element (a Matcher-driven regex split plus an
  * expression-tree walk per character); this is a tight JVM loop inside
  * whole-stage codegen. Measured on the MinHash pipeline at sf0.1 it is
  * the difference between ~36 s and ~5 s.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hashUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Column-API entry point (Spark 4 bridges Column <-> Expression via
    * classic.ExpressionUtils).
    */
  def poly_hash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PolyHash(Bridge.expression(c)))
  }

  /** Static helper invoked from generated code. */
  def hashUTF8(s: UTF8String): Long = hashString(s.toString)

  /** Plain-Scala form for driver/mapPartitions callers (same recurrence). */
  def hashString(str: String): Long = {
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 131L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
