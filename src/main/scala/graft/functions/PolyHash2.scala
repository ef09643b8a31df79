package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Second, independent polynomial hash of a string's code points:
  * acc = (acc * 137 + codePoint) mod 1e9+9.
  *
  * Exists to be PAIRED with [[PolyHash]] (base 131, mod 1e9+7) as a
  * packed ~60-bit key — `poly_hash(s) * 2^31 + poly_hash2(s)` — for the
  * operators that consume hash-bucket equality DIRECTLY as identity
  * (shared-window detection, fingerprint pairing, gram-set probes) with
  * no exact verifier downstream. A single mod-1e9+7 hash is ~30 bits:
  * birthday-saturated at corpus window counts (the round-12 heavy-tail
  * fixture measured ~180 colliding window pairs at just 600k windows).
  * A joint collision must satisfy two independent congruences — distinct
  * base AND modulus — so the packed key behaves like a 60-bit hash:
  * ~1e12 windows at 100 TB yield an expected false-equality fraction of
  * ~4e-7, vs certain saturation at 2^30. Candidate-generation hashing
  * that IS followed by an exact verifier (LSH bands, prefix filters,
  * diagonal-run substring evidence) correctly stays single-hash.
  *
  * Same codegen posture as PolyHash: a tight JVM loop inside
  * whole-stage codegen, replayed in DuckDB via
  * `list_reduce(..., (acc, c) -> (acc * 137 + c) % 1000000009)`.
  */
case class PolyHash2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash2"
  protected override def nullSafeEval(input: Any): Any =
    PolyHash2.hashUTF8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash2.hashUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash2 =
    copy(child = newChild)
}

object PolyHash2 {
  final val Mod = 1000000009L
  final val Base = 137L

  def poly_hash2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(PolyHash2(Bridge.expression(c)))
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
      acc = (acc * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
