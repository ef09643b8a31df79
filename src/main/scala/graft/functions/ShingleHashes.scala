package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct PACKED polynomial hash pairs of the 3-gram word shingles of
  * a token array: for each window [t_i, t_{i+1}, t_{i+2}] it hashes the
  * string `t_i + " " + t_{i+1} + " " + t_{i+2}` with BOTH PolyHash's
  * recurrence (acc*131 + codePoint mod 1e9+7) and PolyHash2's
  * (acc*137 + codePoint mod 1e9+9) in one pass, packs them as
  * `h1 * 2^31 + h2` (< 2^61), and returns the de-duplicated packed
  * values. Widened in round 12: shingle-set intersections, probes, and
  * source-level overlaps consume hash equality as shingle IDENTITY, and
  * a single ~30-bit hash saturates by birthday at corpus shingle counts
  * (see PolyHash2's scaladoc for the math) — the packed pair behaves as
  * a ~60-bit hash while staying ONE BIGINT, so every downstream
  * join/groupBy and the DuckDB replay
  * (`polyHashSql(sh) * 2147483648 + polyHashSql2(sh)`, plain BIGINT
  * arithmetic) is unchanged in shape.
  *
  * Identical values to the compositional form
  * `array_distinct(transform(h1(...) * 2^31 + h2(...)))` and to the
  * DuckDB oracle hashing the shingle strings — but one tight codegen'd
  * loop instead of an interpreted HOF tree (which costs ~2 ms/doc: each
  * element_at/concat_ws/sequence step is a boxed expression-tree walk).
  * Downstream (MinHash, Jaccard) joins on the packed hash, so shingle
  * strings never materialize at all. MinHash permutations reduce the
  * packed value mod 2^31−1 first (see MinHashSig).
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  protected override def nullSafeEval(input: Any): Any =
    ShingleHashes.evalTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.evalTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private final val Mod = PolyHash.Mod
  private final val Mod2 = PolyHash2.Mod
  private final val Base2 = PolyHash2.Base
  /** 2^31 — the packing shift; both component hashes are < 2^30. */
  final val Pack = 2147483648L

  def poly_shingles(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(ShingleHashes(Bridge.expression(c)))
  }

  private def feed(acc0: Long, s: String): Long = {
    var acc = acc0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * 131L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  private def feed2(acc0: Long, s: String): Long = {
    var acc = acc0
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * Base2 + cp) % Mod2
      i += Character.charCount(cp)
    }
    acc
  }

  /** Static helper invoked from generated code. */
  def evalTokens(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      var h = feed(0L, toks(i))
      h = (h * 131L + 32L) % Mod // ' '
      h = feed(h, toks(i + 1))
      h = (h * 131L + 32L) % Mod
      h = feed(h, toks(i + 2))
      var g = feed2(0L, toks(i))
      g = (g * Base2 + 32L) % Mod2 // ' '
      g = feed2(g, toks(i + 1))
      g = (g * Base2 + 32L) % Mod2
      g = feed2(g, toks(i + 2))
      seen.add(h * Pack + g)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
