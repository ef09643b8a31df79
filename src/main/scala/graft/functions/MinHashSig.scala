package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-hash array: for each of the NumHashes
  * permutations h_i(x) = (a_i·(x mod P) + b_i) mod P with P = 2^31−1,
  * the minimum over the array — i.e. the whole 32-long signature in one
  * pass over the (already materialized) per-document hash set. The
  * input reduces mod P FIRST: shingle hashes are 61-bit packed pairs
  * (round 12, see ShingleHashes), and a_i·x would silently overflow a
  * long at x ≥ 2^33 — `x mod P` keeps the product under 2^62 and is the
  * expression DuckDB replays verbatim in BIGINT.
  *
  * Same values as the relational form
  * `explode(xs) → groupBy(doc_id).agg(min((a_i·(x%P)+b_i) % P)…)` and as
  * the DuckDB oracle's `MIN((a*(x%P)+b) % P) … GROUP BY doc_id, i` — but
  * MAP-ONLY:
  * the relational form shuffles the full exploded shingle table (the
  * widest frame in the dedup pipeline) on doc_id just to re-group rows
  * that started out grouped. At 100 TB that shuffle is the dominant cost
  * of signature generation; this expression removes it entirely.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash_sig"

  protected override def nullSafeEval(input: Any): Any =
    MinHashSig.evalSig(input.asInstanceOf[ArrayData])

  // Helper must NOT be named `eval`: a companion-object method that
  // shares a name with an inherited instance member (Expression.eval)
  // gets no static forwarder, so Janino can't resolve the call and the
  // whole stage silently falls back to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.evalSig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  final val NumHashes = 32
  final val P = 2147483647L // 2^31-1

  /** Independent permutation seeds drawn from java.util.Random(42) (LCG
    * fixed by the Java spec, so the constants are stable across JVMs and
    * embeddable as literals in the DuckDB oracle). NOT formula-derived:
    * an earlier a_i = A·(i+1), b_i = B·(i+1) scheme made every h_i a
    * scalar multiple of one function, which collapsed the independence
    * assumption behind banding and measurably lost a 0.988-Jaccard pair.
    */
  lazy val seeds: IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    IndexedSeq.fill(NumHashes)(
      (rnd.nextInt(P.toInt - 1) + 1L, rnd.nextInt(P.toInt).toLong))
  }

  private lazy val aArr: Array[Long] = seeds.map(_._1).toArray
  private lazy val bArr: Array[Long] = seeds.map(_._2).toArray

  def min_hash_sig(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(MinHashSig(Bridge.expression(c)))
  }

  /** Static helper invoked from generated code. */
  def evalSig(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = Array.fill(NumHashes)(Long.MaxValue)
    val as = aArr
    val bs = bArr
    var i = 0
    while (i < n) {
      val x = arr.getLong(i) % P
      var j = 0
      while (j < NumHashes) {
        val h = (as(j) * x + bs(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
