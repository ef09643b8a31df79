package graft

/** GraftExtensions registers the custom expressions as SQL functions.
  * (The shared test session already exists, so register through the same
  * mechanism the extension uses, then exercise them via spark.sql.)
  */
class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL") {
    // apply the injection path on a live session's registry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(new FunctionIdentifier("poly_hash"))) {
      reg.createOrReplaceTempFunction("poly_hash",
        exprs => graft.functions.PolyHash(exprs.head), "built-in")
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => graft.functions.VecDot(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("shingle_hashes",
        exprs => graft.functions.ShingleHashes(exprs.head), "built-in")
      reg.createOrReplaceTempFunction("min_hash_sig",
        exprs => graft.functions.MinHashSig(exprs.head), "built-in")
    }
    val h = spark.sql("SELECT poly_hash('spark') AS h").collect().head.getLong(0)
    // reference recurrence
    var acc = 0L
    "spark".foreach(c => acc = (acc * 131 + c) % 1000000007L)
    assert(h == acc)
    val d = spark.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    val n = spark.sql(
      "SELECT size(shingle_hashes(array('a','b','c','d'))) AS n")
      .collect().head.getInt(0)
    assert(n == 2)
    val m = spark.sql(
      "SELECT size(min_hash_sig(array(5L, 99L))) AS m")
      .collect().head.getInt(0)
    assert(m == graft.functions.MinHashSig.NumHashes)
  }

  test("GraftExtensions class applies to a builder without error") {
    // construct (not start) a builder with the extension — validates the
    // injection wiring compiles and instantiates
    val ext = new graft.plans.GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must not throw
  }
}
