package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential fuzz surface over the relational core.
  *
  * Hand-written oracles pin a fixed set of queries; this module covers
  * the combinatorial space BETWEEN them: a seeded generator draws random
  * (filter × group-key × aggregate × having × window) query shapes over
  * the `events` table, and each shape is rendered TWICE from the SAME
  * AST — once as a DataFrame chain and once as the equivalent DuckDB
  * SQL. Both renderings are registered in `SparkEntry.queries` /
  * `oracleSql`, so the driver's hash-compare (and `tools/check.py`)
  * holds every generated pair equal at every scale factor, CI-style.
  * Any future mismatch is a minimized, named regression: the shape is
  * reconstructible from its index alone (fixed seed, pure generator —
  * no wall-clock, no ambient randomness).
  *
  * Determinism rules follow the engine's established oracle patterns:
  * integer-only aggregate outputs (COUNT / COUNT DISTINCT / SUM-MIN-MAX
  * of micro-quantized value longs — DuckDB's HUGEINT SUM widened back
  * with CAST), the portable (epoch-days + 4) % 7 weekday, non-negative
  * user_id so `%` bucketing agrees across engines, and window ranks
  * with full tie-breaks. Scale posture: every shape is one map-side
  * combinable key aggregate (plus, for window shapes, a second
  * rank-within-group pass partitioned by the outer key) — the same
  * shuffle budget as the hand-written A-family queries.
  */
object FuzzQueries {

  /** Number of generated aggregate / window / star-join shapes. */
  val NumAgg = 100
  val NumWin = 20
  val NumJoin = 30

  // ---- AST ----------------------------------------------------------

  private sealed trait Pred
  private case class ValueGt(c: Double) extends Pred
  private case class ValueLe(c: Double) extends Pred
  private case class TypeIn(ts: Seq[String]) extends Pred
  private case class UserMod(m: Long, r: Long) extends Pred
  private case class DowEq(d: Long) extends Pred

  private sealed trait Key { def name: String }
  private case object KType extends Key { val name = "event_type" }
  private case object KDay extends Key { val name = "day" }
  private case object KDow extends Key { val name = "dow" }
  private case class KUserBucket(m: Long) extends Key {
    val name = s"ubkt$m" // modulus in the name: two buckets can coexist
  }
  private case class KValBucket(w: Long) extends Key {
    val name = s"vbkt${w / 1000000L}"
  }

  private sealed trait Agg { def name: String }
  private case object CountAll extends Agg { val name = "n" }
  private case object SumMicro extends Agg { val name = "sum_micro" }
  private case object MinMicro extends Agg { val name = "min_micro" }
  private case object MaxMicro extends Agg { val name = "max_micro" }
  private case object NUsers extends Agg { val name = "n_users" }

  private case class AggShape(preds: Seq[Pred], keys: Seq[Key],
                              aggs: Seq[Agg], havingMinN: Option[Long])

  // ---- star-join family (lineitem ⋈ orders [⋈ customer]) -------------

  private sealed trait JPred
  private case class QtyGt(c: Double) extends JPred
  private case class DiscLe(c: Double) extends JPred
  private case class FlagIn(vs: Seq[String]) extends JPred
  private case class StatusIn(vs: Seq[String]) extends JPred
  private case class SegIn(vs: Seq[String]) extends JPred // needs customer

  private sealed trait JKey { def name: String; def needsCust: Boolean }
  private case object JkFlag extends JKey {
    val name = "l_returnflag"; val needsCust = false
  }
  private case object JkLineStatus extends JKey {
    val name = "l_linestatus"; val needsCust = false
  }
  private case object JkStatus extends JKey {
    val name = "o_orderstatus"; val needsCust = false
  }
  private case object JkPriority extends JKey {
    val name = "o_orderpriority"; val needsCust = false
  }
  private case object JkMonth extends JKey {
    val name = "omonth"; val needsCust = false
  }
  private case object JkSegment extends JKey {
    val name = "c_mktsegment"; val needsCust = true
  }

  private sealed trait JAgg { def name: String }
  private case object JCount extends JAgg { val name = "n" }
  private case object JSumQty extends JAgg { val name = "sum_qty_micro" }
  private case object JRevenue extends JAgg { val name = "revenue_micro" }
  private case object JMaxPrice extends JAgg { val name = "max_price_micro" }
  private case object JNCust extends JAgg { val name = "n_cust" }

  private case class JoinShape(preds: Seq[JPred], keys: Seq[JKey],
                               aggs: Seq[JAgg]) {
    def needsCust: Boolean =
      keys.exists(_.needsCust) || preds.exists(_.isInstanceOf[SegIn])
  }

  /** Per-outer-key top-k by count of an inner key (rank fully
    * tie-broken: count desc, inner key asc).
    */
  private case class WinShape(preds: Seq[Pred], outer: Key, inner: Key,
                              k: Int)

  // ---- deterministic generation --------------------------------------

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val Flags = Seq("A", "N", "R")
  private val LineStatuses = Seq("F", "O")
  private val Statuses = Seq("F", "O", "P")
  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
    "HOUSEHOLD", "MACHINERY")

  private def genShapes(): (Seq[AggShape], Seq[WinShape], Seq[JoinShape]) = {
    val rnd = new scala.util.Random(0xF0221405L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    def genPred(): Pred = rnd.nextInt(5) match {
      case 0 => ValueGt(pick(Seq(25.0, 50.0, 100.0, 150.0, 200.0, 300.0)))
      case 1 => ValueLe(pick(Seq(75.0, 125.0, 250.0, 350.0, 450.0)))
      case 2 =>
        val n = 1 + rnd.nextInt(3)
        TypeIn(rnd.shuffle(EventTypes).take(n).sorted)
      case 3 =>
        val m = 2L + rnd.nextInt(6)
        UserMod(m, rnd.nextInt(m.toInt).toLong)
      case _ => DowEq(rnd.nextInt(7).toLong)
    }
    def genKey(): Key = rnd.nextInt(5) match {
      case 0 => KType
      case 1 => KDay
      case 2 => KDow
      case 3 => KUserBucket(pick(Seq(3L, 5L, 8L)))
      case _ => KValBucket(pick(Seq(50000000L, 100000000L, 200000000L)))
    }
    def distinctKeys(n: Int): Seq[Key] = {
      val ks = scala.collection.mutable.LinkedHashSet.empty[Key]
      while (ks.size < n) ks += genKey()
      ks.toSeq
    }
    val aggShapes = (0 until NumAgg).map { _ =>
      val preds = Seq.fill(rnd.nextInt(3))(genPred()).distinct
      val keys = distinctKeys(1 + rnd.nextInt(2))
      val extra = rnd.shuffle(Seq[Agg](SumMicro, MinMicro, MaxMicro, NUsers))
        .take(rnd.nextInt(4))
      // CountAll is always present: it anchors the shape (non-degenerate
      // output) and feeds the optional HAVING
      val aggs = CountAll +: extra
      val having = if (rnd.nextInt(3) == 0) Some(2L + rnd.nextInt(4)) else None
      AggShape(preds, keys, aggs, having)
    }
    val winShapes = (0 until NumWin).map { _ =>
      val preds = Seq.fill(rnd.nextInt(2))(genPred()).distinct
      val ks = distinctKeys(2)
      WinShape(preds, ks.head, ks(1), 1 + rnd.nextInt(3))
    }
    def genJPred(): JPred = rnd.nextInt(5) match {
      case 0 => QtyGt(pick(Seq(10.0, 20.0, 30.0, 40.0)))
      case 1 => DiscLe(pick(Seq(0.02, 0.05, 0.08)))
      case 2 => FlagIn(rnd.shuffle(Flags).take(1 + rnd.nextInt(2)).sorted)
      case 3 => StatusIn(rnd.shuffle(Statuses).take(1 + rnd.nextInt(2)).sorted)
      case _ => SegIn(rnd.shuffle(Segments).take(1 + rnd.nextInt(3)).sorted)
    }
    def genJKey(): JKey = rnd.nextInt(6) match {
      case 0 => JkFlag
      case 1 => JkLineStatus
      case 2 => JkStatus
      case 3 => JkPriority
      case 4 => JkMonth
      case _ => JkSegment
    }
    val joinShapes = (0 until NumJoin).map { _ =>
      val preds = Seq.fill(rnd.nextInt(3))(genJPred()).distinct
      val ks = scala.collection.mutable.LinkedHashSet.empty[JKey]
      while (ks.size < 1 + rnd.nextInt(2)) ks += genJKey()
      val extra = rnd.shuffle(Seq[JAgg](JSumQty, JRevenue, JMaxPrice, JNCust))
        .take(rnd.nextInt(4))
      JoinShape(preds, ks.toSeq, JCount +: extra)
    }
    (aggShapes, winShapes, joinShapes)
  }

  private lazy val (aggShapes, winShapes, joinShapes) = genShapes()

  // ---- Spark rendering ------------------------------------------------

  private def sparkPred(p: Pred): Column = p match {
    case ValueGt(c)    => col("value") > lit(c)
    case ValueLe(c)    => col("value") <= lit(c)
    case TypeIn(ts)    => col("event_type").isin(ts: _*)
    case UserMod(m, r) => col("user_id") % lit(m) === lit(r)
    case DowEq(d) =>
      (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 4) % 7 ===
        lit(d)
  }

  private def sparkKey(k: Key): Column = (k match {
    case KType          => col("event_type")
    case KDay           => to_date(col("ts"))
    case KDow           =>
      ((datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 4) % 7)
        .cast("long")
    case KUserBucket(m) => col("user_id") % lit(m)
    case KValBucket(w)  =>
      expr(s"cast(round(value * 1e6, 0) as bigint) div $w")
  }).as(k.name)

  private def sparkAgg(a: Agg): Column = a match {
    case CountAll => count(lit(1)).as("n")
    case SumMicro =>
      sum(expr("cast(round(value * 1e6, 0) as bigint)")).as("sum_micro")
    case MinMicro =>
      min(expr("cast(round(value * 1e6, 0) as bigint)")).as("min_micro")
    case MaxMicro =>
      max(expr("cast(round(value * 1e6, 0) as bigint)")).as("max_micro")
    case NUsers => countDistinct(col("user_id")).as("n_users")
  }

  private def sparkAggQuery(sh: AggShape)(s: SparkSession,
                                          d: String): DataFrame = {
    var ev = graft.ops.Tables.events(s, d)
    sh.preds.foreach(p => ev = ev.filter(sparkPred(p)))
    var out = ev.groupBy(sh.keys.map(sparkKey): _*)
      .agg(sparkAgg(sh.aggs.head), sh.aggs.tail.map(sparkAgg): _*)
    sh.havingMinN.foreach(h => out = out.filter(col("n") >= lit(h)))
    out.orderBy(sh.keys.map(k => col(k.name)): _*)
  }

  private def sparkWinQuery(sh: WinShape)(s: SparkSession,
                                          d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var ev = graft.ops.Tables.events(s, d)
    sh.preds.foreach(p => ev = ev.filter(sparkPred(p)))
    val cnt = ev.groupBy(sparkKey(sh.outer), sparkKey(sh.inner))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(sh.outer.name))
      .orderBy(col("n").desc, col(sh.inner.name).asc)
    cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= sh.k)
      .orderBy(col(sh.outer.name), col("rk"))
  }

  private def sparkJPred(p: JPred): Column = p match {
    case QtyGt(c)     => col("l_quantity") > lit(c)
    case DiscLe(c)    => col("l_discount") <= lit(c)
    case FlagIn(vs)   => col("l_returnflag").isin(vs: _*)
    case StatusIn(vs) => col("o_orderstatus").isin(vs: _*)
    case SegIn(vs)    => col("c_mktsegment").isin(vs: _*)
  }

  private def sparkJKey(k: JKey): Column = (k match {
    case JkMonth => month(col("o_orderdate"))
    case other   => col(other.name)
  }).as(k.name)

  private def sparkJAgg(a: JAgg): Column = a match {
    case JCount => count(lit(1)).as("n")
    case JSumQty =>
      sum(expr("cast(round(l_quantity * 1e6, 0) as bigint)"))
        .as("sum_qty_micro")
    case JRevenue =>
      sum(expr(
        "cast(round(l_extendedprice * (1.0 - l_discount) * 1e6, 0) as bigint)"))
        .as("revenue_micro")
    case JMaxPrice =>
      max(expr("cast(round(o_totalprice * 1e6, 0) as bigint)"))
        .as("max_price_micro")
    case JNCust => countDistinct(col("o_custkey")).as("n_cust")
  }

  private def sparkJoinQuery(sh: JoinShape)(s: SparkSession,
                                            d: String): DataFrame = {
    var f = graft.ops.Tables.lineitem(s, d)
      .join(graft.ops.Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
    if (sh.needsCust)
      f = f.join(broadcast(graft.ops.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    sh.preds.foreach(p => f = f.filter(sparkJPred(p)))
    f.groupBy(sh.keys.map(sparkJKey): _*)
      .agg(sparkJAgg(sh.aggs.head), sh.aggs.tail.map(sparkJAgg): _*)
      .orderBy(sh.keys.map(k => col(k.name)): _*)
  }

  // ---- DuckDB rendering -----------------------------------------------

  private def sqlPred(p: Pred): String = p match {
    case ValueGt(c)    => s"value > $c"
    case ValueLe(c)    => s"value <= $c"
    case TypeIn(ts)    => ts.mkString("event_type IN ('", "', '", "')")
    case UserMod(m, r) => s"user_id % $m = $r"
    case DowEq(d) =>
      s"(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7 = $d"
  }

  private def sqlKeyExpr(k: Key): String = k match {
    case KType          => "event_type"
    case KDay           => "CAST(ts AS DATE)"
    case KDow           =>
      "CAST((datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7" +
        " AS BIGINT)"
    case KUserBucket(m) => s"user_id % $m"
    case KValBucket(w)  => s"CAST(ROUND(value * 1e6, 0) AS BIGINT) // $w"
  }

  private def sqlAgg(a: Agg): String = a match {
    case CountAll => "COUNT(*) AS n"
    case SumMicro =>
      "CAST(SUM(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS BIGINT)" +
        " AS sum_micro"
    case MinMicro => "MIN(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS min_micro"
    case MaxMicro => "MAX(CAST(ROUND(value * 1e6, 0) AS BIGINT)) AS max_micro"
    case NUsers   => "COUNT(DISTINCT user_id) AS n_users"
  }

  private def sqlAggQuery(sh: AggShape): String = {
    val where =
      if (sh.preds.isEmpty) ""
      else sh.preds.map(sqlPred).mkString("\nWHERE ", "\n  AND ", "")
    val keys = sh.keys.map(k => s"${sqlKeyExpr(k)} AS ${k.name}")
    val groupRefs = (1 to sh.keys.length).mkString(", ")
    val having = sh.havingMinN.map(h => s"\nHAVING COUNT(*) >= $h").getOrElse("")
    s"""SELECT ${(keys ++ sh.aggs.map(sqlAgg)).mkString(",\n  ")}
       |FROM events$where
       |GROUP BY $groupRefs$having
       |ORDER BY $groupRefs""".stripMargin
  }

  private def sqlWinQuery(sh: WinShape): String = {
    val where =
      if (sh.preds.isEmpty) ""
      else sh.preds.map(sqlPred).mkString("\nWHERE ", "\n  AND ", "")
    s"""WITH cnt AS (
       |  SELECT ${sqlKeyExpr(sh.outer)} AS ${sh.outer.name},
       |    ${sqlKeyExpr(sh.inner)} AS ${sh.inner.name},
       |    COUNT(*) AS n
       |  FROM events$where
       |  GROUP BY 1, 2)
       |SELECT ${sh.outer.name}, ${sh.inner.name}, n, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY ${sh.outer.name}
       |    ORDER BY n DESC, ${sh.inner.name} ASC) AS rk
       |  FROM cnt)
       |WHERE rk <= ${sh.k}
       |ORDER BY ${sh.outer.name}, rk""".stripMargin
  }

  private def sqlJPred(p: JPred): String = p match {
    case QtyGt(c)     => s"l_quantity > $c"
    case DiscLe(c)    => s"l_discount <= $c"
    case FlagIn(vs)   => vs.mkString("l_returnflag IN ('", "', '", "')")
    case StatusIn(vs) => vs.mkString("o_orderstatus IN ('", "', '", "')")
    case SegIn(vs)    => vs.mkString("c_mktsegment IN ('", "', '", "')")
  }

  private def sqlJKeyExpr(k: JKey): String = k match {
    case JkMonth => "CAST(month(o_orderdate) AS INTEGER)"
    case other   => other.name
  }

  private def sqlJAgg(a: JAgg): String = a match {
    case JCount => "COUNT(*) AS n"
    case JSumQty =>
      "CAST(SUM(CAST(ROUND(l_quantity * 1e6, 0) AS BIGINT)) AS BIGINT)" +
        " AS sum_qty_micro"
    case JRevenue =>
      "CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 1e6, 0)" +
        " AS BIGINT)) AS BIGINT) AS revenue_micro"
    case JMaxPrice =>
      "MAX(CAST(ROUND(o_totalprice * 1e6, 0) AS BIGINT)) AS max_price_micro"
    case JNCust => "COUNT(DISTINCT o_custkey) AS n_cust"
  }

  private def sqlJoinQuery(sh: JoinShape): String = {
    val cust =
      if (sh.needsCust) "\n  JOIN customer ON o_custkey = c_custkey" else ""
    val where =
      if (sh.preds.isEmpty) ""
      else sh.preds.map(sqlJPred).mkString("\nWHERE ", "\n  AND ", "")
    val keys = sh.keys.map(k => s"${sqlJKeyExpr(k)} AS ${k.name}")
    val groupRefs = (1 to sh.keys.length).mkString(", ")
    s"""SELECT ${(keys ++ sh.aggs.map(sqlJAgg)).mkString(",\n  ")}
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey$cust$where
       |GROUP BY $groupRefs
       |ORDER BY $groupRefs""".stripMargin
  }

  // ---- registration ---------------------------------------------------

  private def nm(prefix: String, i: Int): String = f"${prefix}_$i%03d"

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    aggShapes.zipWithIndex.map { case (sh, i) =>
      nm("fuzz_agg", i) -> ((s: SparkSession, d: String) =>
        sparkAggQuery(sh)(s, d))
    }.toMap ++
      winShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_win", i) -> ((s: SparkSession, d: String) =>
          sparkWinQuery(sh)(s, d))
      }.toMap ++
      joinShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_join", i) -> ((s: SparkSession, d: String) =>
          sparkJoinQuery(sh)(s, d))
      }.toMap

  lazy val oracleSql: Map[String, String] =
    aggShapes.zipWithIndex.map { case (sh, i) =>
      nm("fuzz_agg", i) -> sqlAggQuery(sh)
    }.toMap ++
      winShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_win", i) -> sqlWinQuery(sh)
      }.toMap ++
      joinShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_join", i) -> sqlJoinQuery(sh)
      }.toMap

  /** Human-readable shape descriptions, for failure minimization. */
  lazy val describe: Map[String, String] =
    aggShapes.zipWithIndex.map { case (sh, i) =>
      nm("fuzz_agg", i) -> sh.toString
    }.toMap ++
      winShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_win", i) -> sh.toString
      }.toMap ++
      joinShapes.zipWithIndex.map { case (sh, i) =>
        nm("fuzz_join", i) -> sh.toString
      }.toMap
}
