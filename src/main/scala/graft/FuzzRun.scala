package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Differential SQL fuzzer: generate seeded random queries in an
  * ENGINE-PORTABLE subset of ANSI SQL — the exact same string runs on this
  * engine and on the DuckDB oracle — execute them here, and dump results +
  * the SQL for `tools/check.py`'s value-level compare. The hand-written
  * 199-query gate checks the operators we thought to write; this checks
  * the compositions we didn't.
  *
  * The grammar stays inside the established cross-engine parity envelope
  * (the repo's oracle gotchas, learned rounds 2-9):
  *  - integer arithmetic only (every INTEGER column cast to BIGINT; no
  *    division; multipliers and value ranges bounded so int64 never wraps
  *    under ANSI);
  *  - aggregates cast to BIGINT (DuckDB sum(int) is HUGEINT);
  *  - no floats, decimals, dates, or collation-sensitive string ops —
  *    strings appear only as group keys and IS NOT NULL probes;
  *  - every query ends in a total ORDER BY over all output columns, so
  *    LIMIT cuts the same multiset on both engines.
  *
  * Usage: `runMain graft.FuzzRun <sfDir> <outDir> [count] [seed]`, then
  * `python3 tools/check.py <sfDir> <outDir>`. Deterministic per seed. */
object FuzzRun {

  private final case class Table(name: String, longs: Seq[String],
                                 ints: Seq[String], strings: Seq[String])

  private val tables = Seq(
    Table("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"),
      Seq("l_linenumber"), Seq("l_returnflag", "l_linestatus")),
    Table("orders", Seq("o_orderkey", "o_custkey"), Nil,
      Seq("o_orderstatus", "o_orderpriority")),
    Table("customer", Seq("c_custkey"), Seq("c_nationkey"), Seq("c_mktsegment")),
    Table("nation", Nil, Seq("n_nationkey", "n_regionkey"), Seq("n_name")),
    Table("documents", Seq("doc_id", "n_chars"), Nil, Seq("lang", "source")))

  /** FK equi-joins the synthetic tables actually satisfy. */
  private val joins = Seq(
    ("lineitem", "orders", "l_orderkey = o_orderkey"),
    ("orders", "customer", "o_custkey = c_custkey"),
    ("customer", "nation", "c_nationkey = n_nationkey"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val count = if (args.length > 2) args(2).toInt else 200
    val seed = if (args.length > 3) args(3).toLong else 10L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tables.foreach(t => spark.read.parquet(s"$sfDir/${t.name}.parquet")
      .createOrReplaceTempView(t.name))
    new java.io.File(outDir).mkdirs()

    val rnd = new java.util.Random(seed)
    val sqls = (0 until count).map(i => f"fuzz_$i%04d" -> gen(rnd))
    var failed = 0
    sqls.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[fuzz] $name failed: ${e.getMessage}\n$sql")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[fuzz] generated $count, executed ${count - failed}, failed $failed")
    spark.stop()
  }

  /** One random portable query. */
  private def gen(r: java.util.Random): String = {
    def pick[A](xs: Seq[A]): A = xs(r.nextInt(xs.size))
    val base = pick(tables)
    // optionally follow one FK edge from the base table — and sometimes a
    // second hop from the joined table (lineitem -> orders -> customer)
    val join = joins.filter(j => j._1 == base.name && r.nextInt(3) == 0)
      .headOption.map { case (_, rt, cond) =>
        val hop2 = joins.filter(j => j._1 == rt && r.nextInt(2) == 0)
          .headOption.map { case (_, rt2, cond2) =>
            (tables.find(_.name == rt2).get, s" JOIN $rt2 ON $cond2")
          }
        val t1 = tables.find(_.name == rt).get
        (Seq(Some(t1), hop2.map(_._1)).flatten,
          s" JOIN $rt ON $cond${hop2.map(_._2).getOrElse("")}")
      }
    val inScope = base +: join.map(_._1).getOrElse(Nil)
    def longCols = inScope.flatMap(_.longs)
    def intCols = inScope.flatMap(_.ints)
    def strCols = inScope.flatMap(_.strings)
    // integer-valued expression over in-scope columns, bounded magnitude
    def intExpr(depth: Int): String = {
      val leafs = longCols.map(c => s"$c") ++
        intCols.map(c => s"CAST($c AS BIGINT)") :+ (r.nextInt(90) + 1).toString
      if (depth == 0 || r.nextInt(3) == 0) pick(leafs)
      else r.nextInt(4) match {
        case 0 => s"(${intExpr(depth - 1)} + ${intExpr(depth - 1)})"
        case 1 => s"(${intExpr(depth - 1)} * ${r.nextInt(7) + 1})"
        case 2 => s"(${intExpr(depth - 1)} % ${r.nextInt(97) + 3})"
        case _ =>
          val t = intExpr(depth - 1)
          s"(CASE WHEN ${pred()} THEN $t ELSE ${intExpr(depth - 1)} END)"
      }
    }
    def pred(): String = {
      val c = if (longCols.nonEmpty && (intCols.isEmpty || r.nextBoolean()))
        pick(longCols) else s"CAST(${pick(intCols ++ longCols)} AS BIGINT)"
      r.nextInt(5) match {
        case 0 => s"$c % ${r.nextInt(11) + 2} <= ${r.nextInt(5)}"
        case 1 => s"$c % ${r.nextInt(11) + 2} = ${r.nextInt(3)}"
        case 2 => s"$c % 100 BETWEEN ${r.nextInt(30)} AND ${30 + r.nextInt(60)}"
        case 3 => // uncorrelated scalar subquery as the bound
          s"$c % 100 <= (SELECT CAST(count(*) AS BIGINT) FROM " +
            s"${pick(tables).name}) % ${r.nextInt(50) + 3}"
        case _ if strCols.nonEmpty => s"${pick(strCols)} IS NOT NULL"
        case _ => s"$c % 5 <> ${r.nextInt(5)}"
      }
    }
    val groupKeys: Seq[String] = (0 until r.nextInt(3)).map { _ =>
      if (strCols.nonEmpty && r.nextBoolean()) pick(strCols)
      else s"(${pick(longCols ++ intCols.map(c => s"CAST($c AS BIGINT)"))} % ${r.nextInt(9) + 2})"
    }.distinct
    val aggs: Seq[String] = (0 to r.nextInt(2)).map { _ =>
      r.nextInt(5) match {
        case 0 => "CAST(count(*) AS BIGINT)"
        case 1 => s"CAST(sum(${intExpr(1)}) AS BIGINT)"
        case 2 => s"CAST(min(${intExpr(1)}) AS BIGINT)"
        case 3 => s"CAST(max(${intExpr(1)}) AS BIGINT)"
        case _ => s"CAST(count(DISTINCT ${pick(longCols ++ strCols)}) AS BIGINT)"
      }
    }.distinct
    val outs = (groupKeys ++ aggs).zipWithIndex
      .map { case (e, i) => s"$e AS c$i" }
    val where = (0 until r.nextInt(3)).map(_ => pred()) match {
      case Nil => ""
      case ps => " WHERE " + ps.mkString(if (r.nextBoolean()) " AND " else " OR ")
    }
    val groupBy = if (groupKeys.nonEmpty)
      " GROUP BY " + groupKeys.indices.map(i => (i + 1).toString).mkString(", ")
    else ""
    val having = if (groupKeys.nonEmpty && r.nextInt(3) == 0)
      s" HAVING CAST(count(*) AS BIGINT) > ${r.nextInt(4)}" else ""
    val orderBy = " ORDER BY " + outs.indices.map(i => s"c$i").mkString(", ")
    val limit = if (r.nextInt(3) == 0) s" LIMIT ${r.nextInt(500) + 1}" else ""
    val from = s"${base.name}${join.map(_._2).getOrElse("")}"
    r.nextInt(8) match {
      case 0 if groupKeys.nonEmpty =>
        // DISTINCT projection (no aggregates)
        val cols = groupKeys.zipWithIndex.map { case (e, i) => s"$e AS c$i" }
        val ob = " ORDER BY " + cols.indices.map(i => s"c$i").mkString(", ")
        s"SELECT DISTINCT ${cols.mkString(", ")} FROM $from$where$ob$limit"
      case 1 if groupKeys.nonEmpty =>
        // UNION ALL of two predicate slices, rolled up outside
        val cols = groupKeys.zipWithIndex.map { case (e, i) => s"$e AS c$i" }
        val names = cols.indices.map(i => s"c$i")
        s"SELECT ${names.mkString(", ")}, CAST(count(*) AS BIGINT) AS n FROM (" +
          s"SELECT ${cols.mkString(", ")} FROM $from WHERE ${pred()} " +
          s"UNION ALL SELECT ${cols.mkString(", ")} FROM $from WHERE ${pred()}) u " +
          s"GROUP BY ${names.indices.map(i => (i + 1).toString).mkString(", ")}" +
          s" ORDER BY ${names.mkString(", ")}, n$limit"
      case _ =>
        s"SELECT ${outs.mkString(", ")} FROM $from$where$groupBy$having$orderBy$limit"
    }
  }
}
