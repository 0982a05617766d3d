package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line of per-query seconds.
  *
  * Each query is forced with a noop datasource write — unlike `count()`,
  * which lets Catalyst drop sorts/projections, noop executes the full
  * physical plan including output row production (what a real sink pays).
  *
  * Failures are NOT swallowed: a query that throws is reported in an
  * `errors` map (and excluded from the timing map) so a bench-only
  * regression (e.g. an OOM that only appears at bench scale) is visible
  * instead of masquerading as a fast run. Row counts come from an
  * `Observation` attached to the second (timed-min) run — the observe
  * node is a metrics tap, not a plan change.
  */
object Bench {
  private def jesc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // two runs per query, min reported: the first run absorbs plan
    // compilation and any transient host stall; min-of-2 is the steady
    // state a warmed cluster would show.
    val timings = collection.mutable.LinkedHashMap[String, Double]()
    val rowCounts = collection.mutable.LinkedHashMap[String, Long]()
    val errors = collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val times = (1 to 2).flatMap { i =>
        val obs = if (i == 2) Some(new Observation(s"rows_$name")) else None
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          val tapped = obs.map(o => df.observe(o, count(lit(1)).as("rows"))).getOrElse(df)
          tapped.write.format("noop").mode("overwrite").save()
          obs.foreach(o => rowCounts(name) = o.get("rows").asInstanceOf[Long])
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
          errors(name) = msg
          System.err.println(s"[bench] $name FAILED run $i: $msg")
          None
        }
      }
      if (times.nonEmpty && !errors.contains(name)) timings(name) = times.min
    }
    // The driver captures only the TAIL of stdout (observed cap: 2000 chars),
    // so the metric line must stay well under that or its head is truncated
    // and the JSON never parses (this bit rounds 1 and 2). Keep the line
    // minimal: 3-decimal timings, error CLASS names only. Row counts and full
    // error text go to stderr, which the driver does not parse.
    // 1-decimal, trailing zeros stripped ("1.50"→"1.5", "2.00"→"2") —
    // every byte counts against the driver's ~2000-char tail capture
    // (84 queries × ~21 chars each must fit with headroom)
    def f3(v: Double): String = {
      val s = f"$v%.1f"
      if (s.endsWith(".0")) s.dropRight(2) else s
    }
    // cap the stdout map at the slowest 60 queries (the ones that carry
    // performance signal) and roll the rest into omitted counters; the
    // full map always goes to stderr. BENCH_r02 proved the failure mode:
    // a 2300-char line truncates at the driver's 2000-char tail capture
    // and the whole round's bench parses to null.
    val shown = timings.toSeq.sortBy(-_._2).take(60)
    val omitted = timings.size - shown.size
    val omittedSec = timings.values.sum - shown.map(_._2).sum
    val qs = shown.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    System.err.println("[bench] all_timings=" + timings.map {
      case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}"))
    val es = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jesc(v.takeWhile(_ != ':').take(40)) + "\""
    }.mkString("{", ",", "}")
    val rs = rowCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    System.err.println(s"""[bench] rows=$rs""")
    val total = timings.values.sum
    val errField = if (errors.isEmpty) "" else s""","errors":$es"""
    val omitField = if (omitted == 0) ""
      else s""","omitted":$omitted,"omitted_sec":${f3(omittedSec)}"""
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs$errField$omitField,"sf":"${sfDir.split('/').last}"}"""
    if (line.length > 1800) System.err.println(
      s"[bench] WARN metric line ${line.length} chars — may exceed driver tail capture")
    println(line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
