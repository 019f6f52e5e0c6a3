package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main for q_bootstrap_ci (dev tool, the ProfileDsir
  * playbook): attributes the query's wall time across its stages and A/Bs
  * the ×b-explode form against the column-wise (2b agg columns, no row
  * blow-up) form on identical inputs.
  */
object ProfileBootstrap {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val events = Tables(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
      .events

    def time(name: String)(f: => Long): Unit = {
      val runs = Seq.fill(5) {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[profile] $name%-28s min ${runs.map(_._1).min}%.3f s  " +
        f"(runs ${runs.map(r => f"${r._1}%.3f").mkString(", ")})  n=${runs.head._2}")
    }

    val base = graft.operators.ScaleOps.fanOut(events.where(col("value").isNotNull)
      .select(col("event_type").as("k"),
        round(col("value") * 100).cast("long").as("cv"),
        col("event_id").cast("string").as("rid")))
    time("base scan+fanOut")(base.count())
    val rep = base.select(col("k"), col("cv"), col("rid"),
      explode(sequence(lit(0), lit(63))).as("rep"))
    time("x64 explode only")(rep.count())
    val u = conv(substring(md5(concat(col("rid"), lit(":"), col("rep"))), 1, 8), 16, 10)
      .cast("long")
    time("explode+md5")(rep.select(col("k"), col("cv"), u.as("u")).agg(sum("u")).count())
    // noop write, NOT count(): count() lets ColumnPruning drop the unused
    // aggregate columns (the columnar form's entire cost) and measures a
    // hollowed-out plan — the r14 first cut of this tool did exactly that
    // and picked the wrong winner
    def evalAll(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val u32 = call_function("md5_u32", concat(col("rid"), lit(":"), col("rep")))
    time("u32 single (noop)")(evalAll(rep.select(col("k"), col("cv"), u32.as("u"))))
    val wCascade = graft.operators.StatsOps.PoissonThresholds.zipWithIndex
      .foldRight(lit(9): org.apache.spark.sql.Column) {
        case ((t, kk), rest) => when(u32 < t, lit(kk)).otherwise(rest)
      }.cast("long")
    time("w 9-branch cascade (noop)")(evalAll(rep.select(col("k"), col("cv"), wCascade.as("w"))))
    time("full explode form") {
      evalAll(graft.operators.StatsOps.bootstrapCi(
        events, col("event_type"), col("value"), col("event_id"), b = 64))
    }
    time("full columnar form") {
      evalAll(graft.operators.StatsOps.bootstrapCiColumnar(
        events, col("event_type"), col("value"), col("event_id"), b = 64))
    }
    spark.stop()
  }
}
