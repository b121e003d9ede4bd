package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM smoke for the `spark.sql.extensions` wiring (NOTES item 6):
  * builds a session configured ONLY via the extensions class name — no
  * session-local `register(...)` calls — and uses the injected native
  * functions straight from SQL. Run by ExtensionsWiringSpec in a forked
  * JVM so the extension path is exercised on a brand-new SparkContext,
  * exactly as `spark-submit --conf spark.sql.extensions=...` would.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("extensions-smoke")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val row = spark.sql(
        """SELECT
          |  ROUND(cosine_sim(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
          |                   CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)), 6) AS cos,
          |  size(shingle3(array('a', 'b', 'c', 'd'))) AS n_shingles""".stripMargin).head()
      println(s"[extensions-smoke] cos=${row.getDouble(0)} shingles=${row.getInt(1)}")

      // planner-strategy injection: build the AsOfJoin logical node through
      // the shim DIRECTLY (bypassing AsOf.join's lazy extraStrategies
      // registration) — it only plans if GraftExtensions injected the
      // strategy into this fresh session
      val ev = spark.sql(
        """SELECT id AS event_id,
          |  timestamp'2024-01-01 10:00:00' + make_interval(0,0,0,0,0,CAST(id AS INT),0) AS ts,
          |  'a' AS k FROM range(3)""".stripMargin)
      val rates = spark.sql(
        "SELECT 'a' AS k, timestamp'2024-01-01 10:01:00' AS valid_from, CAST(7.5 AS DOUBLE) AS rate")
      def attr(df: org.apache.spark.sql.DataFrame, n: String) =
        df.queryExecution.analyzed.output.find(_.name == n).get
      val plan = graft.plans.AsOfJoin(
        ev.queryExecution.analyzed, rates.queryExecution.analyzed,
        attr(ev, "k"), attr(rates, "k"), attr(ev, "ts"), attr(rates, "valid_from"))
      val matched = org.apache.spark.sql.classic.GraftSqlShim.ofRows(spark, plan)
        .where("rate IS NOT NULL").count()
      println(s"[extensions-smoke] asof_matched=$matched")
    } finally spark.stop()
  }
}
