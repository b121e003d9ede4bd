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
    } finally spark.stop()
  }
}
