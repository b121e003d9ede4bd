package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Diagnostic main for the streaming fixed costs (VERDICT r8 item #2:
  * `stream_stream_join` regressed 5.95 → 8.1 s between r7 and r8 with
  * no code change to the join itself). Runs the exact
  * `stream_stream_join` body and prints per-micro-batch progress
  * (batch count, input rows, duration breakdown, state-store ops) plus
  * wall-clock for each phase — the measurement that separates
  * "micro-batch fixed cost" from "data-scaling term" and attributes
  * the regression. */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }

    val statePartitions = sys.env.get("SPARK_GRAFT_STATE_PARTITIONS")
    (1 to 3).foreach { run =>
      statePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
      val t0 = System.nanoTime()
      def src = graft.streaming.StreamingJobs.tableStream(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
      val tSrc = System.nanoTime()
      val clicks = src.where(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val purchases = src.where(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"), col("value"))
      val joined = clicks.join(purchases,
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 30 minutes"))
      val name = s"diag_ssj_$run"
      val tPlan = System.nanoTime()
      val q = graft.streaming.StreamingJobs.runAvailableNow(
        joined, name, OutputMode.Append())
      val tStream = System.nanoTime()
      val nOut = spark.table(name).count()
      val tAgg = System.nanoTime()
      println(f"=== run $run: total ${(tAgg - t0) / 1e9}%.2f  " +
        f"(src-def ${(tSrc - t0) / 1e9}%.2f, plan ${(tPlan - tSrc) / 1e9}%.2f, " +
        f"stream ${(tStream - tPlan) / 1e9}%.2f, count ${(tAgg - tStream) / 1e9}%.2f) " +
        s"rows=$nOut")
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        val state = p.stateOperators.map(so =>
          s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} memUsed=${so.memoryUsedBytes}").mkString("; ")
        println(s"  batch ${p.batchId}: in=${p.numInputRows} " +
          s"durations=$dur state[$state]")
      }
    }
    spark.stop()
  }
}
